"""Sweep search: exact match-set parity with brute force / the oracle."""

import numpy as np
import pytest

from sigmap_tpu.config import SigmapConfig
from sigmap_tpu.index.build import build_index
from sigmap_tpu.index.sweep import SweepIndex
from sigmap_tpu.io.fasta import ReferenceSequence
from sigmap_tpu.io.pore_model import make_synthetic_pore_model
from sigmap_tpu.mapping.sweep_search import SEED_PAD, brute_matches, sweep_round
from sigmap_tpu.synth import random_genome


@pytest.fixture(scope="module")
def small_index():
    cfg = SigmapConfig()
    pore = make_synthetic_pore_model(k=6, seed=0)
    genome = random_genome(20000, seed=3)
    seqs = [ReferenceSequence(n, c) for n, c in genome]
    idx = build_index(seqs, pore, cfg.index, cfg.mapping.search_radius,
                      verbose=False)
    return cfg, idx


def test_sweep_matches_brute(small_index):
    import jax.numpy as jnp

    cfg, idx = small_index
    radius = cfg.mapping.search_radius
    sw = SweepIndex.build(idx, radius, tile=256)
    # windows in sweep order (row idx.dim holds |w|^2 -> slice to dim)
    W = np.ascontiguousarray(
        sw.tiles.transpose(0, 2, 1).reshape(-1, 8)
    )[: sw.n_windows, : idx.dim]
    rng = np.random.default_rng(0)
    # queries: noisy copies of real windows (some matches guaranteed),
    # plus pure noise, plus padding
    Q = 64
    picks = rng.integers(0, sw.n_windows, Q // 2)
    qs = np.zeros((Q, 8), np.float32)
    qs[: Q // 2, : idx.dim] = W[picks] + rng.normal(
        0, 0.08, (Q // 2, idx.dim)).astype(np.float32)
    qs[Q // 2 : -8, : idx.dim] = rng.normal(
        0, 1, (Q // 2 - 8, idx.dim)).astype(np.float32)
    qs[-8:, : idx.dim] = SEED_PAD

    K = 32
    m_meta, m_d2, cnt, wrote = sweep_round(
        jnp.asarray(qs), jnp.asarray(sw.cum), jnp.asarray(sw.tiles),
        jnp.asarray(sw.meta), radius=radius, K=K, TILE=sw.tile,
        interpret=True,
    )
    m_meta = np.asarray(m_meta)
    m_d2 = np.asarray(m_d2)
    cnt = np.asarray(cnt)
    wrote = np.asarray(wrote)

    truth = brute_matches(qs[:-8, : idx.dim], W, radius)
    meta_all = sw.meta.reshape(-1)[: sw.n_windows]
    for i, tset in enumerate(truth):
        assert cnt[i] == len(tset), f"seed {i}: cnt {cnt[i]} != {len(tset)}"
        want_meta = {int(meta_all[j]) for j in tset}
        got = {int(m) for m in m_meta[i, : wrote[i]]}
        if len(tset) <= K:
            assert wrote[i] == len(tset)
            assert got == want_meta
        else:
            assert got <= want_meta
        # distances exact up to the |q|^2+|w|^2-2q.w expansion rounding
        for s in range(wrote[i]):
            j = [jj for jj in tset if int(meta_all[jj]) == int(m_meta[i, s])]
            d2 = ((W[j] - qs[i][None, : idx.dim]) ** 2).sum(axis=1)
            assert np.any(np.abs(d2 - m_d2[i, s]) < 5e-4)
    # padded seeds: no matches
    assert (cnt[-8:] == 0).all()
    assert (wrote[-8:] == 0).all()


def test_sweep_dense_cluster_truncation(small_index):
    """Seeds whose matches exceed K: exact totals, wrote == min(total, K)."""
    import jax.numpy as jnp

    cfg, idx = small_index
    radius = cfg.mapping.search_radius
    sw = SweepIndex.build(idx, radius, tile=256)
    W = np.ascontiguousarray(
        sw.tiles.transpose(0, 2, 1).reshape(-1, 8)
    )[: sw.n_windows, : idx.dim]
    # a zero query in z-scored space sits near many windows at radius 1.5
    big_r = 1.5
    qs = np.zeros((32, 8), np.float32)
    m_meta, m_d2, cnt, wrote = sweep_round(
        jnp.asarray(qs), jnp.asarray(sw.cum), jnp.asarray(sw.tiles),
        jnp.asarray(sw.meta), radius=radius, K=8, TILE=sw.tile,
        interpret=True,
    )
    truth = brute_matches(qs[:1, : idx.dim], W, radius)
    assert int(np.asarray(cnt)[0]) == len(truth[0])
    assert (np.asarray(wrote) <= 8).all()

"""Pallas kernels in interpreter mode vs reference implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from sigmap_tpu import native
from sigmap_tpu.config import EventDetectorConfig, IndexConfig
from sigmap_tpu.index.build import build_index
from sigmap_tpu.io.fasta import ReferenceSequence
from sigmap_tpu.mapping.seeding import (
    DeviceIndex, flatten_matches, pad_seeds, search_flat_kernel,
)
from sigmap_tpu.signal.events import batch_tstat, detect_peaks_batch
from sigmap_tpu.signal.events_pallas import detect_peaks_pallas
from sigmap_tpu.synth import random_genome


def test_peaks_pallas_matches_scan(rng):
    B, C = 6, 1200
    sigs = rng.normal(80, 8, (B, C)).astype(np.float32)
    for b in range(B):
        for s in range(0, C, 9):
            sigs[b, s : s + 9] += rng.normal(0, 6)
    lengths = np.array([C, C - 100, 500, C, 50, 7], np.int32)
    cfg = EventDetectorConfig()
    t1 = batch_tstat(sigs, lengths, cfg.window_length1)
    t2 = batch_tstat(sigs, lengths, cfg.window_length2)
    ref = np.asarray(detect_peaks_batch(t1, t2, jnp.asarray(lengths), cfg))
    pal = np.asarray(
        detect_peaks_pallas(t1, t2, jnp.asarray(lengths), cfg, interpret=True)
    )
    np.testing.assert_array_equal(ref, pal)


def test_range_search_kernel_matches_kdtree(pore6):
    genome = random_genome(60_000, seed=7)
    seqs = [ReferenceSequence(n, c) for n, c in genome]
    idx = build_index(seqs, pore6, IndexConfig(), verbose=False)
    dev = DeviceIndex.from_host(
        idx, radius=0.08, seeds_per_tile=16, cap_per_seed=8192,
        surv_per_tile=16384, matches_per_tile=8192,
    )
    rng = np.random.default_rng(3)
    W = np.lib.stride_tricks.sliding_window_view(idx.values, idx.dim)
    qi = rng.integers(0, idx.n_windows, 24)
    noisy = (W[qi] + rng.normal(0, 0.1, (24, idx.dim))).astype(np.float32)
    q8 = np.zeros((24, 8), np.float32)
    q8[:, :6] = noisy
    seeds, valid, _ = pad_seeds(q8, dev.params)
    out = search_flat_kernel(
        dev, jnp.asarray(seeds), jnp.asarray(valid), interpret=True
    )
    sids, widx, dist, _, ovf = flatten_matches(out, dev.params)
    assert not ovf.any()
    tree = native.KdTree(idx.values, idx.dim, 20)
    for qid in range(24):
        oi, od = tree.radius(noisy[qid], 0.08)
        got = widx[sids == qid]
        assert set(got.tolist()) == set(oi.tolist()), f"query {qid}"
        ref = dict(zip(oi.tolist(), od.tolist()))
        for w_, d_ in zip(got.tolist(), dist[sids == qid].tolist()):
            assert abs(ref[w_] - d_) < 1e-5


def test_chain_kernel_matches_scan(rng):
    import jax.numpy as jnp

    from sigmap_tpu.mapping.chain_device import chain_scores_banded
    from sigmap_tpu.ops.chain_kernel import chain_scores_banded_pallas

    B, A = 3, 400
    t = np.sort(rng.integers(0, 5000, (B, A)).astype(np.int32), axis=1)
    q = rng.integers(0, 800, (B, A)).astype(np.int32)
    d = (rng.random((B, A)) * 0.08).astype(np.float32)
    g = rng.integers(0, 2, (B, A)).astype(np.int32)
    for b in range(B):
        o = np.lexsort((q[b], t[b], g[b]))
        t[b], q[b], d[b], g[b] = t[b][o], q[b][o], d[b][o], g[b][o]
    v = rng.random((B, A)) < 0.9
    s_ref, p_ref = chain_scores_banded(t, q, d, g, v, 0.08)
    s_pal, p_pal = chain_scores_banded_pallas(
        t, q, d, jnp.asarray(g), jnp.asarray(v), 0.08, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(s_ref), np.asarray(s_pal), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(p_ref), np.asarray(p_pal))


def test_sdtw_kernel_matches_reference(rng):
    from sigmap_tpu.ops.sdtw import sdtw_np
    from sigmap_tpu.ops.sdtw_kernel import sdtw_pallas

    B, T, Q = 4, 256, 64
    ts = np.zeros((B, T), np.float32)
    qs = np.zeros((B, Q), np.float32)
    tl = np.zeros(B, np.int32)
    ql = np.zeros(B, np.int32)
    exp = []
    for b in range(B):
        nt = int(rng.integers(100, T))
        nq = int(rng.integers(30, Q))
        t = rng.normal(0, 1, nt).astype(np.float32)
        lo = int(rng.integers(0, nt - nq))
        q = (t[lo : lo + nq] + rng.normal(0, 0.05, nq)).astype(np.float32)
        ts[b, :nt] = t
        qs[b, :nq] = q
        tl[b], ql[b] = nt, nq
        exp.append(sdtw_np(t, q))
    best, end = sdtw_pallas(ts, tl, qs, ql, interpret=True)
    for b in range(B):
        assert abs(float(best[b]) - exp[b][0]) < 1e-3 * max(1, exp[b][0])
        assert int(end[b]) == exp[b][1]

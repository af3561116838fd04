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

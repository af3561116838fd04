"""Pallas kernels in interpreter mode vs reference implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from sigmap_tpu.config import EventDetectorConfig
from sigmap_tpu.signal.events import batch_tstat, detect_peaks_batch
from sigmap_tpu.signal.events_pallas import detect_peaks_pallas


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


def test_sdtw_pallas_uniform_fast_path():
    """Uniform t_len/q_len dispatches the steady-phase kernel; results
    must equal the general path / numpy twin exactly."""
    import numpy as np

    from sigmap_tpu.ops.sdtw import sdtw_batch
    from sigmap_tpu.ops.sdtw_kernel import sdtw_pallas

    rng = np.random.default_rng(3)
    B, T, Q = 5, 120, 48
    ts = rng.normal(0, 1, (B, T)).astype(np.float32)
    qs = rng.normal(0, 1, (B, Q)).astype(np.float32)
    tl = np.full(B, T, np.int32)
    ql = np.full(B, Q, np.int32)
    b1, e1 = (np.asarray(x) for x in sdtw_pallas(ts, tl, qs, ql,
                                                 interpret=True))
    b2, e2 = (np.asarray(x) for x in sdtw_batch(ts, tl, qs, ql))
    np.testing.assert_allclose(b1, b2, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(e1, e2)

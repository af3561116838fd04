"""sDTW and fastDTW capability tests."""

import numpy as np
import jax.numpy as jnp

from sigmap_tpu.ops.sdtw import sdtw_batch, sdtw_np, sdtw_scan
from sigmap_tpu.ops.fastdtw import (
    dtw_windowed, expand_window, fastdtw, print_alignment, reduce_by_half,
)


def test_sdtw_matches_reference():
    rng = np.random.default_rng(0)
    t = rng.normal(0, 1, 500).astype(np.float32)
    q = (t[100:200] + rng.normal(0, 0.05, 100)).astype(np.float32)
    b_ref, e_ref = sdtw_np(t, q)
    b, e = sdtw_scan(jnp.asarray(t), jnp.int32(500), jnp.asarray(q),
                     jnp.int32(100))
    assert abs(float(b) - b_ref) < 1e-2 * max(1.0, b_ref)
    assert int(e) == e_ref


def test_sdtw_batch_and_padding():
    rng = np.random.default_rng(1)
    T, Q, B = 256, 64, 4
    ts = np.zeros((B, T), np.float32)
    qs = np.zeros((B, Q), np.float32)
    tl = np.zeros(B, np.int32)
    ql = np.zeros(B, np.int32)
    expected = []
    for b in range(B):
        n_t = int(rng.integers(100, T))
        n_q = int(rng.integers(30, Q))
        t = rng.normal(0, 1, n_t).astype(np.float32)
        lo = int(rng.integers(0, n_t - n_q))
        q = (t[lo : lo + n_q] + rng.normal(0, 0.05, n_q)).astype(np.float32)
        ts[b, :n_t] = t
        qs[b, :n_q] = q
        tl[b], ql[b] = n_t, n_q
        expected.append(sdtw_np(t, q))
    bs, es = sdtw_batch(jnp.asarray(ts), jnp.asarray(tl), jnp.asarray(qs),
                        jnp.asarray(ql))
    for b in range(B):
        assert abs(float(bs[b]) - expected[b][0]) < 1e-2 * max(1, expected[b][0])
        assert int(es[b]) == expected[b][1]


def _pair(seed=0, tlen=400, sub=50, rep=3):
    rng = np.random.default_rng(seed)
    t = rng.normal(0, 1, tlen).astype(np.float32)
    q = np.repeat(t[100 : 100 + sub], rep) + rng.normal(
        0, 0.02, sub * rep
    ).astype(np.float32)
    return t, q


def test_fastdtw_one_level_close_to_full():
    t, q = _pair()
    d_full, p_full, e_full = dtw_windowed(t, q, None)
    d, p, e, cigar = fastdtw(t, q, radius=30)
    assert abs(e - e_full) <= 5
    assert d <= d_full * 2 + 2
    assert cigar.startswith("(") and cigar.endswith(")")


def test_fastdtw_small_radius_valid_path():
    t, q = _pair(seed=2)
    d, p, e, cigar = fastdtw(t, q, radius=2)
    assert len(p) > 0
    ts = [x[0] for x in p]
    qs = [x[1] for x in p]
    assert all(b - a in (0, 1) for a, b in zip(ts, ts[1:]))
    assert all(b - a in (0, 1) for a, b in zip(qs, qs[1:]))
    assert qs[0] == 0 and qs[-1] == len(q) - 1


def test_cigar_flags():
    # path: diag, multi, skip-signal, diag, skip-base
    path = [(0, 0, 0), (1, 1, 0), (1, 2, 1), (1, 3, 2), (2, 4, 0), (3, 4, 3)]
    cig = print_alignment(path)
    assert cig == "(1M)(2M1I)(1M)"

"""Scalar (numpy) reference implementation of event detection.

This is the executable specification of the reference's Scrappie-lineage
segmentation (event.h:58-267) and feature generation (sigmap.cc:1048-1083),
used as the oracle for the batched JAX/Pallas implementations.  Semantics
reproduced exactly, including:

* fp32 prefix sums / t-statistics (event.h:58-115), windows fudged with
  zeros at both ends;
* the dual-detector stateful peak scan (event.h:117-182): i=0 skipped via
  the `masked_to >= i` guard; the short detector, while in-peak above its
  threshold, masks & resets the long detector every step;
* CreateEvents (event.h:200-224): event boundaries are
  [0, p_0 .. p_{n-2}, L] — the *last* emitted peak is never used;
* z-score normalization with float64 accumulators (sigmap.cc:1131-1155),
  population mean / (n-1) variance;
* delta>0.1 run-collapse of the normalized means, keeping the stdv of the
  kept (uncompressed-index) event (sigmap.cc:1065-1079).

Degenerate inputs (0 or 1 peaks) hit undefined behavior in the C++
(out-of-bounds peak reads); here: 0 peaks -> single event [0, L), 1 peak ->
events [0,p0),[p0,L).  Both are unreachable on real data paths because the
driver requires >50 features (sigmap.cc:355,660).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import EventDetectorConfig

FLT_MAX = np.float32(3.4028235e38)
FLT_MIN = np.float32(1.1754944e-38)


def prefix_sums(signal: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """fp32 prefix sums of x and x^2 with leading zero (event.h:58-68)."""
    x = signal.astype(np.float32)
    ps = np.zeros(len(x) + 1, np.float32)
    pss = np.zeros(len(x) + 1, np.float32)
    # sequential fp32 accumulation like the C++ loop
    np.cumsum(x, dtype=np.float32, out=ps[1:])
    np.cumsum(x * x, dtype=np.float32, out=pss[1:])
    return ps, pss


def tstat(ps: np.ndarray, pss: np.ndarray, L: int, w: int) -> np.ndarray:
    """Welch t-statistic of adjacent w-windows (event.h:70-115).

    Output length L+1 (the reference emits w zeros, L-2w+1 values, w zeros).
    """
    out = np.zeros(L + 1, np.float32)
    if L < 2 * w or w < 2:
        return np.zeros(L, np.float32)  # quick-return: L zeros
    i = np.arange(w, L - w + 1)
    sum1 = ps[i].copy()
    sumsq1 = pss[i].copy()
    gt = i > w
    sum1[gt] -= ps[i[gt] - w]
    sumsq1[gt] -= pss[i[gt] - w]
    sum2 = ps[i + w] - ps[i]
    sumsq2 = pss[i + w] - pss[i]
    mean1 = (sum1 / w).astype(np.float32)
    mean2 = (sum2 / w).astype(np.float32)
    comb = (
        sumsq1 / w - mean1 * mean1 + sumsq2 / w - mean2 * mean2
    ).astype(np.float32)
    comb = np.maximum(comb, FLT_MIN)
    out[w : L - w + 1] = np.abs(mean2 - mean1) / np.sqrt(comb / w)
    return out


def tstat_centered(signal: np.ndarray, L: int, w: int) -> np.ndarray:
    """Numerically-stable t-stat twin of the device formulation
    (signal/events.py batch_tstat): local fp32 window sums, centered
    two-pass variance.  More accurate than the C++ prefix-sum version."""
    out = np.zeros(L + 1, np.float32)
    if L < 2 * w or w < 2:
        return np.zeros(L, np.float32)
    x = signal.astype(np.float32)
    for i in range(w, L - w + 1):
        a = x[i - w : i]
        b = x[i : i + w]
        m1 = np.float32(a.sum() / w)
        m2 = np.float32(b.sum() / w)
        var = np.float32(((a - m1) ** 2).sum() / w + ((b - m2) ** 2).sum() / w)
        var = max(var, FLT_MIN)
        out[i] = abs(m2 - m1) / np.sqrt(var / np.float32(w))
    return out


@dataclass
class _Det:
    threshold: float
    window_length: int
    masked_to: int = 0
    peak_pos: int = -1
    peak_value: float = FLT_MAX
    valid_peak: bool = False


def detect_peaks(
    tstat1: np.ndarray, tstat2: np.ndarray, L: int, cfg: EventDetectorConfig
) -> list[int]:
    """Dual-window stateful peak caller (event.h:117-182); returns emitted
    peak positions in emission order."""
    peaks: list[int] = []
    short = _Det(cfg.threshold1, cfg.window_length1)
    lng = _Det(cfg.threshold2, cfg.window_length2)
    dets = [(short, tstat1), (lng, tstat2)]
    ph = np.float32(cfg.peak_height)
    for i in range(L):
        for k, (d, ts) in enumerate(dets):
            if d.masked_to >= i:
                continue
            v = np.float32(ts[i])
            if d.peak_pos == -1:
                if v < d.peak_value:
                    d.peak_value = v
                elif v - d.peak_value > ph:
                    d.peak_value = v
                    d.peak_pos = i
            else:
                if v > d.peak_value:
                    d.peak_value = v
                    d.peak_pos = i
                if k == 0 and d.peak_value > d.threshold:
                    lng.masked_to = d.peak_pos + d.window_length
                    lng.peak_pos = -1
                    lng.peak_value = FLT_MAX
                    lng.valid_peak = False
                if d.peak_value - v > ph and d.peak_value > d.threshold:
                    d.valid_peak = True
                if d.valid_peak and (i - d.peak_pos) > d.window_length // 2:
                    peaks.append(d.peak_pos)
                    d.peak_pos = -1
                    d.peak_value = v
                    d.valid_peak = False
    return peaks


def events_from_peaks(
    peaks: list[int], ps: np.ndarray, pss: np.ndarray, L: int,
    signal: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CreateEvents (event.h:200-224): boundaries [0, p_0..p_{n-2}, L].

    With `signal` given, per-event stats use direct local sums (the device
    pipeline's accurate formulation) instead of prefix-sum differences.
    Returns (starts, means, stdvs); len == max(1, len(peaks)).
    """
    n = len(peaks)
    if n == 0:
        bounds = [0, L]
    elif n == 1:
        bounds = [0, peaks[0], L]
    else:
        bounds = [0] + list(peaks[: n - 1]) + [L]
    starts = np.array(bounds[:-1], np.int64)
    ends = np.array(bounds[1:], np.int64)
    lengths = (ends - starts).astype(np.float32)
    if signal is not None:
        x = signal.astype(np.float32)
        s = np.array(
            [x[a:b].sum(dtype=np.float32) for a, b in zip(starts, ends)],
            np.float32,
        )
        sq = np.array(
            [(x[a:b] * x[a:b]).sum(dtype=np.float32) for a, b in zip(starts, ends)],
            np.float32,
        )
        means = s / lengths
        var = sq / lengths - means * means
    else:
        means = (ps[ends] - ps[starts]) / lengths
        var = (pss[ends] - pss[starts]) / lengths - means * means
    stdvs = np.sqrt(np.maximum(var, 0.0)).astype(np.float32)
    return starts, means.astype(np.float32), stdvs


def zscore(x: np.ndarray) -> np.ndarray:
    """GenerateZscoreNormalizedSignal (sigmap.cc:1131-1155): float64 mean,
    (n-1) variance, output fp32."""
    mean = np.float64(x.astype(np.float64).sum()) / len(x)
    sd = np.sqrt(((x.astype(np.float64) - mean) ** 2).sum() / (len(x) - 1))
    return ((x - np.float32(mean)) / np.float32(sd)).astype(np.float32)


def compress_features(
    norm_means: np.ndarray, stdvs: np.ndarray, delta: float = 0.1
) -> tuple[np.ndarray, np.ndarray]:
    """Delta run-collapse (sigmap.cc:1072-1079): keep i==0 and any value
    whose |diff| from the last *kept* value exceeds delta."""
    keep_vals: list[np.float32] = []
    keep_stdv: list[np.float32] = []
    for i, v in enumerate(norm_means):
        if i == 0 or abs(np.float32(v) - keep_vals[-1]) > delta:
            keep_vals.append(np.float32(v))
            keep_stdv.append(stdvs[i])
    return np.array(keep_vals, np.float32), np.array(keep_stdv, np.float32)


def generate_events(
    signal: np.ndarray,
    cfg: EventDetectorConfig = EventDetectorConfig(),
    compress_delta: float = 0.1,
    accurate_tstat: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Full GenerateEvents (sigmap.cc:1048-1083) over one chunk:
    detect -> means -> zscore -> compress.  Returns (features, stdvs).

    accurate_tstat=True swaps the C++ prefix-sum t-stat for the stable
    centered formulation the device pipeline uses."""
    L = len(signal)
    ps, pss = prefix_sums(signal)
    if accurate_tstat:
        t1 = tstat_centered(signal, L, cfg.window_length1)
        t2 = tstat_centered(signal, L, cfg.window_length2)
    else:
        t1 = tstat(ps, pss, L, cfg.window_length1)
        t2 = tstat(ps, pss, L, cfg.window_length2)
    peaks = detect_peaks(t1, t2, L, cfg)
    _, means, stdvs = events_from_peaks(
        peaks, ps, pss, L, signal=signal if accurate_tstat else None
    )
    norm = zscore(means)
    return compress_features(norm, stdvs, compress_delta)

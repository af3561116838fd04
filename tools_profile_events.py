#!/usr/bin/env python
"""Fine-grained profile of the event pipeline + sweep internals at B=1024."""
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(out):
    """block_until_ready does not block over the axon tunnel; force a
    host materialization of a tiny dependent slice of every leaf."""
    import jax
    for x in jax.tree.leaves(out):
        np.asarray(x.ravel()[:1])


def tit(fn, *a, label="", reps=5, **kw):
    out = fn(*a, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a, **kw)
        _sync(out)
    log(f"  {label}: {(time.perf_counter()-t0)/reps*1000:.1f} ms")
    return out


def main():
    import jax
    import jax.numpy as jnp

    from sigmap_tpu.config import EventDetectorConfig
    from sigmap_tpu.signal import events as ev
    from sigmap_tpu.signal.events_pallas import detect_peaks_pallas
    from sigmap_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    B, C = 1024, 4000
    E = F = 1024
    cfg = EventDetectorConfig()
    rng = np.random.default_rng(0)
    # plausible pore signal: piecewise-constant levels + noise
    n_lev = C // 10
    lev = rng.normal(100, 20, (B, n_lev)).astype(np.float32)
    chunks = jnp.asarray(np.repeat(lev, 10, axis=1) +
                         rng.normal(0, 2, (B, C)).astype(np.float32))
    lengths = jnp.full((B,), C, jnp.int32)

    t1 = tit(jax.jit(lambda c, l: ev.batch_tstat(c, l, 3)), chunks, lengths,
             label="tstat w=3")
    t2 = tit(jax.jit(lambda c, l: ev.batch_tstat(c, l, 6)), chunks, lengths,
             label="tstat w=6")
    emits = tit(jax.jit(lambda a, b, l: detect_peaks_pallas(a, b, l, cfg)),
                t1, t2, lengths, label="peaks pallas")
    peaks1, n_peaks = tit(jax.jit(lambda e: ev.compact_nonzero(e, E)), emits,
                          label="compact_nonzero")
    peaks = peaks1 - 1
    means, stdvs, num_events = tit(
        jax.jit(lambda p, n, c, l: ev.events_from_peaks_batch(p, n, c, l, E)),
        peaks, n_peaks, chunks, lengths, label="events_from_peaks")
    norm = tit(jax.jit(ev.zscore_masked), means, num_events, label="zscore")
    tit(jax.jit(lambda a, b, n: ev.compress_features_batch(a, b, n, 0.1, F)),
        norm, stdvs, num_events, label="compress")
    log(f"  n_peaks mean {np.asarray(n_peaks).mean():.0f}, "
        f"events mean {np.asarray(num_events).mean():.0f}")


if __name__ == "__main__":
    main()

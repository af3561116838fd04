#!/usr/bin/env python
"""Host-side analysis of sweep DMA volume for a real round-0 seed set:
how many tiles does each seed block stream, and how does TILE granularity
affect total bytes?"""
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(genome_mb=2.0, B=64, read_bases=3000):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sigmap_tpu.config import SigmapConfig
    from sigmap_tpu.index.build import build_index
    from sigmap_tpu.index.sweep import (
        SWEEP_DIMS, SWEEP_OFFSET, SWEEP_RADIX, SweepIndex,
    )
    from sigmap_tpu.io.fasta import ReferenceSequence
    from sigmap_tpu.io.pore_model import make_synthetic_pore_model
    from sigmap_tpu.io.signals import ReadSignal, dac_to_pa
    from sigmap_tpu.mapping.turbo import TurboParams, build_seeds
    from sigmap_tpu.signal.events import batch_generate_events
    from sigmap_tpu.synth import random_genome, simulate_reads

    cfg = SigmapConfig()
    pore = make_synthetic_pore_model(k=6, seed=0)
    genome = random_genome(int(genome_mb * 1e6), seed=1)
    seqs = [ReferenceSequence(n, c) for n, c in genome]
    idx = build_index(seqs, pore, cfg.index, cfg.mapping.search_radius,
                      verbose=False)
    reads = simulate_reads(pore, genome, B, seed=2, read_bases=read_bases)
    m = cfg.mapping
    p = TurboParams(peaks_impl="scan")
    Cs = m.chunk_size
    sig = np.zeros((B, Cs), np.float32)
    for i, r in enumerate(reads):
        pa = dac_to_pa(r.raw, r.digitisation, r.range, r.offset)
        sig[i, : min(len(pa), Cs)] = pa[: min(len(pa), Cs)]
    feats, _s, counts, _ = batch_generate_events(
        jnp.asarray(sig), jnp.full((B,), Cs, jnp.int32), cfg=cfg.event,
        max_events=p.max_events, max_features=p.max_features,
        compress_delta=m.compress_delta, peaks_impl="scan",
    )
    seeds, qpos, has_f, _ = build_seeds(
        feats, jnp.asarray(counts), jnp.zeros((B,), jnp.int32), p.S,
        m.step_size, idx.dim, m.min_feature_length,
    )
    seeds = np.asarray(seeds.reshape(B * p.S, 8))
    n_valid = int((seeds[:, 0] < 1e9).sum())
    log(f"seeds: {seeds.shape[0]} total, {n_valid} valid")

    radius = m.search_radius
    for TILE in (1024, 512, 256, 128):
        sw = SweepIndex.build(idx, radius, tile=TILE)
        R = SWEEP_RADIX
        w = 2.0 * np.sqrt(radius)
        delta = np.sqrt(radius)
        for block in (128, 256):
            Q = seeds.shape[0]
            qc = np.clip(
                np.floor((seeds[:, :SWEEP_DIMS] - delta) / w).astype(np.int64)
                + SWEEP_OFFSET, 0, R - 1,
            )
            skey = ((qc[:, 0] * R + qc[:, 1]) * R + qc[:, 2]) * R + qc[:, 3]
            perm = np.argsort(skey, kind="stable")
            ss = seeds[perm]
            qb = ss[:, :SWEEP_DIMS]
            lo = np.clip(np.floor((qb - delta) / w).astype(np.int64)
                         + SWEEP_OFFSET, 0, R - 1)
            hi = np.clip(np.floor((qb + delta) / w).astype(np.int64)
                         + SWEEP_OFFSET, 0, R - 1)
            import itertools

            G = Q // block
            total_tiles = 0
            total_windows_spanned = 0
            for g in range(G):
                s, e = g * block, (g + 1) * block
                iv = []
                for (i, j, k) in itertools.product((0, 1), repeat=3):
                    c0 = lo[s:e, 0] + i
                    c1 = lo[s:e, 1] + j
                    c2 = lo[s:e, 2] + k
                    ok = (c0 <= hi[s:e, 0]) & (c1 <= hi[s:e, 1]) & (
                        c2 <= hi[s:e, 2])
                    if not ok.any():
                        continue
                    klo = (((c0 * R + c1) * R + c2) * R + lo[s:e, 3])[ok]
                    khi = klo + (hi[s:e, 3] - lo[s:e, 3])[ok]
                    st = sw.cum[np.clip(klo.min(), 0, len(sw.cum) - 1)]
                    en = sw.cum[np.clip(khi.max() + 1, 0, len(sw.cum) - 1)]
                    if en > st:
                        iv.append((st // TILE, -(-en // TILE)))
                iv.sort()
                last = 0
                for t0, t1 in iv:
                    t0 = max(t0, last)
                    if t1 > t0:
                        total_tiles += t1 - t0
                        last = t1
                total_windows_spanned += 0
            mb = total_tiles * TILE * 8 * 4 / 1e6
            log(f"TILE={TILE:5d} block={block:3d}: G={G:4d} "
                f"tiles={total_tiles:7d} ({total_tiles/G:.1f}/blk) "
                f"DMA={mb:8.1f} MB "
                f"evals={total_tiles*TILE*block/1e9:.2f} G-pairs")


if __name__ == "__main__":
    main(*[float(x) if "." in x else int(x) for x in sys.argv[1:]])

#!/usr/bin/env python
"""Tune sweep_round (TILE, block) on the real TPU with realistic seeds.

Seeds come from an actual turbo round-0 event pipeline over simulated
reads, so locality and fill match production.
"""
import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=2.0)
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--tiles", type=str, default="1024,2048,4096")
    ap.add_argument("--blocks", type=str, default="128,256")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sigmap_tpu.config import SigmapConfig
    from sigmap_tpu.index.build import build_index
    from sigmap_tpu.index.sweep import SweepIndex
    from sigmap_tpu.io.fasta import ReferenceSequence
    from sigmap_tpu.io.pore_model import make_synthetic_pore_model
    from sigmap_tpu.io.signals import dac_to_pa
    from sigmap_tpu.mapping.sweep_search import sweep_round
    from sigmap_tpu.mapping.turbo import TurboParams, build_seeds
    from sigmap_tpu.signal.events import batch_generate_events
    from sigmap_tpu.synth import random_genome, simulate_reads
    from sigmap_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = SigmapConfig()
    pore = make_synthetic_pore_model(k=6, seed=0)
    genome = random_genome(int(args.genome_mb * 1e6), seed=1)
    seqs = [ReferenceSequence(n, c) for n, c in genome]
    idx = build_index(seqs, pore, cfg.index, cfg.mapping.search_radius,
                      verbose=False)
    B = args.B
    p = TurboParams()
    m = cfg.mapping
    reads = simulate_reads(pore, genome, B, seed=2, read_bases=3000)
    ch = np.zeros((B, m.chunk_size), np.float32)
    for i, r in enumerate(reads):
        s = dac_to_pa(r.raw, r.digitisation, r.range, r.offset)
        L = min(len(s), m.chunk_size)
        ch[i, :L] = s[:L]
    clen = jnp.full((B,), m.chunk_size, jnp.int32)
    feats, _s, counts, _ = batch_generate_events(
        jnp.asarray(ch), clen, cfg=cfg.event, max_events=p.max_events,
        max_features=p.max_features, compress_delta=m.compress_delta,
        peaks_impl="pallas",
    )
    seeds, qpos, _hf, _ovf = jax.jit(
        lambda f, c: build_seeds(f, c, jnp.zeros((B,), jnp.int32), p.S,
                                 m.step_size, idx.dim, m.min_feature_length)
    )(feats, counts)
    seeds = np.asarray(seeds.reshape(B * p.S, 8))
    log(f"seeds: {len(seeds)} ({(seeds[:, 0] < 1e9).mean()*100:.0f}% valid)")

    for TILE in (int(x) for x in args.tiles.split(",")):
        sw = SweepIndex.build(idx, m.search_radius, tile=TILE)
        dt_, dm_, dc_, dr_, dmu_, do_ = (
            jax.device_put(jnp.asarray(x))
            for x in (sw.tiles, sw.meta, sw.cum, sw.rot, sw.mu, sw.origin)
        )
        dq = jax.device_put(jnp.asarray(seeds))

        def run(block):
            return sweep_round(
                dq, dc_, dt_, dm_, dr_, dmu_, do_, radius=m.search_radius,
                K=p.K, TILE=TILE, dim=idx.dim, block=block,
                radixes=sw.radixes, span=sw.span, cell_width=sw.cell_width,
            )

        for block in (int(x) for x in args.blocks.split(",")):
            out = run(block)
            np.asarray(out[0].ravel()[:1])
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                out = run(block)
                np.asarray(out[0].ravel()[:1])
            dt = (time.perf_counter() - t0) / reps
            wrote = np.asarray(out[3])
            log(f"TILE={TILE:5d} block={block:3d}: {dt*1000:7.1f} ms "
                f"({B*p.S/dt/1e6:.2f} M seeds/s) wrote_mean={wrote.mean():.2f}")


if __name__ == "__main__":
    main()

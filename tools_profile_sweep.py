#!/usr/bin/env python
"""Measure sweep_round on the real TPU at production-ish shapes."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(genome_mb=2.0, B=256, S=256, K=16, TILE=1024, radius_scale=1.0,
         shift_unbucketed=0.0, blocks="64,128"):
    from sigmap_tpu.config import SigmapConfig
    from sigmap_tpu.index.build import build_index
    from sigmap_tpu.index.sweep import SweepIndex
    from sigmap_tpu.io.fasta import ReferenceSequence
    from sigmap_tpu.io.pore_model import make_synthetic_pore_model
    from sigmap_tpu.mapping.sweep_search import SEED_PAD, sweep_round
    from sigmap_tpu.synth import random_genome
    from sigmap_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = SigmapConfig()
    pore = make_synthetic_pore_model(k=6, seed=0)
    genome = random_genome(int(genome_mb * 1e6), seed=1)
    seqs = [ReferenceSequence(n, c) for n, c in genome]
    t0 = time.perf_counter()
    idx = build_index(seqs, pore, cfg.index, cfg.mapping.search_radius,
                      verbose=False)
    sw = SweepIndex.build(idx, cfg.mapping.search_radius, tile=TILE)
    print(f"index+sweep build: {time.perf_counter()-t0:.1f}s, "
          f"{sw.n_windows} windows, {sw.n_tiles} tiles, "
          f"radixes {sw.radixes} span {sw.span}", file=sys.stderr)

    # realistic seeds: noisy raw-space windows, ~75% fill
    rng = np.random.default_rng(0)
    Q = B * S
    W = np.lib.stride_tricks.sliding_window_view(
        idx.values, idx.dim
    )[: sw.n_windows]
    n_real = int(Q * 0.75)
    picks = rng.integers(0, len(W), n_real)
    qs = np.zeros((Q, 8), np.float32)
    qs[:, : idx.dim] = SEED_PAD
    qs[:n_real, : idx.dim] = W[picks] + rng.normal(
        0, 0.08, (n_real, idx.dim)
    ).astype(np.float32)
    if shift_unbucketed:
        # shift a dim past the bucketed ones: identical cells/visits,
        # zero matches -> isolates the scan from extraction
        qs[:n_real, idx.dim - 1] += shift_unbucketed

    dq = jax.device_put(jnp.asarray(qs))
    dcum = jax.device_put(jnp.asarray(sw.cum))
    dtiles = jax.device_put(jnp.asarray(sw.tiles))
    dmeta = jax.device_put(jnp.asarray(sw.meta))
    drot = jax.device_put(jnp.asarray(sw.rot))
    dmu = jax.device_put(jnp.asarray(sw.mu))
    dorg = jax.device_put(jnp.asarray(sw.origin))
    eff_radius = cfg.mapping.search_radius * radius_scale

    def run(block):
        return sweep_round(dq, dcum, dtiles, dmeta, drot, dmu, dorg,
                           radius=eff_radius, K=K, TILE=TILE, block=block,
                           radixes=sw.radixes, span=sw.span,
                           cell_width=sw.cell_width)

    for block in (int(x) for x in blocks.split(",")):
        t0 = time.perf_counter()
        out = run(block)
        host = tuple(np.asarray(x) for x in out)
        tc0 = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(block)
            cnt = np.asarray(out[2])
        dt = (time.perf_counter() - t0) / reps
        print(f"sweep block={block}: {dt*1000:.1f} ms "
              f"(compile {tc0:.0f}s) matches={int(cnt.sum())} "
              f"wrote={int(np.asarray(out[3]).sum())}", file=sys.stderr)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=2.0)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seeds", type=int, default=256)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--radius-scale", type=float, default=1.0)
    ap.add_argument("--shift5", type=float, default=0.0)
    ap.add_argument("--blocks", type=str, default="64,128")
    a = ap.parse_args()
    main(a.genome_mb, a.batch, a.seeds, a.k, a.tile, a.radius_scale,
         a.shift5, a.blocks)

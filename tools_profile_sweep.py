#!/usr/bin/env python
"""Measure sweep_round on the real TPU at production-ish shapes."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(genome_mb=2.0, B=256, S=256, K=16, TILE=1024, radius_scale=1.0,
         shift5=0.0, blocks="32,64,128"):
    from sigmap_tpu.config import SigmapConfig
    from sigmap_tpu.index.build import build_index
    from sigmap_tpu.index.sweep import SweepIndex
    from sigmap_tpu.io.fasta import ReferenceSequence
    from sigmap_tpu.io.pore_model import make_synthetic_pore_model
    from sigmap_tpu.mapping.sweep_search import SEED_PAD, sweep_round
    from sigmap_tpu.synth import random_genome

    cfg = SigmapConfig()
    pore = make_synthetic_pore_model(k=6, seed=0)
    genome = random_genome(int(genome_mb * 1e6), seed=1)
    seqs = [ReferenceSequence(n, c) for n, c in genome]
    t0 = time.perf_counter()
    idx = build_index(seqs, pore, cfg.index, cfg.mapping.search_radius,
                      verbose=False)
    sw = SweepIndex.build(idx, cfg.mapping.search_radius, tile=TILE)
    print(f"index+sweep build: {time.perf_counter()-t0:.1f}s, "
          f"{sw.n_windows} windows, {sw.n_tiles} tiles", file=sys.stderr)

    # realistic seeds: noisy windows (as in mapping), ~75% fill like a
    # real wavefront round
    rng = np.random.default_rng(0)
    Q = B * S
    W = np.ascontiguousarray(
        sw.tiles[: max(1, sw.n_tiles // 2)].transpose(0, 2, 1).reshape(-1, 8)
    )
    W[:, idx.dim:] = 0.0
    n_real = int(Q * 0.75)
    picks = rng.integers(0, len(W), n_real)
    qs = np.zeros((Q, 8), np.float32)
    qs[:, : idx.dim] = SEED_PAD
    qs[:n_real] = W[picks] + np.concatenate(
        [rng.normal(0, 0.08, (n_real, idx.dim)).astype(np.float32),
         np.zeros((n_real, 8 - idx.dim), np.float32)], axis=1)
    if shift5:
        # shift an UNbucketed dim: identical cells/visits/dots, zero matches
        # -> isolates extraction cost
        qs[:n_real, idx.dim - 1] += shift5

    dq = jax.device_put(jnp.asarray(qs))
    dcum = jax.device_put(jnp.asarray(sw.cum))
    dtiles = jax.device_put(jnp.asarray(sw.tiles))
    dmeta = jax.device_put(jnp.asarray(sw.meta))

    eff_radius = cfg.mapping.search_radius * radius_scale
    import os

    prec = os.environ.get("SWEEP_PREC", "highest")

    def run(block=32):
        return sweep_round(dq, dcum, dtiles, dmeta,
                           radius=eff_radius, K=K, TILE=TILE,
                           block=block, mxu_precision=prec)

    # --- prep-only timing + tile-visit census ---
    import itertools
    from functools import partial as _p
    import jax as _jax
    from sigmap_tpu.mapping import sweep_search as ss

    bd = ss.bucket_dims(idx.dim)
    NO = 1 << (bd - 1)

    @_p(_jax.jit, static_argnames=("radius", "TILE"))
    def prep_only(seeds, cum, radius, TILE):
        Q = seeds.shape[0]
        R = ss.SWEEP_RADIX
        w = jnp.float32(2.0 * np.sqrt(radius))
        delta = jnp.float32(np.sqrt(radius))
        qc = jnp.clip(jnp.floor((seeds[:, :bd] - delta) / w)
                      .astype(jnp.int32) + ss.SWEEP_OFFSET, 0, R - 1)
        skey = qc[:, 0]
        for d in range(1, bd):
            skey = skey * R + qc[:, d]
        _, perm = _jax.lax.sort((skey, jnp.arange(Q, dtype=jnp.int32)), num_keys=1)
        seeds_s = jnp.take(seeds, perm, axis=0)
        iperm = jnp.zeros((Q,), jnp.int32).at[perm].set(jnp.arange(Q, dtype=jnp.int32))
        klo, khi = ss.seed_cell_bounds(seeds_s, radius, bd)
        G = Q // ss.BLOCK
        bmin = klo.reshape(G, ss.BLOCK, NO).min(axis=1)
        bmax = khi.reshape(G, ss.BLOCK, NO).max(axis=1)
        CS = cum.shape[0] - 1
        start = cum[jnp.clip(bmin, 0, CS)]
        end = cum[jnp.clip(bmax + 1, 0, CS)]
        empty = (bmax < bmin) | (end <= start)
        t0_ = jnp.where(empty, 9999999, start // TILE)
        t1_ = jnp.where(empty, 9999999, -(-end // TILE))
        t0s, t1s = _jax.lax.sort((t0_, t1_), dimension=1, num_keys=1)
        emax = _jax.lax.associative_scan(jnp.maximum, t1s, axis=1)
        prev_end = jnp.concatenate([jnp.zeros((G, 1), jnp.int32), emax[:, :-1]], axis=1)
        m_start = jnp.maximum(t0s, prev_end)
        tcnt = jnp.clip(t1s - m_start, 0)
        return tcnt, iperm

    tc, _ = prep_only(dq, dcum, radius=cfg.mapping.search_radius, TILE=TILE)
    tc_h = np.asarray(tc)
    print(f"tile visits: total={tc_h.sum()} max/block={tc_h.sum(axis=1).max()} "
          f"mean/block={tc_h.sum(axis=1).mean():.1f}", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(5):
        tc, _ = prep_only(dq, dcum, radius=cfg.mapping.search_radius, TILE=TILE)
        _ = np.asarray(tc)[:1]
    print(f"prep-only: {(time.perf_counter()-t0)/5*1000:.1f} ms", file=sys.stderr)

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
    ap.add_argument("--blocks", type=str, default="32,64,128")
    a = ap.parse_args()
    main(a.genome_mb, a.batch, a.seeds, a.k, a.tile, a.radius_scale, a.shift5,
         a.blocks)

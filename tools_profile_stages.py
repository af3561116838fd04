#!/usr/bin/env python
"""Stage-by-stage device timing of the fast round on real TPU."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3, label=""):
    out = fn(*args)
    _ = jax.tree_util.tree_map(
        lambda x: np.asarray(x).ravel()[:1], out
    )
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _ = jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1000:.1f} ms", file=sys.stderr)
    return out


def main(genome_mb=2.0, B=64):
    from sigmap_tpu.config import SigmapConfig
    from sigmap_tpu.index.build import build_index
    from sigmap_tpu.io.fasta import ReferenceSequence
    from sigmap_tpu.io.pore_model import make_synthetic_pore_model
    from sigmap_tpu.io.signals import ReadSignal, dac_to_pa
    from sigmap_tpu.mapping.seeding import DeviceIndex
    from sigmap_tpu.signal.events import batch_generate_events
    from sigmap_tpu.synth import random_genome, simulate_reads

    cfg = SigmapConfig()
    pore = make_synthetic_pore_model(k=6, seed=0)
    genome = random_genome(int(genome_mb * 1e6), seed=1)
    seqs = [ReferenceSequence(n, c) for n, c in genome]
    idx = build_index(seqs, pore, cfg.index, cfg.mapping.search_radius,
                      verbose=False)
    print(f"index: {idx.n_points} pts", file=sys.stderr)
    dev = DeviceIndex.from_host(idx, radius=cfg.mapping.search_radius)
    reads = simulate_reads(pore, genome, B, seed=2, read_bases=3000)
    m = cfg.mapping
    Cs = m.chunk_size
    chunks = np.zeros((B, Cs), np.float32)
    lengths = np.zeros(B, np.int32)
    for i, r in enumerate(reads):
        pa = dac_to_pa(r.raw, r.digitisation, r.range, r.offset)
        seg = pa[:Cs]
        chunks[i, : len(seg)] = seg
        lengths[i] = len(seg)
    dchunks = jax.device_put(jnp.asarray(chunks))
    dlen = jax.device_put(jnp.asarray(lengths))

    # ---- stage 1: events
    ev = jax.jit(lambda c, l: batch_generate_events(c, l, cfg=cfg.event,
                                                    peaks_impl="pallas"))
    feats, _stdv, counts, _ = timeit(ev, dchunks, dlen, label="events(pallas)")
    ev2 = jax.jit(lambda c, l: batch_generate_events(c, l, cfg=cfg.event,
                                                     peaks_impl="scan"))
    timeit(ev2, dchunks, dlen, label="events(scan)")

    # ---- build one round's seeds (host, from feats)
    feats_h = np.asarray(feats)
    counts_h = np.asarray(counts)
    dim = idx.dim
    rows = []
    for i in range(B):
        n = int(counts_h[i])
        for p in range(2, n - dim + 1, 2):
            w = np.zeros(8, np.float32)
            w[:dim] = feats_h[i, p:p + dim]
            rows.append(w)
    seeds = np.array(rows, np.float32)
    Q = len(seeds)
    print(f"real seeds this round: {Q}", file=sys.stderr)
    QP = 8192
    padded = np.zeros((QP, 8), np.float32)
    padded[:Q] = seeds[:QP]
    valid = np.arange(QP) < Q
    dseeds = jax.device_put(jnp.asarray(padded))
    dvalid = jax.device_put(jnp.asarray(valid))

    # ---- stage 2a: probe ranges only
    from sigmap_tpu.mapping.seeding import (
        _probe_ranges_hash, _probe_ranges_merged)

    pr = jax.jit(_probe_ranges_merged)
    timeit(pr, dev, dseeds, dvalid, label="probe_ranges_merged(searchsorted)")
    ph = jax.jit(_probe_ranges_hash)
    starts, lens = timeit(ph, dev, dseeds, dvalid, label="probe_ranges_hash")
    lens_h = np.asarray(lens)
    print(f"candidates: total={lens_h.sum()}, "
          f"per-seed mean={lens_h.sum()/max(Q,1):.0f} "
          f"p99={np.percentile(lens_h.sum(axis=1)[:Q], 99):.0f} "
          f"max={lens_h.sum(axis=1).max()}", file=sys.stderr)

    # ---- stage 2b: full search, kernel engine
    from sigmap_tpu.mapping.seeding import search_flat_kernel
    out = timeit(search_flat_kernel, dev, dseeds, dvalid, label="search_flat_kernel")
    print(f"matches: {int(np.asarray(out[3]))}", file=sys.stderr)

    # ---- stage 2c: one-stage flat engine at safe t_cap
    from sigmap_tpu.mapping.seeding import search_round_flat
    t_cap = 1 << 22
    from functools import partial
    sf = jax.jit(partial(search_round_flat, t_cap=t_cap))
    try:
        out2 = timeit(sf, dev, dseeds, dvalid, label=f"search_round_flat({t_cap})")
        print(f"flat matches: {int(np.asarray(out2[3].sum()))}",
              file=sys.stderr)
    except Exception as e:
        print(f"flat failed: {type(e).__name__}", file=sys.stderr)

    # ---- stage 3: sort + banded chain + traceback on synthetic anchors
    from sigmap_tpu.mapping.chain_device import chain_scores_banded
    a_cap = 8192
    rng = np.random.default_rng(0)
    na = rng.integers(100, 2000, B)
    a_t = np.zeros((B, a_cap), np.int32)
    a_q = np.zeros((B, a_cap), np.int32)
    a_d = np.zeros((B, a_cap), np.float32)
    a_g = np.full((B, a_cap), -1, np.int32)
    for i in range(B):
        n = na[i]
        a_t[i, :n] = np.sort(rng.integers(0, 1 << 20, n))
        a_q[i, :n] = rng.integers(0, 400, n)
        a_d[i, :n] = rng.uniform(0, 0.08, n)
        a_g[i, :n] = rng.integers(0, 4, n)
    dt_, dq_, dd_, dg_ = map(
        lambda a: jax.device_put(jnp.asarray(a)), (a_t, a_q, a_d, a_g))

    def sort_chain(t, q, d, g):
        sort_g = jnp.where(g >= 0, g, jnp.int32(1 << 20))
        sort_g, t, q, d, g = jax.lax.sort(
            (sort_g, t, q, d, g), dimension=1, num_keys=3)
        valid = g >= 0
        scores, preds = chain_scores_banded(
            t, q, d, jnp.where(valid, g, -1), valid, 0.08, 6, cfg.chain)
        return scores, preds

    timeit(jax.jit(sort_chain), dt_, dq_, dd_, dg_,
           label="sort+chain_scan[B,8192]")

    from sigmap_tpu.ops.chain_kernel import chain_scores_banded_pallas

    def sort_chain_k(t, q, d, g):
        sort_g = jnp.where(g >= 0, g, jnp.int32(1 << 20))
        sort_g, t, q, d, g = jax.lax.sort(
            (sort_g, t, q, d, g), dimension=1, num_keys=3)
        valid = g >= 0
        scores, preds = chain_scores_banded_pallas(
            t, q, d, jnp.where(valid, g, -1), valid, 0.08, 6, cfg.chain)
        return scores, preds

    timeit(jax.jit(sort_chain_k), dt_, dq_, dd_, dg_,
           label="sort+chain_pallas[B,8192]")

    def sort_only(t, q, d, g):
        sort_g = jnp.where(g >= 0, g, jnp.int32(1 << 20))
        return jax.lax.sort((sort_g, t, q, d, g), dimension=1, num_keys=3)

    timeit(jax.jit(sort_only), dt_, dq_, dd_, dg_, label="sort[B,8192]")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=2.0)
    ap.add_argument("--batch", type=int, default=64)
    a = ap.parse_args()
    main(a.genome_mb, a.batch)

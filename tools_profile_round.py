#!/usr/bin/env python
"""Profile one fast_round on the real TPU: device time vs overhead."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(genome_mb=2.0, B=64):
    from sigmap_tpu.config import SigmapConfig
    from sigmap_tpu.index.build import build_index
    from sigmap_tpu.io.fasta import ReferenceSequence
    from sigmap_tpu.io.pore_model import make_synthetic_pore_model
    from sigmap_tpu.io.signals import ReadSignal, dac_to_pa
    from sigmap_tpu.mapping.driver import Mapper
    from sigmap_tpu.mapping.fast_round import fast_round
    from sigmap_tpu.synth import random_genome, simulate_reads

    cfg = SigmapConfig()
    pore = make_synthetic_pore_model(k=6, seed=0)
    genome = random_genome(int(genome_mb * 1e6), seed=1)
    seqs = [ReferenceSequence(n, c) for n, c in genome]
    t0 = time.perf_counter()
    idx = build_index(seqs, pore, cfg.index, cfg.mapping.search_radius,
                      verbose=False)
    print(f"index: {idx.n_points} pts {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    reads = simulate_reads(pore, genome, B, seed=2, read_bases=3000)
    signals = [
        ReadSignal(r.read_id, r.digitisation, r.range, r.offset,
                   dac_to_pa(r.raw, r.digitisation, r.range, r.offset))
        for r in reads
    ]
    import dataclasses
    cfg = dataclasses.replace(
        cfg, runtime=dataclasses.replace(
            cfg.runtime, read_batch=B, search_impl="kernel"))
    t0 = time.perf_counter()
    mapper = Mapper(idx, cfg)
    print(f"Mapper init (autotune): {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    m = cfg.mapping
    Cs = m.chunk_size
    chunks = np.zeros((B, Cs), np.float32)
    lengths = np.zeros(B, np.int32)
    for i, s in enumerate(signals):
        seg = s.pa[:Cs]
        chunks[i, : len(seg)] = seg
        lengths[i] = len(seg)
    CARRY = 512
    carry = (
        jnp.zeros((B, CARRY), jnp.int32),
        jnp.zeros((B, CARRY), jnp.int32),
        jnp.zeros((B, CARRY), jnp.float32),
        jnp.full((B, CARRY), -1, jnp.int32),
    )
    offsets = jnp.zeros((B,), jnp.int32)
    reset = np.ones(B, bool)
    dchunks = jax.device_put(jnp.asarray(chunks))
    dlen = jax.device_put(jnp.asarray(lengths))
    dreset = jax.device_put(jnp.asarray(reset))

    for impl, t_cap in (("kernel", 1 << 22), ("flat", 1 << 22)):
        def run():
            return fast_round(
                mapper.dev, dchunks, dlen, *carry, offsets, dreset,
                step=m.step_size, a_cap=8192, carry_cap=CARRY,
                ed_cfg=cfg.event, chain_cfg=cfg.chain,
                search_interpret=False, peaks_impl="pallas",
                chain_impl="pallas", search_impl=impl, t_cap=t_cap,
            )
        t0 = time.perf_counter()
        out = run()
        host = tuple(np.asarray(x) for x in out[:3])
        t_compile = time.perf_counter() - t0
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run()
            host = tuple(np.asarray(x) for x in out[:3])
        dt = (time.perf_counter() - t0) / reps
        print(f"B={B} impl={impl}: compile {t_compile:.1f}s, "
              f"round {dt*1000:.1f} ms "
              f"({B/dt:.0f} chunk-steps/s)", file=sys.stderr)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=2.0)
    ap.add_argument("--batch", type=int, default=64)
    a = ap.parse_args()
    main(a.genome_mb, a.batch)

#!/usr/bin/env python
"""Profile the turbo engine on real TPU: per-round time vs batch size,
plus a per-stage breakdown of one round."""
import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=2.0)
    ap.add_argument("--batches", type=str, default="64,256")
    ap.add_argument("--reads", type=int, default=256)
    ap.add_argument("--read-bases", type=int, default=3000)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--K", type=int, default=None,
                    help="override TurboParams.K")
    ap.add_argument("--S", type=int, default=None)
    ap.add_argument("--ring", type=int, default=None)
    ap.add_argument("--block", type=int, default=None)
    args = ap.parse_args()

    import jax

    from sigmap_tpu.config import SigmapConfig
    from sigmap_tpu.index.build import build_index
    from sigmap_tpu.io.fasta import ReferenceSequence
    from sigmap_tpu.io.pore_model import make_synthetic_pore_model
    from sigmap_tpu.io.signals import ReadSignal, dac_to_pa
    from sigmap_tpu.mapping.turbo import TurboMapper
    from sigmap_tpu.synth import random_genome, simulate_reads
    from sigmap_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = SigmapConfig()
    pore = make_synthetic_pore_model(k=6, seed=0)
    genome = random_genome(int(args.genome_mb * 1e6), seed=1)
    seqs = [ReferenceSequence(n, c) for n, c in genome]
    t0 = time.perf_counter()
    idx = build_index(seqs, pore, cfg.index, cfg.mapping.search_radius,
                      verbose=False)
    log(f"index: {time.perf_counter()-t0:.1f}s")
    reads = simulate_reads(pore, genome, args.reads, seed=2,
                           read_bases=args.read_bases)
    signals = [
        ReadSignal(r.read_id, r.digitisation, r.range, r.offset,
                   dac_to_pa(r.raw, r.digitisation, r.range, r.offset))
        for r in reads
    ]

    import dataclasses

    tm = None
    for B in (int(x) for x in args.batches.split(",")):
        cfgB = dataclasses.replace(
            cfg, runtime=dataclasses.replace(
                cfg.runtime, read_batch=B,
                sweep_cache_dir="/root/.cache/sigmap_tpu_sweep",
            )
        )
        t0 = time.perf_counter()
        from sigmap_tpu.mapping.turbo import TurboParams

        params = None
        if args.K or args.S or args.ring or args.block:
            on_cpu = jax.default_backend() == "cpu"
            dflt = TurboParams(peaks_impl="scan" if on_cpu else "pallas")
            params = dataclasses.replace(
                dflt, K=args.K or dflt.K, S=args.S or dflt.S,
                RING=args.ring or dflt.RING, block=args.block or dflt.block,
            )
        tm = TurboMapper(idx, cfgB, params)
        log(f"B={B}: mapper init {time.perf_counter()-t0:.1f}s")
        batch = signals[:B] if len(signals) >= B else signals
        t0 = time.perf_counter()
        prep = tm._prepare_batch(batch)
        feats_all, counts_all, n_full_d, n_full, NC = prep
        np.asarray(counts_all.ravel()[:1])
        log(f"B={B}: prepare (quantize+upload+events, compile) "
            f"{time.perf_counter()-t0:.1f}s  NC={NC}")
        t0 = time.perf_counter()
        prep = tm._prepare_batch(batch)
        feats_all, counts_all, n_full_d, n_full, NC = prep
        np.asarray(counts_all.ravel()[:1])
        log(f"B={B}: prepare (warm) {time.perf_counter()-t0:.2f}s")
        state = tm._place_state(tm._init_state(B))
        (chunk_idx, done, stopped, offsets, carry, rb_f, rb_i) = state

        from sigmap_tpu.mapping.turbo import slice_chunk

        t0 = time.perf_counter()
        f_r, c_r = slice_chunk(feats_all, counts_all, np.int32(0))
        out = tm._run_round(f_r, c_r, n_full_d,
                            chunk_idx, done, stopped, offsets, carry,
                            rb_f, rb_i)
        np.asarray(out[-1])
        log(f"B={B}: first round (compile) {time.perf_counter()-t0:.1f}s")
        times = []
        out_prev = out[:7]
        for r in range(args.rounds):
            t0 = time.perf_counter()
            f_r, c_r = slice_chunk(feats_all, counts_all, np.int32(r + 1))
            out = tm._run_round(f_r, c_r,
                                n_full_d, *out_prev)
            hs = np.asarray(out[-1])
            dt = time.perf_counter() - t0
            out_prev = out[:7]
            times.append(dt)
            ndone = int(hs[:B].sum())
            log(f"B={B}: round {r}: {dt*1000:.1f} ms  done={ndone}/{B}")
        tpr = float(np.median(times))
        log(f"B={B}: median round {tpr*1000:.1f} ms -> "
            f"{B/tpr:.0f} read-rounds/s")

    if args.stages and tm is not None:
        _stages(tm, feats_all, counts_all, B, log)


def _stages(tm, feats_all, counts_all, B, log):
    """Time each stage of one round separately (jitted pieces)."""
    import functools

    import jax
    import jax.numpy as jnp

    from sigmap_tpu.mapping.turbo import anchors_qpos_major, build_seeds
    from sigmap_tpu.mapping.sweep_search import sweep_round
    from sigmap_tpu.ops.chain_fused import chain_fused

    p = tm.p
    m = tm.cfg.mapping
    state = tm._init_state(B)
    (chunk_idx, done, stopped, offsets, carry, rb_f, rb_i) = state

    def sync(o):
        for x in jax.tree.leaves(o):
            np.asarray(x.ravel()[:1])

    def tit(fn, *a, label="", reps=5, **kw):
        out = fn(*a, **kw)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a, **kw)
            sync(out)
        log(f"  {label}: {(time.perf_counter()-t0)/reps*1000:.1f} ms")
        return out

    feats = feats_all[:, 0]
    counts = counts_all[:, 0]
    bs = jax.jit(functools.partial(
        build_seeds, S=p.S, step=m.step_size, dim=tm.index.dim,
        min_feature_length=m.min_feature_length,
    ))
    seeds, qpos, has_f, _ovf = tit(bs, feats, counts, offsets,
                                   label="build_seeds")
    radixes, span, cell_width = tm.geom
    sr = functools.partial(
        sweep_round, radius=m.search_radius, K=p.K, TILE=p.TILE,
        dim=tm.index.dim, block=p.block, radixes=radixes, span=span,
        cell_width=cell_width, interpret=tm.interpret,
    )
    m_meta, m_d2, cnt, wrote = tit(
        sr, seeds.reshape(B * p.S, 8), tm.cum, tm.tiles, tm.meta,
        tm.rot, tm.mu, tm.origin,
        label="sweep_round",
    )
    cnt_h = np.asarray(cnt)
    qs = np.percentile(cnt_h, [50, 90, 99, 99.9, 100])
    log(f"  match counts: p50={qs[0]:.0f} p90={qs[1]:.0f} p99={qs[2]:.0f} "
        f"p99.9={qs[3]:.0f} max={qs[4]:.0f}  overflow(>K={p.K}): "
        f"{(cnt_h > p.K).mean()*100:.2f}% of seeds")
    aq = jax.jit(functools.partial(
        anchors_qpos_major, B=B, S=p.S, K=p.K,
    ))
    n_t, n_q, n_d, n_g = tit(aq, m_meta, m_d2, wrote, qpos,
                             label="anchors_qpos_major")
    c_t, c_q, c_g, c_score, c_stt, c_stq, c_n, c_sumd = carry
    a_t = jnp.concatenate([c_t, n_t], axis=0)
    a_q = jnp.concatenate([c_q, n_q], axis=0)
    a_d = jnp.concatenate([jnp.zeros((p.RING, B), jnp.float32), n_d], axis=0)
    a_g = jnp.concatenate([jnp.where(c_g == -2, -1, c_g), n_g], axis=0)
    cf = functools.partial(
        chain_fused, radius=m.search_radius, dim=tm.index.dim, ring=p.RING,
        cfg=tm.cfg.chain, interpret=tm.interpret, kb=p.K,
    )
    tit(cf, a_t, a_q, a_d, a_g, c_score, c_stt, c_stq, c_n, c_sumd,
        label="chain_fused")


if __name__ == "__main__":
    main()

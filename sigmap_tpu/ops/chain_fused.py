"""Pallas TPU kernel: fused banded chaining + chain selection + carry.

The turbo engine's back half.  One kernel pass over a read-batch's anchors
computes, per read: the best chain (score + locus + stats), the
second-best non-overlapping chain score, and the carry-out chain state for
the next streaming chunk — with NO anchor sort, NO traceback, and NO
per-anchor HBM outputs:

* anchors arrive in qpos-major order ([B, seeds, K-slots] flattened),
  which is a valid topological order of the chaining DAG (every
  predecessor has strictly smaller qpos, and the reference's gates require
  qdiff > 0 AND tdiff > 0, spatial_index.cc:495-539) — so the tpos sort
  the reference needs (spatial_index.cc:410-417) is unnecessary here;
* the band is the ring of the last RING *valid* anchors per read (per-lane
  cursors), the device analogue of the reference's 5000-predecessor band;
* instead of parent pointers + traceback (spatial_index.cc:165-220), each
  anchor's DP state carries its chain's (start_t, start_q, n_anchors,
  sum_dist) inherited from the argmax predecessor — the best end anchor
  then already holds every statistic the PAF tags need;
* carry-out is the final ring: the last RING valid anchor states, which
  next round's anchors can chain onto (the streaming anchor accumulation
  of spatial_index.cc:302-322, restricted to the chain frontier; the
  driver keeps a running best-so-far summary so early best chains are
  never lost).

Gates/scores match the reference exactly (spatial_index.cc:284-291,
495-539); divergences from the exact path (band size, frontier carry,
two-chain selection) are fast-mode approximations, documented in
mapping/turbo.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ChainingConfig

LANES = 128
NEG = -1.0e30


def _kernel(
    a_t, a_q, a_d, a_g,            # [A, L] inputs (rows 0..CARRY-1 = carry)
    c_score, c_stt, c_stq, c_n, c_sumd,   # [CARRY, L] carried chain state
    sum_f, sum_i,                  # out [8, L] f32 / i32
    o_t, o_q, o_g, o_score, o_stt, o_stq, o_n, o_sumd,  # out ring [RING, L]
    scores_ref,                    # scratch [A, L] f32
    stt_ref,                       # scratch [A, L] i32 chain start_t per row
    *, A, CARRY, RING, KB, radius, dim, cfg: ChainingConfig,
):
    kio = jax.lax.broadcasted_iota(jnp.int32, (RING, LANES), 0)
    kio3 = jax.lax.broadcasted_iota(jnp.int32, (KB, RING, LANES), 1)

    def push(ring, cur, v, vals):
        slot = jax.lax.rem(cur, RING)
        hit = (kio == slot) & v
        out = tuple(
            jnp.where(hit, b, r) for r, b in zip(ring, vals)
        )
        return out, cur + v[0:1, :].astype(jnp.int32)

    def best_update(best, row):
        # online argmax of chain-end states (s, g, te, qe, stt, stq, n, sd)
        s, g, te, qe, stt, stq, n, sd = row
        bs = best[0]
        take = s > bs
        return tuple(jnp.where(take, a, b) for a, b in zip(row, best))

    ring0 = (
        jnp.full((RING, LANES), NEG, jnp.float32),       # score
        jnp.full((RING, LANES), -(1 << 30), jnp.int32),  # t
        jnp.zeros((RING, LANES), jnp.int32),             # q
        jnp.full((RING, LANES), -2, jnp.int32),          # g
        jnp.zeros((RING, LANES), jnp.int32),             # start_t
        jnp.zeros((RING, LANES), jnp.int32),             # start_q
        jnp.zeros((RING, LANES), jnp.int32),             # n
        jnp.zeros((RING, LANES), jnp.float32),           # sumd
    )
    best0 = (
        jnp.full((1, LANES), NEG, jnp.float32),          # s1
        jnp.full((1, LANES), -1, jnp.int32),             # g1
        jnp.zeros((1, LANES), jnp.int32),                # t_end
        jnp.zeros((1, LANES), jnp.int32),                # q_end
        jnp.zeros((1, LANES), jnp.int32),                # start_t
        jnp.zeros((1, LANES), jnp.int32),                # start_q
        jnp.zeros((1, LANES), jnp.int32),                # n
        jnp.zeros((1, LANES), jnp.float32),              # sumd
    )

    def carry_row(i, st):
        ring, cur, best = st
        t = a_t[i, :][None, :]
        q = a_q[i, :][None, :]
        g = a_g[i, :][None, :]
        v = g >= 0
        s = jnp.where(v, c_score[i, :][None, :], NEG)
        row = (
            s, g, t, q, c_stt[i, :][None, :], c_stq[i, :][None, :],
            c_n[i, :][None, :], c_sumd[i, :][None, :],
        )
        scores_ref[i, :] = s[0, :]
        stt_ref[i, :] = row[4][0, :]
        best = best_update(best, row)
        ring, cur = push(
            ring, cur, v,
            (s, t, q, jnp.where(v, g, -2), row[4], row[5], row[6], row[7]),
        )
        return ring, cur, best

    def dp_block(blk, st):
        # KB rows per step: one seed's K match slots share a qpos, so they
        # cannot chain onto each other (the DP gates need qdiff > 0,
        # spatial_index.cc:511) — all KB rows legally read the ring state
        # from BEFORE the block.  Divergence from row-at-a-time: same-seed
        # rows no longer evict older ring entries mid-seed, so the
        # effective band is (slightly) wider — closer to the reference's
        # 5000-anchor band, and what chain_fused_ref(kb=KB) specifies.
        ring, cur, best = st
        r_score, r_t, r_q, r_g, r_stt, r_stq, r_n, r_sumd = ring
        i0 = CARRY + blk * KB
        t = a_t[pl.ds(i0, KB), :]                          # [KB, L]
        q = a_q[pl.ds(i0, KB), :]
        d = a_d[pl.ds(i0, KB), :]
        g = a_g[pl.ds(i0, KB), :]
        v = g >= 0
        coef = 1.0 - 0.2 * d / radius
        init = coef * dim
        tdiff = t[:, None, :] - r_t[None, :, :]            # [KB, RING, L]
        qdiff = q[:, None, :] - r_q[None, :, :]
        ok = (
            (r_g[None, :, :] == g[:, None, :]) & (tdiff > 0) & (qdiff > 0)
            & (r_t[None, :, :] + cfg.max_target_gap_length >= t[:, None, :])
        )
        gap = jnp.abs(tdiff - qdiff)
        gap_scale = jnp.where(
            tdiff > 0, qdiff.astype(jnp.float32) / tdiff.astype(jnp.float32),
            1.0,
        )
        ok &= (
            (gap < cfg.max_gap_length)
            & (gap_scale < cfg.max_gap_scale)
            & (gap_scale > cfg.min_gap_scale)
        )
        match_dim = jnp.minimum(
            jnp.minimum(tdiff, qdiff), dim
        ) * coef[:, None, :]
        cand = jnp.where(ok, r_score[None, :, :] + match_dim, NEG)
        bestc = jnp.max(cand, axis=1)                      # [KB, L]
        bi = jnp.min(
            jnp.where(cand == bestc[:, None, :], kio3, RING), axis=1
        )
        sel = kio3 == bi[:, None, :]                       # [KB, RING, L]

        def extract(arr, dt):
            return jnp.sum(
                jnp.where(sel, arr[None, :, :], dt.type(0)), axis=1
            )

        chained = v & (bestc > init)                       # [KB, L]
        s = jnp.where(v, jnp.where(chained, bestc, init), NEG)
        stt = jnp.where(chained, extract(r_stt, np.dtype(np.int32)), t)
        stq = jnp.where(chained, extract(r_stq, np.dtype(np.int32)), q)
        n = jnp.where(chained, extract(r_n, np.dtype(np.int32)) + 1, 1)
        sumd = jnp.where(
            chained, extract(r_sumd, np.dtype(np.float32)) + d, d
        )
        scores_ref[pl.ds(i0, KB), :] = s
        stt_ref[pl.ds(i0, KB), :] = stt
        gv = jnp.where(v, g, -2)
        for k in range(KB):                 # cheap [1/RING, L] tail ops
            row = (
                s[k : k + 1], g[k : k + 1], t[k : k + 1], q[k : k + 1],
                stt[k : k + 1], stq[k : k + 1], n[k : k + 1],
                sumd[k : k + 1],
            )
            best = best_update(best, row)
            ring, cur = push(
                ring, cur, v[k : k + 1],
                (row[0], row[2], row[3], gv[k : k + 1], row[4], row[5],
                 row[6], row[7]),
            )
        return ring, cur, best

    cur0 = jnp.zeros((1, LANES), jnp.int32)
    ring, cur, best = jax.lax.fori_loop(
        0, CARRY, carry_row, (ring0, cur0, best0)
    )
    ring, cur, best = jax.lax.fori_loop(
        0, (A - CARRY) // KB, dp_block, (ring, cur, best)
    )

    s1, g1, te1, qe1, stt1, stq1, n1, sumd1 = best

    # second chain: best score among anchors whose chain's target interval
    # [stt, t] does NOT overlap chain 1's [stt1, te1] on the same reference
    # sequence (GeneratePrimaryChains' overlap rule compares ref index only,
    # spatial_index.cc:233-247; interval overlap — not just the endpoint —
    # is what excludes sub/extension chains sharing chain 1's anchors, the
    # device stand-in for traceback's used-anchor score subtraction,
    # spatial_index.cc:165-220).  A third pass then finds chain 3 (the
    # reference keeps up to num_best_chains=3, spatial_index.cc:289):
    # best score among anchors overlapping NEITHER chain 1 NOR chain 2.
    # Primary-chain candidacy gates (score >= min_chaining_score, score >
    # max/2 traceback gate, /3 primary break, spatial_index.cc:230-247,
    # 545-546) are applied by the caller on the returned raw maxima.

    # A = CARRY + n*KB; scan in the largest block size that tiles A evenly
    SB = KB if (CARRY % KB == 0 and A % KB == 0) else 1

    def masked_max_block(blk, acc):
        # running max of scores excluded from chains so far (mask in acc[1:])
        i0 = blk * SB
        s = scores_ref[pl.ds(i0, SB), :]
        g = a_g[pl.ds(i0, SB), :]
        t = a_t[pl.ds(i0, SB), :]
        stt = stt_ref[pl.ds(i0, SB), :]
        excl = ((g >> 1) == (g1 >> 1)) & (
            jnp.maximum(stt, stt1) <= jnp.minimum(t, te1)
        )
        cand = jnp.where(excl, NEG, s)
        return jnp.maximum(acc, jnp.max(cand, axis=0, keepdims=True))

    s2 = jax.lax.fori_loop(
        0, A // SB, masked_max_block, jnp.full((1, LANES), NEG, jnp.float32)
    )

    # locate chain 2's end state (first row matching s2 under the same
    # exclusion mask) to get its interval for the s3 pass
    def find2_block(blk, st2):
        # found2 carried as i32 0/1: Mosaic can't legalize an i1 vector
        # loop carry (same class as the sweep kernel's while-loop note)
        g2, stt2, te2, found2_i = st2
        i0 = blk * SB
        s = scores_ref[pl.ds(i0, SB), :]
        g = a_g[pl.ds(i0, SB), :]
        t = a_t[pl.ds(i0, SB), :]
        stt = stt_ref[pl.ds(i0, SB), :]
        excl = ((g >> 1) == (g1 >> 1)) & (
            jnp.maximum(stt, stt1) <= jnp.minimum(t, te1)
        )
        hit = (~excl) & (s == s2) & (s > NEG * 0.5)
        rio = jax.lax.broadcasted_iota(jnp.int32, (SB, LANES), 0)
        first = jnp.min(jnp.where(hit, rio, SB), axis=0, keepdims=True)
        sel = rio == first
        hv = jnp.any(hit, axis=0, keepdims=True) & (found2_i == 0)

        def pick(arr):
            return jnp.sum(jnp.where(sel, arr, 0), axis=0, keepdims=True)

        return (
            jnp.where(hv, pick(g), g2),
            jnp.where(hv, pick(stt), stt2),
            jnp.where(hv, pick(t), te2),
            jnp.where(hv, 1, found2_i),
        )

    zi = jnp.zeros((1, LANES), jnp.int32)
    g2, stt2, te2, found2_i = jax.lax.fori_loop(
        0, A // SB, find2_block,
        (jnp.full((1, LANES), -1, jnp.int32), zi, zi, zi),
    )
    found2 = found2_i > 0

    def s3_block(blk, acc):
        i0 = blk * SB
        s = scores_ref[pl.ds(i0, SB), :]
        g = a_g[pl.ds(i0, SB), :]
        t = a_t[pl.ds(i0, SB), :]
        stt = stt_ref[pl.ds(i0, SB), :]
        excl1 = ((g >> 1) == (g1 >> 1)) & (
            jnp.maximum(stt, stt1) <= jnp.minimum(t, te1)
        )
        excl2 = found2 & ((g >> 1) == (g2 >> 1)) & (
            jnp.maximum(stt, stt2) <= jnp.minimum(t, te2)
        )
        cand = jnp.where(excl1 | excl2, NEG, s)
        return jnp.maximum(acc, jnp.max(cand, axis=0, keepdims=True))

    s3 = jax.lax.fori_loop(
        0, A // SB, s3_block, jnp.full((1, LANES), NEG, jnp.float32)
    )

    sum_f[pl.ds(0, 1), :] = s1
    sum_f[pl.ds(1, 1), :] = s2
    sum_f[pl.ds(2, 1), :] = sumd1
    sum_f[pl.ds(3, 1), :] = s3
    sum_i[pl.ds(0, 1), :] = g1
    sum_i[pl.ds(1, 1), :] = stt1
    sum_i[pl.ds(2, 1), :] = te1
    sum_i[pl.ds(3, 1), :] = stq1
    sum_i[pl.ds(4, 1), :] = qe1
    sum_i[pl.ds(5, 1), :] = n1
    sum_i[pl.ds(6, 1), :] = jnp.zeros((1, LANES), jnp.int32)
    sum_i[pl.ds(7, 1), :] = jnp.zeros((1, LANES), jnp.int32)

    r_score, r_t, r_q, r_g, r_stt, r_stq, r_n, r_sumd = ring
    o_score[...] = r_score
    o_t[...] = r_t
    o_q[...] = r_q
    o_g[...] = r_g
    o_stt[...] = r_stt
    o_stq[...] = r_stq
    o_n[...] = r_n
    o_sumd[...] = r_sumd


@partial(
    jax.jit,
    static_argnames=("radius", "dim", "ring", "cfg", "interpret", "kb"),
)
def chain_fused(
    a_t: jax.Array,      # [A, B] i32 (rows 0..CARRY-1 are carried anchors)
    a_q: jax.Array,      # [A, B] i32
    a_d: jax.Array,      # [A, B] f32 squared distances
    a_g: jax.Array,      # [A, B] i32 group (ref*2+strand), -1 = invalid
    c_score: jax.Array,  # [CARRY, B] f32 carried chain scores
    c_stt: jax.Array,    # [CARRY, B] i32
    c_stq: jax.Array,    # [CARRY, B] i32
    c_n: jax.Array,      # [CARRY, B] i32
    c_sumd: jax.Array,   # [CARRY, B] f32
    radius: float,
    dim: int = 6,
    ring: int = 64,
    cfg: ChainingConfig = ChainingConfig(),
    interpret: bool = False,
    kb: int = 1,
):
    """Returns (sum_f [8, B] f32, sum_i [8, B] i32, carry-out tuple of 8
    [ring, B] arrays (t, q, g, score, start_t, start_q, n, sumd)).

    sum_f rows: 0 s1, 1 s2 (best non-overlapping), 2 sumd1, 3 s3 (best
    overlapping neither chain 1 nor chain 2).  sum_i rows: 0 g1, 1 t_start,
    2 t_end, 3 q_start, 4 q_end, 5 n1.  s2/s3 are RAW maxima; the caller
    applies the reference's primary-chain candidacy gates
    (min_chaining_score, the traceback score > max/2 gate and the /3
    primary break, spatial_index.cc:230-247,545-546).

    kb: rows processed per DP step.  Anchor rows arrive as K-slot runs per
    seed (same qpos), so kb = K is legal (same-seed rows can't chain onto
    each other) and cuts the kernel's serial depth K-fold; rows within one
    kb-block read the ring as of the block start (see dp_block note)."""
    A, B = a_t.shape
    CARRY = c_score.shape[0]
    if (A - CARRY) % kb:
        raise ValueError(f"anchor rows {A - CARRY} must tile by kb={kb}")
    L = LANES
    # Launch in FIXED-grid chunks of FIXED_G lane-blocks: the grid count is
    # baked into the Mosaic kernel, so without chunking every read-batch
    # size triggers a fresh minutes-long remote kernel compile (the same
    # policy as sweep_search's MAXG chunking).
    FIXED_G = 4
    CHUNK = FIXED_G * L
    Bp = -(-B // CHUNK) * CHUNK
    pad = Bp - B

    def padl(x, fill=0):
        return jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)

    a_t, a_q, a_d = padl(a_t), padl(a_q), padl(a_d)
    a_g = padl(a_g, -1)
    c_score, c_stt, c_stq, c_n, c_sumd = (
        padl(c_score), padl(c_stt), padl(c_stq), padl(c_n), padl(c_sumd)
    )
    G = FIXED_G
    ispec = pl.BlockSpec((A, L), lambda g: (0, g), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((CARRY, L), lambda g: (0, g),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((8, L), lambda g: (0, g), memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((ring, L), lambda g: (0, g),
                         memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(_kernel, A=A, CARRY=CARRY, RING=ring, KB=kb, radius=radius,
                dim=dim, cfg=cfg),
        grid=(G,),
        in_specs=[ispec] * 4 + [cspec] * 5,
        out_specs=[sspec, sspec] + [rspec] * 8,
        out_shape=(
            [jax.ShapeDtypeStruct((8, CHUNK), jnp.float32),
             jax.ShapeDtypeStruct((8, CHUNK), jnp.int32)]
            + [jax.ShapeDtypeStruct((ring, CHUNK), jnp.int32)] * 3
            + [jax.ShapeDtypeStruct((ring, CHUNK), jnp.float32)]
            + [jax.ShapeDtypeStruct((ring, CHUNK), jnp.int32)] * 3
            + [jax.ShapeDtypeStruct((ring, CHUNK), jnp.float32)]
        ),
        scratch_shapes=[pltpu.VMEM((A, L), jnp.float32),
                        pltpu.VMEM((A, L), jnp.int32)],
        interpret=interpret,
        # [A, L] anchor blocks are large (A = carry + seeds*K); with grid
        # G > 1 XLA double-buffers them, blowing the default 16 MB scoped
        # VMEM budget — declare the real requirement (v5e VMEM is 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )
    parts = []
    for c0 in range(0, Bp, CHUNK):
        sl = (slice(None), slice(c0, c0 + CHUNK))
        parts.append(call(
            a_t[sl], a_q[sl], a_d[sl], a_g[sl], c_score[sl], c_stt[sl],
            c_stq[sl], c_n[sl], c_sumd[sl],
        ))
    if len(parts) == 1:
        outs = parts[0]
    else:
        outs = [jnp.concatenate([p[i] for p in parts], axis=1)
                for i in range(10)]
    sum_f, sum_i = outs[0][:, :B], outs[1][:, :B]
    carry = tuple(o[:, :B] for o in outs[2:])
    return sum_f, sum_i, carry


def chain_fused_ref(a_t, a_q, a_d, a_g, c_score, c_stt, c_stq, c_n, c_sumd,
                    radius, dim=6, ring=64, cfg=ChainingConfig(), kb=1):
    """Numpy executable twin of the kernel (per-read serial), for tests."""
    A, B = a_t.shape
    CARRY = c_score.shape[0]
    sum_f = np.zeros((8, B), np.float32)
    sum_i = np.zeros((8, B), np.int32)
    co = [np.zeros((ring, B), dt) for dt in
          (np.int32, np.int32, np.int32, np.float32, np.int32, np.int32,
           np.int32, np.float32)]  # t q g score stt stq n sumd
    co[2][:] = -2
    co[3][:] = NEG
    co[0][:] = -(1 << 30)
    for b in range(B):
        states = []   # (score, t, q, g, stt, stq, n, sumd) per row
        for i in range(A):
            t, q, d, g = a_t[i, b], a_q[i, b], a_d[i, b], a_g[i, b]
            if g < 0:
                states.append(None)
                continue
            if i < CARRY:
                states.append((float(c_score[i, b]), t, q, g,
                               c_stt[i, b], c_stq[i, b], c_n[i, b],
                               float(c_sumd[i, b])))
                continue
            coef = 1.0 - 0.2 * float(d) / radius
            init = coef * dim
            # predecessors = ring state at this row's kb-block start (rows
            # within one block share a seed/qpos and can't chain anyway)
            bs = CARRY + ((i - CARRY) // kb) * kb
            prev = [s for s in states[:bs] if s is not None][-ring:]
            best, besti = NEG, -1
            for s in prev:
                ps, pt, pq, pg = s[0], s[1], s[2], s[3]
                tdiff, qdiff = int(t) - int(pt), int(q) - int(pq)
                if pg != g or tdiff <= 0 or qdiff <= 0:
                    continue
                if pt + cfg.max_target_gap_length < t:
                    continue
                gap = abs(tdiff - qdiff)
                gs = qdiff / tdiff
                if (gap >= cfg.max_gap_length or gs >= cfg.max_gap_scale
                        or gs <= cfg.min_gap_scale):
                    continue
                cand = ps + min(tdiff, qdiff, dim) * coef
                if cand > best:
                    best, besti = cand, s
            if besti != -1 and best > init:
                states.append((np.float32(best), t, q, g, besti[4], besti[5],
                               besti[6] + 1, besti[7] + float(d)))
            else:
                states.append((np.float32(init), t, q, g, t, q, 1, float(d)))
        live = [s for s in states if s is not None]
        if live:
            bi = int(np.argmax([s[0] for s in live]))
            s1, t1, q1, g1, stt, stq, n1, sumd = live[bi]
            sum_f[0, b], sum_f[2, b] = s1, sumd
            sum_i[:6, b] = (g1, stt, t1, stq, q1, n1)
            s2 = NEG
            for s in live:
                if (s[3] // 2 == g1 // 2
                        and max(s[4], stt) <= min(s[1], t1)):
                    continue
                s2 = max(s2, s[0])
            sum_f[1, b] = s2
            # chain 2 = FIRST state (row order) achieving s2 under the
            # chain-1 exclusion mask; chain 3 = best state overlapping
            # neither (kernel's find2/s3 passes)
            c2 = None
            if s2 > NEG * 0.5:
                for s in live:
                    if (s[3] // 2 == g1 // 2
                            and max(s[4], stt) <= min(s[1], t1)):
                        continue
                    if s[0] == s2:
                        c2 = s
                        break
            s3 = NEG
            for s in live:
                if (s[3] // 2 == g1 // 2
                        and max(s[4], stt) <= min(s[1], t1)):
                    continue
                if c2 is not None and (
                    s[3] // 2 == c2[3] // 2
                    and max(s[4], c2[4]) <= min(s[1], c2[1])
                ):
                    continue
                s3 = max(s3, s[0])
            sum_f[3, b] = s3
        else:
            sum_f[0, b] = NEG
            sum_f[1, b] = NEG
            sum_f[3, b] = NEG
            sum_i[0, b] = -1
        tail = live[-ring:]
        for k, s in enumerate(tail):
            slot = (len(live) - len(tail) + k) % ring
            co[3][slot, b] = s[0]
            co[0][slot, b] = s[1]
            co[1][slot, b] = s[2]
            co[2][slot, b] = s[3]
            co[4][slot, b] = s[4]
            co[5][slot, b] = s[5]
            co[6][slot, b] = s[6]
            co[7][slot, b] = s[7]
    return sum_f, sum_i, tuple(co)

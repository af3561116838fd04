"""Pallas TPU kernel: fused range-walk radius search.

The XLA path (mapping/seeding.py search_tile) expands candidate ranges
into a slot space and row-gathers 16-byte rows — XLA's gather runs ~100x
below HBM bandwidth on TPU.  This kernel instead walks each seed's
candidate ranges directly:

* the index windows live as a sublane-transposed [8, Nw] f32 array, so a
  candidate range is a contiguous [8, len] block — one strided DMA
  (aligned down to 128 lanes: Mosaic requires provably aligned lane
  slicing; the true interval is enforced by masking);
* probe ranges are merged over the last bucketed dim (3 adjacent cells =
  adjacent radix keys = one contiguous span), cutting DMA count 3x;
* range r+1's DMA is started before waiting on range r's (latency hiding);
* distances reduce over the 8 sublanes on the VPU ([8, SUB] block vs the
  seed's [8, 1] query);
* matches (dist^2 < radius, strict — nanoflann parity) are extracted with
  an iterated first-set-bit loop into a 128-lane register accumulator,
  flushed to the per-seed output row in 128-aligned blocks (dynamic
  lane-offset stores are rejected by Mosaic).

Per-program SMEM range tables: program g handles SEEDS_PER_PROG seeds x R
ranges.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 2048          # candidate columns per DMA chunk
SEEDS_PER_PROG = 8
BLK = 128           # match-accumulator flush block


def _kernel(
    starts_ref, lens_ref,        # [S, R] i32 SMEM blocks (per program)
    queries_ref,                 # [S, 8] f32 VMEM
    wt_ref,                      # [8, Nw] f32 ANY (HBM)
    out_idx_ref,                 # [S, M] i32
    out_dist_ref,                # [S, M] f32
    out_cnt_ref,                 # [S, 1] i32
    buf, sem,                    # scratch: [3, 8, SUB] f32, DMA sems [3]
    *, radius, R, M,
):
    S = SEEDS_PER_PROG
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, SUB), 1)
    blk_iota = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)

    def dma(slot, start):
        return pltpu.make_async_copy(
            wt_ref.at[:, pl.ds(start, SUB)], buf.at[slot], sem.at[slot],
        )

    def seed_loop(s, _):
        def aligned(r):
            st = starts_ref[s, r]
            a = (st // BLK) * BLK
            return pl.multiple_of(a, BLK), st, lens_ref[s, r]

        def start_first(r, slot):
            @pl.when(lens_ref[s, r] > 0)
            def _():
                a, _, _ = aligned(r)
                dma(slot, a).start()

        start_first(0, 0)
        q = queries_ref[s, :].reshape(8, 1)

        def flush(c2, acc_idx, acc_dist):
            """Store the full accumulator block ending at slot c2."""
            base = pl.multiple_of(((c2 // BLK) * BLK), BLK)

            @pl.when(base < M)
            def _():
                out_idx_ref[s, pl.ds(base, BLK)] = acc_idx[0, :]
                out_dist_ref[s, pl.ds(base, BLK)] = acc_dist[0, :]

        def process(slot_idx, base, start, length, carry):
            c, acc_idx, acc_dist = carry
            block = buf[slot_idx]
            diff = block - q
            dist = jnp.sum(diff * diff, axis=0, keepdims=True)
            gcol = base + col_iota
            valid_i = (
                (gcol >= start) & (gcol < start + length) & (dist < radius)
            ).astype(jnp.int32)
            n = jnp.sum(valid_i)

            def extract(_, ec):
                vmask_i, c2, a_idx, a_dist = ec
                pos = jnp.min(jnp.where(vmask_i > 0, col_iota, SUB))
                d_val = jnp.sum(jnp.where(col_iota == pos, dist, 0.0))
                idx_val = base + pos
                lane = c2 % BLK
                a_idx = jnp.where(blk_iota == lane, idx_val, a_idx)
                a_dist = jnp.where(blk_iota == lane, d_val, a_dist)

                @pl.when(lane == BLK - 1)
                def _():
                    flush(c2, a_idx, a_dist)

                return (
                    jnp.where(col_iota == pos, 0, vmask_i), c2 + 1,
                    a_idx, a_dist,
                )

            _, c, acc_idx, acc_dist = jax.lax.fori_loop(
                0, n, extract, (valid_i, c, acc_idx, acc_dist)
            )
            return c, acc_idx, acc_dist

        def range_loop(r, carry):
            abase, start, length = aligned(r)
            slot = jax.lax.rem(r, 2)

            @pl.when(r + 1 < R)
            def _():
                start_first(r + 1, 1 - slot)

            def with_data(carry):
                dma(slot, abase).wait()
                carry = process(slot, abase, start, length, carry)

                def chunk_loop(state):
                    off, cc = state
                    a2 = pl.multiple_of(abase + off, BLK)
                    cp = dma(2, a2)
                    cp.start()
                    cp.wait()
                    cc = process(2, abase + off, start, length, cc)
                    return off + SUB, cc

                def cond(state):
                    off, _ = state
                    return abase + off < start + length

                _, carry = jax.lax.while_loop(
                    cond, chunk_loop, (np.int32(SUB), carry)
                )
                return carry

            return jax.lax.cond(length > 0, with_data, lambda c: c, carry)

        carry0 = (
            np.int32(0),
            jnp.zeros((1, BLK), jnp.int32),
            jnp.zeros((1, BLK), jnp.float32),
        )
        cnt, acc_idx, acc_dist = jax.lax.fori_loop(0, R, range_loop, carry0)
        # final partial-block flush (lanes beyond cnt%BLK are stale; the
        # wrapper masks by cnt)
        flush(cnt, acc_idx, acc_dist)
        # raw count ([1]-vector store: scalar VMEM stores are rejected)
        out_cnt_ref[s, pl.ds(0, 1)] = jnp.full((1,), cnt, jnp.int32)
        return 0

    # python-unrolled: a static sublane index is required for the flush
    # stores (dynamic sublane + dynamic lane slice is unsupported)
    for s in range(S):
        seed_loop(s, 0)


@partial(jax.jit, static_argnames=("R", "M", "radius", "interpret"))
def range_search_pallas(
    starts: jax.Array,    # [Q, R] i32 (Q multiple of SEEDS_PER_PROG)
    lens: jax.Array,      # [Q, R] i32
    queries: jax.Array,   # [Q, 8] f32
    wt: jax.Array,        # [8, Nw+pad] f32 (>= SUB trailing pad columns)
    radius: float,
    R: int,
    M: int = 1024,
    interpret: bool = False,
):
    """Returns (match_idx [Q, M] i32 into sorted windows, match_dist
    [Q, M] f32, counts [Q])."""
    Q = starts.shape[0]
    S = SEEDS_PER_PROG
    G = Q // S
    out_idx, out_dist, out_cnt = pl.pallas_call(
        partial(_kernel, radius=radius, R=R, M=M),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((S, R), lambda g: (g, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, R), lambda g: (g, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, 8), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((S, M), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, M), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, M), jnp.int32),
            jax.ShapeDtypeStruct((Q, M), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, 8, SUB), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, lens, queries, wt)
    return out_idx, out_dist, out_cnt[:, 0]

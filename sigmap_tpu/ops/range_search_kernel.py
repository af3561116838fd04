"""Pallas TPU kernel: fused range-walk radius search.

The XLA path (mapping/seeding.py search_tile) expands candidate ranges
into a slot space and row-gathers 16-byte rows — XLA's gather runs ~100x
below HBM bandwidth on TPU.  This kernel instead walks each seed's
candidate ranges directly:

* the index windows live as a sublane-transposed [8, Nw] f32 array, so a
  candidate range is a contiguous [8, len] block — one strided DMA;
* probe ranges are merged over the last bucketed dim (3 adjacent cells =
  adjacent radix keys = one contiguous span), cutting DMA count 3x;
* distances reduce over the 8 sublanes on the VPU ([8, SUB] block vs the
  seed's [8, 1] query);
* matches (dist^2 < radius, strict — nanoflann parity) are extracted
  in-kernel with an iterated first-set-bit loop (matches are sparse) and
  written to per-seed output slots, so only real matches ever leave the
  kernel.

Per-program SMEM range tables: program g handles
SEEDS_PER_PROG seeds x R ranges.
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
BIG = 2.0**30


def _kernel(
    starts_ref, lens_ref,        # [S, R] i32 SMEM blocks (per program)
    queries_ref,                 # [S, 8] f32 VMEM
    wt_ref,                      # [8, Nw] f32 ANY (HBM)
    out_idx_ref,                 # [S, M] i32
    out_dist_ref,                # [S, M] f32
    out_cnt_ref,                 # [S, 1] i32
    buf, sem,                    # scratch: [2, 8, SUB] f32, DMA sems [2]
    *, radius, R, M, n_windows,
):
    S = SEEDS_PER_PROG

    def dma(slot, start, width):
        return pltpu.make_async_copy(
            wt_ref.at[:, pl.ds(start, SUB)],
            buf.at[slot],
            sem.at[slot],
        )

    # flatten (seed, range, chunk) walking with double buffering
    # precompute chunk list length: dynamic; walk with a while loop over
    # (seed, range, offset) triple encoded in carry.
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, SUB), 1)

    def seed_loop(s, _):
        # Software pipeline over ranges: range r+1's first chunk DMA is
        # started (slot r+1 & 1) before waiting on range r's (slot r & 1),
        # hiding DMA latency behind the distance/extract work.  Ranges
        # longer than SUB continue serially in slot 2 (rare).
        # wt must be padded with >= SUB trailing columns so the fixed-width
        # DMA never runs past the array (see wrapper).
        def start_first(r, slot):
            @pl.when(lens_ref[s, r] > 0)
            def _():
                dma(slot, starts_ref[s, r], SUB).start()

        start_first(0, 0)

        def range_loop(r, cnt):
            start = starts_ref[s, r]
            length = lens_ref[s, r]
            slot = jax.lax.rem(r, 2)

            @pl.when(r + 1 < R)
            def _():
                start_first(r + 1, 1 - slot)

            def with_data(cnt):
                dma(slot, start, SUB).wait()
                width0 = jnp.minimum(length, SUB)
                buf_view = buf  # slot selected inside process via index

                def process(slot_idx, st, off, width, c):
                    q = queries_ref[s, :].reshape(8, 1)
                    block = buf[slot_idx]
                    diff = block - q
                    dist = jnp.sum(diff * diff, axis=0, keepdims=True)
                    valid_i = (
                        (col_iota < width) & (dist < radius)
                    ).astype(jnp.int32)
                    n = jnp.sum(valid_i)

                    def extract(_, carry):
                        vmask_i, c2 = carry
                        pos = jnp.min(
                            jnp.where(vmask_i > 0, col_iota, SUB)
                        )
                        d_val = jnp.sum(
                            jnp.where(col_iota == pos, dist, 0.0)
                        )
                        idx_val = st + off + pos

                        @pl.when(c2 < M)
                        def _():
                            out_idx_ref[s, pl.ds(c2, 1)] = jnp.full(
                                (1,), idx_val, jnp.int32
                            )
                            out_dist_ref[s, pl.ds(c2, 1)] = jnp.full(
                                (1,), d_val
                            )

                        return (
                            jnp.where(col_iota == pos, 0, vmask_i), c2 + 1
                        )

                    _, c = jax.lax.fori_loop(0, n, extract, (valid_i, c))
                    return c

                cnt2 = process(slot, start, 0, width0, cnt)

                # overflow chunks (length > SUB), serial in slot 2
                def chunk_loop(carry):
                    off, c = carry
                    width = jnp.minimum(length - off, SUB)
                    cp = dma(2, start + off, width)
                    cp.start()
                    cp.wait()
                    c = process(2, start, off, width, c)
                    return off + SUB, c

                def cond(carry):
                    off, c = carry
                    return off < length

                _, cnt3 = jax.lax.while_loop(
                    cond, chunk_loop, (jnp.int32(SUB), cnt2)
                )
                return cnt3

            cnt = jax.lax.cond(length > 0, with_data, lambda c: c, cnt)
            return cnt

        cnt = jax.lax.fori_loop(0, R, range_loop, jnp.int32(0))
        out_cnt_ref[s, 0] = cnt  # raw count; wrapper clamps + flags overflow
        return 0

    jax.lax.fori_loop(0, S, seed_loop, 0)


@partial(jax.jit, static_argnames=("R", "M", "radius", "interpret"))
def range_search_pallas(
    starts: jax.Array,    # [Q, R] i32 (Q multiple of SEEDS_PER_PROG)
    lens: jax.Array,      # [Q, R] i32
    queries: jax.Array,   # [Q, 8] f32
    wt: jax.Array,        # [8, Nw] f32
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
    grid_spec = dict(
        grid=(G,),
        in_specs=[
            pl.BlockSpec((S, R), lambda g: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((S, R), lambda g: (g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((S, 8), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((S, M), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, M), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    nw = wt.shape[1]
    out_idx, out_dist, out_cnt = pl.pallas_call(
        partial(
            _kernel, radius=radius, R=R, M=M, n_windows=nw,
        ),
        **grid_spec,
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

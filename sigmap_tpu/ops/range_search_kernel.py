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

Scalar-prefetched range tables index the grid: program g handles
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
SEEDS_PER_PROG = 4
BIG = 2.0**30


def _kernel(
    starts_ref, lens_ref,        # scalar prefetch [G, S, R] i32
    queries_ref,                 # [S, 8] f32 VMEM
    wt_ref,                      # [8, Nw] f32 ANY (HBM)
    out_idx_ref,                 # [S, M] i32
    out_dist_ref,                # [S, M] f32
    out_cnt_ref,                 # [S, 1] i32
    buf, sem,                    # scratch: [2, 8, SUB] f32, DMA sems [2]
    *, radius, R, M, n_windows,
):
    g = pl.program_id(0)
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

    def process_chunk(s, start, off, width, cnt):
        """Distance + extraction for buf[cur] covering cols
        [start+off, start+off+width)."""
        q = queries_ref[s, :].reshape(8, 1)
        block = buf[0]  # filled by caller via wait
        diff = block - q
        dist = jnp.sum(diff * diff, axis=0, keepdims=True)  # [1, SUB]
        # int32 mask: Mosaic rejects carried/select i1 vectors
        valid_i = ((col_iota < width) & (dist < radius)).astype(jnp.int32)
        n = jnp.sum(valid_i)

        def extract(_, carry):
            vmask_i, c = carry
            pos_vec = jnp.where(vmask_i > 0, col_iota, SUB)
            pos = jnp.min(pos_vec)
            d_val = jnp.sum(jnp.where(col_iota == pos, dist, 0.0))
            idx_val = start + off + pos

            @pl.when(c < M)
            def _():
                out_idx_ref[s, pl.ds(c, 1)] = jnp.full(
                    (1,), idx_val, jnp.int32
                )
                out_dist_ref[s, pl.ds(c, 1)] = jnp.full((1,), d_val)

            return jnp.where(col_iota == pos, 0, vmask_i), c + 1

        _, cnt = jax.lax.fori_loop(0, n, extract, (valid_i, cnt))
        return cnt

    def seed_loop(s, _):
        cnt0 = jnp.int32(0)

        def range_loop(r, cnt):
            start = starts_ref[g, s, r]
            length = lens_ref[g, s, r]

            def chunk_loop(carry):
                # wt must be padded with >= SUB trailing columns so the
                # fixed-width DMA never runs past the array (see wrapper)
                off, c = carry
                width = jnp.minimum(length - off, SUB)
                cp = dma(0, start + off, width)
                cp.start()
                cp.wait()
                c = process_chunk(s, start + off, 0, width, c)
                return off + SUB, c

            def cond(carry):
                off, c = carry
                return off < length

            _, cnt = jax.lax.while_loop(cond, chunk_loop, (jnp.int32(0), cnt))
            return cnt

        cnt = jax.lax.fori_loop(0, R, range_loop, cnt0)
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
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((S, 8), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((S, M), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, M), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, SUB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    nw = wt.shape[1]
    out_idx, out_dist, out_cnt = pl.pallas_call(
        partial(
            _kernel, radius=radius, R=R, M=M, n_windows=nw,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Q, M), jnp.int32),
            jax.ShapeDtypeStruct((Q, M), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        starts.reshape(G, S, -1), lens.reshape(G, S, -1),
        queries, wt,
    )
    return out_idx, out_dist, out_cnt[:, 0]

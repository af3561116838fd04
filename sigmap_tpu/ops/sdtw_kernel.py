"""Pallas TPU kernel: batched subsequence DTW (anti-diagonal wavefront).

The two-row recurrence (sigmap.cc:1274-1279) has a sequential dependence
along the query axis; on the anti-diagonal d = i + j every cell depends
only on diagonals d-1 and d-2, so each diagonal is one vector step:

  cur[j] = cost[d-j, j] + min(prev[j], prev[j-1], prev2[j-1])

Layout: queries on sublanes [Q, B], read PAIRS on lanes (all pairs advance
in lockstep).  The target is stored REVERSED so the diagonal's cost slice
tr[T-1-d : T-1-d+Q] is contiguous.  Subsequence semantics: free target
start (boundary column j=-1 is 0 on every diagonal) and free end (min over
the last query column, 1-based end position like the reference).

Throughput: ~(T+Q) diagonal steps of [Q, B] vector work for B pairs -
B*T*Q cell updates in O(T+Q) steps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BIG = 1e30


def _kernel(tr_ref, q_ref, tlen_ref, qlen_ref, best_ref, end_ref,
            *, T, Q, uniform):
    """uniform=True: every pair has t_len == T and q_len == Q (the
    production verification shape), enabling the fast recurrence:

    * last-column extraction is a static row slice (the general path paid
      a [Q, B] masked reduction per diagonal — ~2x the DP's own cost);
    * min(prev, prev2) is combined BEFORE the boundary shift, halving the
      sublane rolls (one roll per diagonal instead of two);
    * the steady phase (Q-1 <= d < T) skips validity masking entirely —
      every row is in range.
    """
    B = LANES
    row = jax.lax.broadcasted_iota(jnp.int32, (Q, B), 0)
    qlen = qlen_ref[0, :][None, :]                  # [1, B]
    tlen = tlen_ref[0, :][None, :]
    q = q_ref[:, :]                                  # [Q, B]
    last_col = qlen - 1                              # per-pair last column

    def shift_down(x, fill):
        # x[j-1] with boundary row = fill (roll+mask: concatenating a
        # [1,B] row with a [Q-1,B] strided slice crashes Mosaic's
        # vector_extract_strided_slice)
        rolled = pltpu.roll(x, shift=1, axis=0)
        fill_arr = jnp.full((Q, B), fill, x.dtype)
        return jnp.where(row == 0, fill_arr, rolled)

    def step_core(d, prev, prev2):
        # cost[j] = |target[d-j] - q[j]| = |tr_ext[Q + T-1-d+j] - q[j]|;
        # tr is padded by Q rows on both ends so the slice start is always
        # in range (pl.ds silently clamps, which would corrupt the
        # first/last Q-1 diagonals)
        off = Q + T - 1 - d
        tslice = tr_ref[pl.ds(off, Q), :]            # [Q, B]
        cost = jnp.abs(tslice - q)
        # subsequence free start: boundary column j-1 = 0 on every
        # diagonal; min(prev, prev2) folded before the single shift
        m = shift_down(jnp.minimum(prev, prev2), 0.0)
        return cost + jnp.minimum(prev, m)

    def body_general(d, state):
        prev, prev2, best, besti = state
        cur = step_core(d, prev, prev2)
        i_idx = d - row                               # target row per lane-row
        valid = (i_idx >= 0) & (i_idx < tlen)
        cur = jnp.where(valid, cur, BIG)
        # track last-column values: row j == qlen-1 per pair
        at_last = row == last_col
        val = jnp.sum(jnp.where(at_last & valid, cur, 0.0), axis=0,
                      keepdims=True)
        seen = jnp.sum((at_last & valid).astype(jnp.int32), axis=0,
                       keepdims=True) > 0
        val = jnp.where(seen, val, BIG)
        i_here = d - (qlen - 1) + 1                  # 1-based end position
        better = val < best
        best = jnp.where(better, val, best)
        besti = jnp.where(better, i_here, besti)
        return (cur, prev, best, besti)

    def body_steady(d, state):
        # uniform + Q-1 <= d < T: all Q rows valid, last column is the
        # static row Q-1
        prev, prev2, best, besti = state
        cur = step_core(d, prev, prev2)
        val = cur[Q - 1 : Q, :]
        i_here = d - (Q - 1) + 1
        better = val < best
        best = jnp.where(better, val, best)
        besti = jnp.where(better, jnp.full((1, B), i_here, jnp.int32),
                          besti)
        return (cur, prev, best, besti)

    # derive inits from data so their Mosaic layouts are concrete (constant
    # inits get replicated layouts and the loop carry fails to relayout)
    init = (
        q * 0.0 + BIG,                        # prev (d-1)
        q * 0.0 + BIG,                        # prev2 (d-2)
        qlen.astype(jnp.float32) * 0.0 + BIG,
        qlen * 0 - 1,
    )
    if uniform and T > Q:
        state = jax.lax.fori_loop(0, Q - 1, body_general, init)
        state = jax.lax.fori_loop(Q - 1, T, body_steady, state)
        state = jax.lax.fori_loop(T, T + Q - 1, body_general, state)
    else:
        state = jax.lax.fori_loop(0, T + Q - 1, body_general, init)
    _, _, best, besti = state
    best_ref[0, :] = best[0, :]
    end_ref[0, :] = besti[0, :]


def sdtw_pallas(
    targets: jax.Array,   # [B, T] f32
    t_len: jax.Array,     # [B] i32
    queries: jax.Array,   # [B, Q] f32
    q_len: jax.Array,     # [B] i32
    interpret: bool = False,
):
    """Batched subsequence DTW; returns (best [B] f32, end_pos [B] i32,
    1-based like the reference).

    Dispatches to a fast uniform-length kernel when every pair fills its
    full [T]/[Q] buffers (the production verification shape)."""
    uniform = bool(
        np.all(np.asarray(t_len) == targets.shape[1])
        and np.all(np.asarray(q_len) == queries.shape[1])
    )
    return _sdtw_jit(targets, t_len, queries, q_len, uniform, interpret)


@partial(jax.jit, static_argnames=("uniform", "interpret"))
def _sdtw_jit(
    targets: jax.Array,
    t_len: jax.Array,
    queries: jax.Array,
    q_len: jax.Array,
    uniform: bool = False,
    interpret: bool = False,
):
    B, T = targets.shape
    Q = queries.shape[1]
    Bp = -(-B // LANES) * LANES
    # tr[k] = target[T-1-k]: the kernel's slice tr[T-1-d+j] is target[d-j];
    # rows with d-j >= t_len (flipped padding) are masked in-kernel.
    # Pad Q rows of BIG on both ends so diagonal slices never clamp.
    rev = jnp.flip(targets, axis=1)
    rev = jnp.concatenate(
        [jnp.full((B, Q), 1e6, jnp.float32), rev,
         jnp.full((B, Q), 1e6, jnp.float32)], axis=1,
    )

    def prep(a, fill):
        return jnp.pad(
            a, ((0, Bp - B),) + ((0, 0),) * (a.ndim - 1),
            constant_values=fill,
        )

    tr = prep(rev, 1e6).T                              # [T + 2Q, Bp]
    q = prep(queries, 0.0).T                           # [Q, Bp]
    tl = prep(t_len, 1)[None, :]
    ql = prep(q_len, 1)[None, :]
    grid = Bp // LANES
    spec = lambda rows: pl.BlockSpec(
        (rows, LANES), lambda g: (0, g), memory_space=pltpu.VMEM
    )
    best, end = pl.pallas_call(
        partial(_kernel, T=T, Q=Q, uniform=uniform),
        grid=(grid,),
        in_specs=[spec(T + 2 * Q), spec(Q), spec(1), spec(1)],
        out_specs=[spec(1), spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ],
        interpret=interpret,
    )(tr, q, tl, ql)
    return best[0, :B], end[0, :B]

"""Pallas TPU kernel: streaming merge-join radius search ("sweep").

The TPU-native replacement for per-seed k-d traversal
(/root/reference/src/spatial_index.cc:366, nanoflann) designed around what
v5e actually does fast: contiguous DMA streams and dense VPU math.
Measured on this chip, XLA row gathers run at ~2.4 GB/s and per-range DMA
walks are latency-bound; the sweep instead:

* sorts the round's seeds by their coarse grid cell key (XLA-side), so a
  block of BLOCK (default 128) consecutive seeds probes a narrow,
  contiguous band of the cell-sorted window array (index/sweep.py);
* per (seed-block, probe offset), streams the UNION of the block's
  candidate ranges as whole pre-tiled [8, TILE] window tiles — large
  contiguous DMAs, double-buffered across the flattened (offset, tile)
  sequence;
* evaluates exact f32 squared distances (direct (w-q)^2 accumulation,
  nanoflann's own formula) for all BLOCK seeds x TILE windows densely on
  the VPU (strict d^2 < radius — nanoflann.hpp:249 parity; the union slop
  only adds evaluations that fail the test, never changes the match set);
* extracts matches with a wave drain keeping the K SMALLEST d^2 per seed
  (replacement against the running K-th-smallest bound, so the
  true-locus match survives truncation), with exact total-match counts
  so K-truncation is observable.

Work model: pair-evaluations are set by the per-block union volume
(roughly invariant in seeds-per-cell density), so bigger read batches
amortize the sweep's fixed costs; the per-pair cost is a handful of VPU
fused multiply-adds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128         # default seeds per block (multiple of 8)
INF = 1.0e30


def _kernel(
    bm_ref,        # [2*NO+1, G] i32 SMEM (scalar prefetch): rows 0..NO-1 =
                   # first tile per offset, rows NO..2*NO = exclusive tile
                   # cumsum (transposed: SMEM lane-pads the last dim to 128)
    seeds_ref,     # [BLOCK, 8] f32 VMEM
    tiles_ref,     # [T, 8, TILE] f32 ANY (HBM)
    meta_ref,      # [T, 8, TILE//8] i32 ANY (HBM)
    out_meta_ref,  # [BLOCK, K] i32
    out_d2_ref,    # [BLOCK, K] f32
    out_cnt_ref,   # [BLOCK, 2] i32 (total matches, written slots)
    wbuf, mbuf, dbuf, wscr, sem, msem,
    *, radius, K, TILE, dim, block, n_offsets, nwave,
):
    g = pl.program_id(0)
    BLOCK = block
    col = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, TILE), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, K), 1)
    # hoist this program's SMEM table row into register scalars (the
    # decode below runs 2x per DMA step)
    starts = [bm_ref[oo, g] for oo in range(n_offsets)]
    cums = [bm_ref[n_offsets + oo, g] for oo in range(n_offsets + 1)]
    total = cums[n_offsets]
    sq = seeds_ref[...]

    out_meta_ref[...] = jnp.zeros((BLOCK, K), jnp.int32)
    # slots internally hold +INF when empty so the replacement bound
    # (max over kept) is correct; cleaned to 0 before the kernel returns
    out_d2_ref[...] = jnp.full((BLOCK, K), INF, jnp.float32)
    wscr[...] = jnp.zeros((BLOCK, 1), jnp.int32)

    def tile_of(s):
        """Flat step -> global tile index (offset decoded via cumsum)."""
        t = starts[0] + s
        for oo in range(1, n_offsets):
            take = cums[oo] <= s
            t = jnp.where(take, starts[oo] + (s - cums[oo]), t)
        return t

    def dma(slot, s):
        t = tile_of(s)
        return (
            pltpu.make_async_copy(tiles_ref.at[t], wbuf.at[slot], sem.at[slot]),
            pltpu.make_async_copy(meta_ref.at[t], mbuf.at[slot], msem.at[slot]),
        )

    @pl.when(total > 0)
    def _():
        for c in dma(0, 0):
            c.start()

    def step(s, cnt):
        slot = jax.lax.rem(s, 2)

        @pl.when(s + 1 < total)
        def _():
            for c in dma(1 - slot, s + 1):
                c.start()

        for c in dma(slot, s):
            c.wait()
        wt = wbuf[slot]                        # [8, TILE]
        mtile = mbuf[slot]                     # [8, TILE//8] i32
        # d^2 = sum_d (w_d - q_d)^2 accumulated DIRECTLY on the VPU in f32
        # (nanoflann's own formula, nanoflann.hpp:375-398) — the earlier
        # MXU expansion |q|^2+|w|^2-2q.w needed a 6-pass f32 matmul to get
        # comparable rounding and measured ~3x slower than these dim
        # fused multiply-adds at production volumes
        acc = jnp.zeros((BLOCK, TILE), jnp.float32)
        for d in range(dim):
            diff = wt[d, :][None, :] - sq[:, d][:, None]
            acc += diff * diff
        match = acc < radius                   # strict: nanoflann parity
        nrow = jnp.sum(match.astype(jnp.int32), axis=1, keepdims=True)
        cnt = cnt + nrow

        rowsz = TILE // 8
        mcol = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, rowsz), 1)

        # CLOSEST-K drain with replacement.  Kept slots are the K smallest
        # d^2 seen so far (ties broken by scan order), matching what a
        # truncating reference user would want from a cap — and, far more
        # importantly, guaranteeing the true-locus match (usually the
        # global minimum of a crowded ball) survives K-truncation (the
        # earlier first-K-in-scan-order drain dropped it whenever K slots
        # filled before its tile, the dominant recall loss at 12 Mb).
        # tau = current K-th smallest bound (radius until slots fill, then
        # max over kept): only candidates BELOW tau enter dbuf, so once
        # slots hold tight matches nearly every later tile skips the
        # drain entirely.  Each wave extracts the 8 row-group minima and
        # inserts them sequentially (append while slots open, else
        # replace the current worst).  NWAVE straight-line waves cover
        # the common case; a residual while-loop finishes deep tiles
        # (while-loop carries a SCALAR: Mosaic can't legalize vector
        # carries here).
        NWAVE = nwave

        def tau():
            full = wscr[...] >= K
            worst = jnp.max(out_d2_ref[...], axis=1, keepdims=True)
            return jnp.where(full, jnp.minimum(worst, radius), radius)

        def wave():
            """One extraction wave, in place: dbuf (masked distances,
            [BLOCK, TILE]; row-group r = lanes [r*rowsz, (r+1)*rowsz))
            and wscr (write cursors) are VMEM scratch mutated directly —
            SSA copies of the 512 KB distance buffer across unrolled
            waves blew the 16 MB scoped-vmem stack."""
            c_wrote = wscr[...]
            mins, pcols, mvals = [], [], []
            for r in range(8):
                row = dbuf[:, r * rowsz:(r + 1) * rowsz]
                mn_r = jnp.min(row, axis=1, keepdims=True)      # [B, 1]
                pcol_r = jnp.min(
                    jnp.where(row == mn_r, mcol, rowsz), axis=1,
                    keepdims=True,
                )
                mval_r = jnp.sum(
                    jnp.where(mcol == pcol_r, mtile[r, :][None, :], 0),
                    axis=1, keepdims=True,
                )
                mins.append(mn_r)
                pcols.append(pcol_r)
                mvals.append(mval_r)
            has = [mins[r] < radius for r in range(8)]
            n_put = jnp.zeros((BLOCK, 1), jnp.int32)
            out_m = out_meta_ref[...]
            out_d = out_d2_ref[...]
            for r in range(8):
                # sequential insert: empty slots are +INF, so `worst` is
                # the replacement bound only once all K slots are real
                worst = jnp.max(out_d, axis=1, keepdims=True)
                wi = jnp.min(
                    jnp.where(out_d == worst, kcol, K), axis=1,
                    keepdims=True,
                )
                notfull = (c_wrote + n_put) < K
                slot = jnp.where(notfull, c_wrote + n_put, wi)
                put = has[r] & (notfull | (mins[r] < worst))
                hit = (kcol == slot) & put
                out_m = jnp.where(hit, mvals[r], out_m)
                out_d = jnp.where(hit, mins[r], out_d)
                n_put = n_put + (put & notfull).astype(jnp.int32)
            out_meta_ref[...] = out_m
            out_d2_ref[...] = out_d
            # retire every extracted row-min
            for r in range(8):
                sl = pl.ds(r * rowsz, rowsz)
                dbuf[:, sl] = jnp.where(
                    (mcol == pcols[r]) & has[r], INF, dbuf[:, sl]
                )
            wscr[...] = c_wrote + n_put

        def dbuf_min():
            rmin = dbuf[:, 0:rowsz]
            for r in range(1, 8):
                rmin = jnp.minimum(rmin, dbuf[:, r * rowsz:(r + 1) * rowsz])
            return jnp.min(rmin, axis=1, keepdims=True)

        def go():
            # candidates still below the current kept-K bound?
            return jnp.any(dbuf_min() < tau())

        def extract(_go):
            wave()
            return go()

        @pl.when(jnp.any(match & (acc < jnp.broadcast_to(tau(), acc.shape))))
        def _():
            dbuf[...] = jnp.where(
                match & (acc < jnp.broadcast_to(tau(), acc.shape)), acc, INF
            )
            for _ in range(NWAVE):
                wave()
            jax.lax.while_loop(lambda g: g, extract, go())

        return cnt

    cnt = jax.lax.fori_loop(
        0, total, step,
        jnp.zeros((BLOCK, 1), jnp.int32),
    )
    # empty slots held +INF internally (replacement bound); return 0
    out_d2_ref[...] = jnp.where(
        kcol < wscr[...], out_d2_ref[...], 0.0
    )
    out_cnt_ref[:, pl.ds(0, 1)] = cnt
    out_cnt_ref[:, pl.ds(1, 1)] = wscr[...]


@partial(jax.jit, static_argnames=("K", "TILE", "radius", "dim",
                                  "block", "interpret", "nwave"))
def sweep_search(
    seeds: jax.Array,      # [Q, 8] f32, Q multiple of BLOCK, cell-key SORTED
    blockmeta: jax.Array,  # [2*NO+1, Q//BLOCK] i32: rows 0..NO-1 first tile
                           # per (block, offset); rows NO..2*NO tile cumsum
    tiles: jax.Array,   # [T, 8, TILE] f32
    meta: jax.Array,    # [T, 8, TILE//8] i32
    radius: float,
    K: int = 16,
    TILE: int = 1024,
    dim: int = 6,
    block: int = BLOCK,
    interpret: bool = False,
    nwave: int = 3,
):
    """Returns (m_meta [Q, K] i32, m_d2 [Q, K] f32, m_cnt [Q, 2] i32).

    m_cnt[:, 0] = exact total matches (the reference's per-seed anchor
    count before its 5000 cap, spatial_index.cc:290); m_cnt[:, 1] = slots
    actually written (== min(total, K))."""
    Q = seeds.shape[0]
    G = Q // block
    n_offsets = (blockmeta.shape[0] - 1) // 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((block, 8), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((block, K), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 2), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, TILE), jnp.float32),
            pltpu.VMEM((2, 8, TILE // 8), jnp.int32),
            pltpu.VMEM((block, TILE), jnp.float32),
            pltpu.VMEM((block, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(_kernel, radius=radius, K=K, TILE=TILE, dim=dim,
                block=block, n_offsets=n_offsets, nwave=nwave),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Q, K), jnp.int32),
            jax.ShapeDtypeStruct((Q, K), jnp.float32),
            jax.ShapeDtypeStruct((Q, 2), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(blockmeta, seeds, tiles, meta)

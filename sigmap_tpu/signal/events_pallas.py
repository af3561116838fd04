"""Pallas TPU kernel for the dual-detector peak state machine.

The peak caller (event.h:117-182) is a sequential scan with ~10 scalars of
state per read.  The XLA lax.scan version (events.py detect_peaks_batch)
pays per-step dispatch overhead over C=4000 steps (~80ms/batch); this
kernel runs the whole scan inside one Pallas program with the state held
in VMEM registers and all reads advancing in lockstep on the VPU lanes
(~sub-ms).  Output format matches detect_peaks_batch exactly: per step,
per read, the emitted peak position + 1 (0 = none) for (short, long).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EventDetectorConfig

FLT_MAX = float(np.float32(3.4028235e38))  # python scalar: no captured consts
LANES = 512   # 4 vregs wide: 4x fewer sequential programs than 128


def _peaks_kernel(t1_ref, t2_ref, len_ref, out_s_ref, out_l_ref, *, cfg, C):
    # NOTE: boolean state is carried as int32 0/1 - Mosaic rejects selects
    # over i1 vectors ("Unsupported target bitwidth for truncation")
    B = LANES
    zero_i = jnp.zeros((1, B), jnp.int32)
    state = dict(
        s_pp=zero_i - 1, s_pv=jnp.full((1, B), FLT_MAX),
        s_valid=zero_i, s_mask=zero_i,
        l_pp=zero_i - 1, l_pv=jnp.full((1, B), FLT_MAX),
        l_valid=zero_i, l_mask=zero_i,
    )
    lengths = len_ref[0, :]

    def det_step(v, i, pp, pv, valid_i, masked, threshold, wl, active):
        act = active & (masked < i)
        in_def = pp == -1
        lower = v < pv
        fire = (~lower) & (v - pv > cfg.peak_height)
        pp1 = jnp.where(fire, i, pp)
        pv1 = jnp.where(lower | fire, v, pv)
        upd = v > pv
        pp2 = jnp.where(upd, i, pp)
        pv2 = jnp.where(upd, v, pv)
        set_valid = (pv2 - v > cfg.peak_height) & (pv2 > threshold)
        valid2_i = jnp.maximum(valid_i, set_valid.astype(jnp.int32))
        emit = (valid2_i > 0) & ((i - pp2) > (wl // 2))
        pp2e = jnp.where(emit, -1, pp2)
        pv2e = jnp.where(emit, v, pv2)
        valid2e_i = jnp.where(emit, 0, valid2_i)
        npp = jnp.where(act, jnp.where(in_def, pp1, pp2e), pp)
        npv = jnp.where(act, jnp.where(in_def, pv1, pv2e), pv)
        nvalid = jnp.where(
            act, jnp.where(in_def, valid_i, valid2e_i), valid_i
        )
        emit_pos = jnp.where(act & (~in_def) & emit, pp2 + 1, 0)
        dominate = act & (~in_def) & (pv2 > threshold)
        return npp, npv, nvalid, emit_pos, dominate, pp2

    def body(i, st):
        v1 = t1_ref[i, :][None, :]
        v2 = t2_ref[i, :][None, :]
        active = (i < lengths)[None, :]
        s_pp, s_pv, s_valid, emit_s, dominate, s_pp2 = det_step(
            v1, i, st["s_pp"], st["s_pv"], st["s_valid"], st["s_mask"],
            np.float32(cfg.threshold1), cfg.window_length1, active,
        )
        l_pp = jnp.where(dominate, -1, st["l_pp"])
        l_pv = jnp.where(dominate, FLT_MAX, st["l_pv"])
        l_valid = jnp.where(dominate, 0, st["l_valid"])
        l_mask = jnp.where(
            dominate, s_pp2 + cfg.window_length1, st["l_mask"]
        )
        l_pp, l_pv, l_valid, emit_l, _, _ = det_step(
            v2, i, l_pp, l_pv, l_valid, l_mask,
            np.float32(cfg.threshold2), cfg.window_length2, active,
        )
        out_s_ref[i, :] = emit_s[0, :]
        out_l_ref[i, :] = emit_l[0, :]
        return dict(
            s_pp=s_pp, s_pv=s_pv, s_valid=s_valid, s_mask=st["s_mask"],
            l_pp=l_pp, l_pv=l_pv, l_valid=l_valid, l_mask=l_mask,
        )

    jax.lax.fori_loop(0, C, body, state)


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def detect_peaks_pallas(
    tstat1: jax.Array, tstat2: jax.Array, lengths: jax.Array,
    cfg: EventDetectorConfig = EventDetectorConfig(),
    interpret: bool = False,
):
    """Batched peak scan -> emissions [B, 2C] (pos+1 | 0), matching
    events.detect_peaks_batch."""
    B, C = tstat1.shape
    Bp = -(-B // LANES) * LANES
    pad = Bp - B
    t1 = jnp.pad(tstat1, ((0, pad), (0, 0))).T  # [C, Bp]
    t2 = jnp.pad(tstat2, ((0, pad), (0, 0))).T
    lens = jnp.pad(lengths, (0, pad))[None, :]
    grid = Bp // LANES
    out_s, out_l = pl.pallas_call(
        partial(_peaks_kernel, cfg=cfg, C=C),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((C, LANES), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, LANES), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, LANES), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, LANES), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, Bp), jnp.int32),
            jax.ShapeDtypeStruct((C, Bp), jnp.int32),
        ],
        interpret=interpret,
        # [C, 512]-lane blocks x (2 in + 2 out), double-buffered across
        # the grid: well past the default 16 MB scoped budget (v5e VMEM
        # is 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(t1, t2, lens)
    # interleave (step, short-then-long) like detect_peaks_batch
    emits = jnp.stack([out_s, out_l], axis=-1)  # [C, Bp, 2]
    return emits.transpose(1, 0, 2).reshape(Bp, 2 * C)[:B]


def _compress_kernel(norm_ref, n_ref, keep_ref, *, delta, E):
    """Delta run-collapse (sigmap.cc:1072-1079): keep j==0 and any value
    whose |diff| from the last KEPT value exceeds delta.  Serial over the
    event axis with all reads on the lanes."""
    B = LANES
    n = n_ref[0, :][None, :]
    last0 = jnp.zeros((1, B), jnp.float32)

    def body(j, last):
        v = norm_ref[j, :][None, :]
        valid = (j < n)
        keep = valid & ((j == 0) | (jnp.abs(v - last) > delta))
        keep_ref[j, :] = keep.astype(jnp.int32)[0, :]
        return jnp.where(keep, v, last)

    jax.lax.fori_loop(0, E, body, last0)


@partial(jax.jit, static_argnames=("delta", "interpret"))
def compress_keep_pallas(
    norm: jax.Array,     # [B, E] f32 z-scored event means
    n: jax.Array,        # [B] i32 event counts
    delta: float,
    interpret: bool = False,
):
    """Keep mask [B, E] i32 for the feature compression scan; replaces the
    lax.scan formulation (whose per-step dispatch cost ~70 us x E)."""
    B, E = norm.shape
    Bp = -(-B // LANES) * LANES
    pad = Bp - B
    nt = jnp.pad(norm, ((0, pad), (0, 0))).T   # [E, Bp]
    nn = jnp.pad(n, (0, pad))[None, :]
    keep = pl.pallas_call(
        partial(_compress_kernel, delta=float(delta), E=E),
        grid=(Bp // LANES,),
        in_specs=[
            pl.BlockSpec((E, LANES), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((E, LANES), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, Bp), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(nt, nn)
    return keep.T[:B]

"""Pallas TPU kernel: banded anchor chaining.

Same recurrence as mapping/chain_device.chain_scores_banded (banded scan,
ring buffer of the last K anchors), but the whole scan runs inside one
Pallas program: anchors stream through VMEM in row blocks and the ring
state lives entirely on-chip, so the per-step cost is VPU work on
[K, 128] tiles instead of an XLA scan step (~2us each).

Layout: anchors transposed to [A, B] with the read batch on lanes
(B <= 128 per program; grid over read tiles).
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
NEG = -1e30


def _kernel(t_ref, q_ref, d_ref, g_ref, v_ref, score_ref, pred_ref,
            *, K, A, radius, dim, cfg: ChainingConfig):
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, LANES), 0)

    def body(i, state):
        r_score, r_t, r_q, r_g, r_pos = state
        t = t_ref[i, :][None, :]
        q = q_ref[i, :][None, :]
        d = d_ref[i, :][None, :]
        g = g_ref[i, :][None, :]
        v = v_ref[i, :][None, :] > 0
        coef = 1.0 - 0.2 * d / radius
        init = coef * dim
        tdiff = t - r_t
        qdiff = q - r_q
        ok = (
            (r_g == g)
            & (tdiff > 0)
            & (qdiff > 0)
            & (r_t + cfg.max_target_gap_length >= t)
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
        match_dim = jnp.minimum(jnp.minimum(tdiff, qdiff), dim) * coef
        cand = jnp.where(ok, r_score + match_dim, NEG)       # [K, LANES]
        best = jnp.max(cand, axis=0, keepdims=True)          # [1, LANES]
        besti = jnp.argmax(cand, axis=0)[None, :]            # [1, LANES]
        bpos = jnp.sum(
            jnp.where(iota_k == besti, r_pos, 0), axis=0, keepdims=True
        )
        better = v & (best > init)
        score = jnp.where(better, best, jnp.where(v, init, NEG))
        pred = jnp.where(better, bpos, i)
        score_ref[i, :] = score[0, :]
        pred_ref[i, :] = pred[0, :]
        # ring update at slot i % K
        slot = jax.lax.rem(i, K)
        hit = iota_k == slot
        r_score = jnp.where(hit, jnp.where(v, score, NEG), r_score)
        r_t = jnp.where(hit, t, r_t)
        r_q = jnp.where(hit, q, r_q)
        r_g = jnp.where(hit, jnp.where(v, g, -2), r_g)
        r_pos = jnp.where(hit, i, r_pos)
        return (r_score, r_t, r_q, r_g, r_pos)

    init_state = (
        jnp.full((K, LANES), NEG, jnp.float32),
        jnp.full((K, LANES), -(1 << 30), jnp.int32),
        jnp.zeros((K, LANES), jnp.int32),
        jnp.full((K, LANES), -2, jnp.int32),
        jnp.zeros((K, LANES), jnp.int32),
    )
    jax.lax.fori_loop(0, A, body, init_state)


@partial(
    jax.jit, static_argnames=("search_radius", "cfg", "dim", "interpret")
)
def chain_scores_banded_pallas(
    target: jax.Array,   # [B, A] i32
    query: jax.Array,    # [B, A] i32
    dist: jax.Array,     # [B, A] f32
    group: jax.Array,    # [B, A] i32
    valid: jax.Array,    # [B, A] bool
    search_radius: float,
    dim: int = 6,
    cfg: ChainingConfig = ChainingConfig(),
    interpret: bool = False,
):
    """Drop-in for chain_device.chain_scores_banded."""
    B, A = target.shape
    Bp = -(-B // LANES) * LANES
    K = cfg.device_band

    def prep(a, fill):
        return jnp.pad(a, ((0, Bp - B), (0, 0)), constant_values=fill).T

    t = prep(target, 0)
    q = prep(query, 0)
    d = prep(dist, 0.0)
    g = prep(group, -1)
    v = prep(valid.astype(jnp.int32), 0)
    grid = Bp // LANES
    spec = lambda: pl.BlockSpec((A, LANES), lambda gg: (0, gg),
                                memory_space=pltpu.VMEM)
    scores, preds = pl.pallas_call(
        partial(
            _kernel, K=K, A=A, radius=float(search_radius), dim=dim, cfg=cfg
        ),
        grid=(grid,),
        in_specs=[spec() for _ in range(5)],
        out_specs=[spec(), spec()],
        out_shape=[
            jax.ShapeDtypeStruct((A, Bp), jnp.float32),
            jax.ShapeDtypeStruct((A, Bp), jnp.int32),
        ],
        interpret=interpret,
    )(t, q, d, g, v)
    return scores.T[:B], preds.T[:B]

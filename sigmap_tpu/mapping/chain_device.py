"""Device (JAX) banded chaining: the all-TPU scoring path.

The exact reference DP (spatial_index.cc:418-550) scans up to 5000
predecessors with data-dependent skip/break rules - inherently sequential
and host-friendly (mapping/chain.py + native).  For the device path the DP
is reformulated as a banded scan: anchors sorted by (group, target, query)
advance one at a time (lax.scan), each step scoring against a ring buffer
of the previous K anchors, vectorized over the read batch.

Approximations vs the reference (documented divergence, exactness lives in
the host chainer):
* band K (default 64) instead of 5000 - beyond-band predecessors are
  ignored (rarely selected by the reference: its skip cap of 25 usually
  terminates the scan within a few dozen candidates);
* the skip-cap early break is not modeled (it only prunes, and only
  *within* the band; omitting it can only find equal-or-better
  predecessors).

Gap gates, scores, and group separation match the reference exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ChainingConfig

NEG = np.float32(-1e30)


@partial(jax.jit, static_argnames=("cfg", "dim"))
def chain_scores_banded(
    target: jax.Array,   # [B, A] i32 sorted by (group, target, query)
    query: jax.Array,    # [B, A] i32
    dist: jax.Array,     # [B, A] f32
    group: jax.Array,    # [B, A] i32 (ref*2+strand; -1 for padding)
    valid: jax.Array,    # [B, A] bool
    search_radius: float,
    dim: int = 6,
    cfg: ChainingConfig = ChainingConfig(),
):
    """Returns (scores [B, A] f32, pred [B, A] i32 absolute predecessor
    index, self when none)."""
    B, A = target.shape
    K = cfg.device_band

    def step(carry, xs):
        # ring buffers of the last K anchors
        r_score, r_target, r_query, r_group, r_pos = carry
        t, q, d, g, v, i = xs
        coef = 1.0 - 0.2 * d / search_radius
        init = coef * dim
        tdiff = t[:, None] - r_target            # [B, K]
        qdiff = q[:, None] - r_query
        ok = (
            (r_group == g[:, None])
            & (tdiff > 0)
            & (qdiff > 0)
            & (r_target + cfg.max_target_gap_length >= t[:, None])
        )
        gap = jnp.abs(tdiff - qdiff)
        gap_scale = jnp.where(
            tdiff > 0, qdiff.astype(jnp.float32) / tdiff, 1.0
        )
        ok &= (
            (gap < cfg.max_gap_length)
            & (gap_scale < cfg.max_gap_scale)
            & (gap_scale > cfg.min_gap_scale)
        )
        match_dim = (
            jnp.minimum(jnp.minimum(tdiff, qdiff), dim) * coef[:, None]
        )
        cand = jnp.where(ok, r_score + match_dim, NEG)
        best = jnp.max(cand, axis=1)
        besti = jnp.argmax(cand, axis=1)
        score = jnp.where(v & (best > init), best, jnp.where(v, init, NEG))
        pred = jnp.where(
            v & (best > init), r_pos[jnp.arange(B), besti], i
        )
        # rotate ring: overwrite slot i % K
        slot = i % K
        r_score = r_score.at[:, slot].set(jnp.where(v, score, NEG))
        r_target = r_target.at[:, slot].set(t)
        r_query = r_query.at[:, slot].set(q)
        r_group = r_group.at[:, slot].set(jnp.where(v, g, -2))
        r_pos = r_pos.at[:, slot].set(i)
        return (r_score, r_target, r_query, r_group, r_pos), (score, pred)

    carry0 = (
        jnp.full((B, K), NEG),
        jnp.full((B, K), -(1 << 30), jnp.int32),
        jnp.zeros((B, K), jnp.int32),
        jnp.full((B, K), -2, jnp.int32),
        jnp.zeros((B, K), jnp.int32),
    )
    xs = (
        target.T, query.T, dist.T, group.T, valid.T,
        jnp.arange(A, dtype=jnp.int32),
    )
    _, (scores, preds) = jax.lax.scan(step, carry0, xs)
    return scores.T, preds.T


def best_chain_summary(scores: jax.Array, valid: jax.Array):
    """Per-read best/second-best end-anchor scores (device-side decision
    support for early-stop heuristics)."""
    s = jnp.where(valid, scores, NEG)
    best = jnp.max(s, axis=1)
    best_i = jnp.argmax(s, axis=1)
    s2 = s.at[jnp.arange(s.shape[0]), best_i].set(NEG)
    second = jnp.max(s2, axis=1)
    return best, best_i, second

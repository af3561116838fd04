"""XLA-side preparation for the sweep search kernel.

Per round: sort seeds by cell key (block locality), compute per
(seed-block, offset) union tile ranges from the dense cumulative cell
table, run ops/sweep_kernel.sweep_search, and map results back to the
original seed order.  Replaces the round-1 hash-probe/range-walk engines
(mapping/seeding.py) on the turbo path.

Semantics: identical match set to the reference k-d radius search
(strict d^2 < radius, spatial_index.cc:366 + nanoflann.hpp:249), with
per-seed output truncated to K slots (the reference caps at 5000/seed,
spatial_index.cc:290); exact totals are returned so truncation is
observable.  One caveat: d^2 is evaluated via the expansion
|q|^2 + |w|^2 - 2 q.w in f32 (MXU-friendly), while nanoflann accumulates
(q-w)^2 directly — pairs within ~1e-4 of the radius boundary can flip
between the two roundings, so the match SET is exact only up to that
boundary band (tests use a 5e-4 distance tolerance accordingly).
"""

from __future__ import annotations

from functools import partial
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from ..index.sweep import SWEEP_OFFSET, SWEEP_RADIX, bucket_dims
from ..ops.sweep_kernel import BLOCK, sweep_search

BIG = np.int32(2**31 - 1)
# Padded/invalid seeds: dims < index.dim set to SEED_PAD (|q|^2 dominates
# every d^2 so they never match, and they sort to the trailing edge cell);
# dims >= index.dim MUST stay zero (row `dim` of the tiles is |w|^2).
SEED_PAD = 2.0e9


def seed_cell_bounds(seeds: jax.Array, radius: float, bd: int):
    """[Q, 8] seeds -> per-offset (key_lo, key_hi) [Q, 2^(bd-1)] i32 each.

    Offsets enumerate the leading bd-1 bucketed dims (the L2 ball spans
    <= 2 cells per dim); the last bucketed dim's cell span is folded into
    each offset's contiguous key range."""
    delta = np.float32(np.sqrt(radius))
    w = np.float32(2.0 * np.sqrt(radius))
    R = SWEEP_RADIX
    qb = seeds[:, :bd]
    lo = jnp.clip(
        jnp.floor((qb - delta) / w).astype(jnp.int32) + SWEEP_OFFSET,
        0, R - 1,
    )
    hi = jnp.clip(
        jnp.floor((qb + delta) / w).astype(jnp.int32) + SWEEP_OFFSET,
        0, R - 1,
    )
    klos, khis = [], []
    for offs in itertools.product((0, 1), repeat=bd - 1):
        cs = [lo[:, d] + offs[d] for d in range(bd - 1)]
        ok = cs[0] <= hi[:, 0]
        for d in range(1, bd - 1):
            ok &= cs[d] <= hi[:, d]
        key_lo = cs[0]
        for d in range(1, bd - 1):
            key_lo = key_lo * R + cs[d]
        key_lo = key_lo * R + lo[:, bd - 1]
        key_hi = key_lo + (hi[:, bd - 1] - lo[:, bd - 1])
        klos.append(jnp.where(ok, key_lo, BIG))
        khis.append(jnp.where(ok, key_hi, -1))
    return jnp.stack(klos, axis=1), jnp.stack(khis, axis=1)


@partial(jax.jit, static_argnames=("K", "TILE", "radius", "dim",
                                  "block", "interpret", "mxu_precision"))
def sweep_round(
    seeds: jax.Array,     # [Q, 8] f32 (invalid/padded seeds = SEED_PAD)
    cum: jax.Array,       # [R^4 + 1] i32 dense cumulative cell table
    tiles: jax.Array,     # [T, 8, TILE] f32
    meta: jax.Array,      # [T, 8, TILE//8] i32
    radius: float,
    K: int = 16,
    TILE: int = 1024,
    dim: int = 6,
    block: int = BLOCK,
    interpret: bool = False,
    mxu_precision: str = "highest",
):
    """Full radius search for one round's seeds, in ORIGINAL seed order.

    Returns (m_meta [Q, K] i32, m_d2 [Q, K] f32, cnt [Q] i32 exact totals,
    wrote [Q] i32 slots filled)."""
    Q0 = seeds.shape[0]
    if Q0 % block:
        pad = block - Q0 % block
        prow = jnp.where(jnp.arange(8) < dim, np.float32(SEED_PAD), 0.0)
        seeds = jnp.concatenate(
            [seeds, jnp.broadcast_to(prow, (pad, 8))], axis=0
        )
    Q = seeds.shape[0]
    R = SWEEP_RADIX
    bd = bucket_dims(dim)
    NO = 1 << (bd - 1)  # probe offsets
    w = np.float32(2.0 * np.sqrt(radius))
    delta = np.float32(np.sqrt(radius))
    # Sort seeds by the LO-CORNER cell key (cell of q - delta), not the
    # nominal cell: every probe offset is then a CONSTANT key shift across
    # a block, so block unions stay as tight as the block's own key span.
    # (Sorting by nominal key mixes seeds whose lo differs by +-1 in a
    # leading dim, and one such straddle widens the union by a whole radix
    # plane — measured 30x more tile visits.)
    qc = jnp.clip(
        jnp.floor((seeds[:, :bd] - delta) / w).astype(jnp.int32)
        + SWEEP_OFFSET,
        0, R - 1,
    )
    skey = qc[:, 0]
    for d in range(1, bd):
        skey = skey * R + qc[:, d]
    _, perm = jax.lax.sort(
        (skey, jnp.arange(Q, dtype=jnp.int32)), num_keys=1
    )
    seeds_s = jnp.take(seeds, perm, axis=0)
    iperm = jnp.zeros((Q,), jnp.int32).at[perm].set(
        jnp.arange(Q, dtype=jnp.int32)
    )
    klo, khi = seed_cell_bounds(seeds_s, radius, bd)  # [Q, NO]
    G = Q // block
    bmin = klo.reshape(G, block, NO).min(axis=1)      # [G, NO]
    bmax = khi.reshape(G, block, NO).max(axis=1)
    CS = cum.shape[0] - 1
    start = cum[jnp.clip(bmin, 0, CS)]
    end = cum[jnp.clip(bmax + 1, 0, CS)]
    empty = (bmax < bmin) | (end <= start)
    nt = tiles.shape[0]
    t0 = jnp.where(empty, nt, start // TILE)             # empty sorts last
    t1 = jnp.where(empty, nt, -(-end // TILE))
    # offsets' unions can overlap at tile granularity (adjacent cell shifts
    # are smaller than a block's key span); merge into DISJOINT intervals so
    # every window is evaluated exactly once per block — the probe box
    # contains the L2 ball, so d^2 < radius alone then gives exact,
    # duplicate-free match sets.
    t0s, t1s = jax.lax.sort((t0, t1), dimension=1, num_keys=1)
    emax = jax.lax.associative_scan(jnp.maximum, t1s, axis=1)
    prev_end = jnp.concatenate(
        [jnp.zeros((G, 1), jnp.int32), emax[:, :-1]], axis=1
    )
    m_start = jnp.maximum(t0s, prev_end)
    tcnt = jnp.clip(t1s - m_start, 0)
    m_start = jnp.clip(m_start, 0, max(nt - 1, 0))
    cums = jnp.concatenate(
        [jnp.zeros((G, 1), jnp.int32),
         jnp.cumsum(tcnt, axis=1).astype(jnp.int32)], axis=1,
    )  # [G, NO+1]
    blockmeta = jnp.concatenate(
        [m_start.astype(jnp.int32), cums], axis=1
    ).T  # [2*NO+1, G]
    m_meta, m_d2, m_cnt = sweep_search(
        seeds_s, blockmeta, tiles, meta,
        radius=radius, K=K, TILE=TILE, dim=dim, block=block,
        interpret=interpret, mxu_precision=mxu_precision,
    )
    iperm = iperm[:Q0]
    return (
        jnp.take(m_meta, iperm, axis=0),
        jnp.take(m_d2, iperm, axis=0),
        jnp.take(m_cnt[:, 0], iperm),
        jnp.take(m_cnt[:, 1], iperm),
    )


def brute_matches(seeds: np.ndarray, windows: np.ndarray, radius: float):
    """Test oracle: exact per-seed match sets {window} with d^2 < radius."""
    out = []
    for q in seeds:
        d2 = ((windows - q[None, :]) ** 2).sum(axis=1)
        out.append(set(np.nonzero(d2 < radius)[0].tolist()))
    return out

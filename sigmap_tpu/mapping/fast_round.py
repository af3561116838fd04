"""Fully on-device streaming round (fast mode).

One jitted function advances a whole read wavefront by one chunk:
events -> seed selection -> radius search -> anchor assembly -> per-read
sort -> banded chaining -> best-chain traceback -> per-read summaries.
Only O(100 B)/read leaves the device per round, which matters both for the
axon tunnel (~30 MB/s) and for real deployments (anchors routinely reach
tens of MB per round).

Carried chain state (the reference's anchor accumulation across chunks,
spatial_index.cc:302-322) stays on device between rounds as padded per-read
anchor rows.

Fast-mode semantics vs the exact path (mapping/driver.py + chain.py),
documented divergences:
* chaining uses the banded device scan (chain_device.py): band K instead
  of 5000, no skip-cap early break;
* "chains" are approximated by the best and the best non-overlapping,
  non-member end anchors (the reference's primary-chain selection
  restricted to two chains); the mean-score stop rule degenerates (it
  needs >= 5 diluted chains to fire in the reference and almost never
  does);
* anchors carried forward are the members of those two chains.

Positions/strand/scores of confident mappings agree with the exact path
in practice; exactness tests run against the exact path instead.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ChainingConfig, EventDetectorConfig
from .chain_device import chain_scores_banded
from .seeding import DeviceIndex, search_flat_kernel
from ..signal.events import batch_generate_events

NEG = np.float32(-1e30)


@partial(
    jax.jit,
    static_argnames=(
        "step", "s_max", "a_cap", "carry_cap", "m_per_seed", "trace_max",
        "dim", "ed_cfg", "chain_cfg", "search_interpret", "peaks_impl",
        "chain_impl", "search_impl", "t_cap",
    ),
)
def fast_round(
    dev: DeviceIndex,
    chunks: jax.Array,      # [B, C] f32
    lengths: jax.Array,     # [B] i32
    carry_t: jax.Array,     # [B, CARRY] i32
    carry_q: jax.Array,     # [B, CARRY] i32
    carry_d: jax.Array,     # [B, CARRY] f32
    carry_g: jax.Array,     # [B, CARRY] i32 (-1 = empty)
    offsets: jax.Array,     # [B] i32 accumulated feature counts
    reset: jax.Array,       # [B] bool: clear carry before this round
    step: int = 2,
    s_max: int = 512,
    a_cap: int = 8192,
    carry_cap: int = 512,
    m_per_seed: int = 1024,
    trace_max: int = 1024,
    dim: int = 6,
    ed_cfg: EventDetectorConfig = EventDetectorConfig(),
    chain_cfg: ChainingConfig = ChainingConfig(),
    search_interpret: bool = False,
    peaks_impl: str = "scan",
    chain_impl: str = "scan",
    search_impl: str = "kernel",
    t_cap: int = 1 << 22,
):
    B, C = chunks.shape
    CARRY = carry_t.shape[1]
    carry_g = jnp.where(reset[:, None], -1, carry_g)
    offsets = jnp.where(reset, 0, offsets)

    # ---- 1. events -> features --------------------------------------------
    feats, _stdv, counts, _ = batch_generate_events(
        chunks, lengths, cfg=ed_cfg, peaks_impl=peaks_impl
    )
    F = feats.shape[1]

    # ---- 2. seed selection + flat compaction ------------------------------
    has_f = counts > 50  # min_feature_length gate (sigmap.cc:660)
    n_seeds = jnp.where(
        has_f, jnp.clip((counts - dim) // step, 0, s_max), 0
    ).astype(jnp.int32)
    base = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(n_seeds)[:-1].astype(jnp.int32)]
    )
    QCAP = B * s_max
    j = jnp.arange(s_max, dtype=jnp.int32)
    positions = (j + 1) * step                                # [S]
    gidx = jnp.clip(
        positions[None, :, None] + jnp.arange(8)[None, None, :], 0, F - 1
    )
    wins = jnp.take_along_axis(
        feats[:, :, None] * jnp.ones((1, 1, 8), jnp.float32), gidx, axis=1
    ) * (jnp.arange(8) < dim)[None, None, :]                   # [B, S, 8]
    seed_ok = j[None, :] < n_seeds[:, None]                    # [B, S]
    flat_pos = jnp.where(seed_ok, base[:, None] + j[None, :], QCAP)
    seeds = jnp.zeros((QCAP + 1, 8), jnp.float32).at[flat_pos].set(
        wins, mode="drop"
    )[:QCAP]
    seed_read = jnp.full((QCAP + 1,), 0, jnp.int32).at[flat_pos].set(
        jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, s_max)),
        mode="drop",
    )[:QCAP]
    seed_qpos = jnp.zeros((QCAP + 1,), jnp.int32).at[flat_pos].set(
        positions[None, :] + offsets[:, None], mode="drop"
    )[:QCAP]
    total_seeds = n_seeds.sum()
    seed_valid = jnp.arange(QCAP) < total_seeds

    # ---- 3+4. radius search + anchor assembly into per-read rows ----------
    carry_n = (carry_g >= 0).sum(axis=1).astype(jnp.int32)     # [B]
    a_t = jnp.zeros((B, a_cap + 1), jnp.int32)
    a_q = jnp.zeros((B, a_cap + 1), jnp.int32)
    a_d = jnp.zeros((B, a_cap + 1), jnp.float32)
    a_g = jnp.full((B, a_cap + 1), -1, jnp.int32)
    # carried anchors occupy the row prefix (position by per-row cumsum)
    cpos = jnp.where(
        carry_g >= 0, jnp.cumsum((carry_g >= 0), axis=1) - 1, a_cap
    )
    bsel = jnp.arange(B)[:, None]
    a_t = a_t.at[bsel, cpos].set(carry_t, mode="drop")
    a_q = a_q.at[bsel, cpos].set(carry_q, mode="drop")
    a_d = a_d.at[bsel, cpos].set(carry_d, mode="drop")
    a_g = a_g.at[bsel, cpos].set(
        jnp.where(carry_g >= 0, carry_g, -1), mode="drop"
    )

    if search_impl == "flat":
        # one-stage flat search: hash probe -> flat slots -> one W8 row
        # gather -> distance -> direct scatter into per-read anchor rows
        from .seeding import search_round_flat

        sid, cand, d2, match, offs, _nc, sovf = search_round_flat(
            dev, seeds, seed_valid, t_cap
        )
        # sovf[0]: per-seed candidate truncation; sovf[1]: flat slot-space
        # (t_cap) overflow — both mean matches were silently dropped, so
        # both surface through the round's match-overflow flag.
        match_ovf = sovf[0] | sovf[1]
        Pp = (offs.shape[0] - 1) // QCAP  # probe spans per seed
        cm = jnp.cumsum(match).astype(jnp.int32)               # inclusive
        cme = cm - match.astype(jnp.int32)                     # exclusive
        # read r's first slot = offs[first range of its first seed]
        read_first_slot = offs[jnp.clip(base * Pp, 0, offs.shape[0] - 1)]
        read_first_match = cme[
            jnp.clip(read_first_slot, 0, t_cap - 1)
        ]                                                      # [B]
        slot_read = seed_read[sid]                             # [T]
        rank_in_read = cm - 1 - read_first_match[slot_read]
        slotw = carry_n[slot_read] + rank_in_read
        anchor_ovf = jnp.any(match & (slotw >= a_cap))
        slotw = jnp.where(match & (slotw < a_cap), slotw, a_cap)
        a_t = a_t.at[slot_read, slotw].set(
            dev.pos_sorted[cand], mode="drop"
        )
        a_q = a_q.at[slot_read, slotw].set(seed_qpos[sid], mode="drop")
        a_d = a_d.at[slot_read, slotw].set(d2, mode="drop")
        a_g = a_g.at[slot_read, slotw].set(
            dev.group_sorted[cand], mode="drop"
        )
    else:
        from .seeding import _probe_ranges_merged
        from ..ops.range_search_kernel import range_search_pallas

        starts, lens = _probe_ranges_merged(dev, seeds, seed_valid)
        row_cum = jnp.cumsum(lens, axis=1)
        allowed = jnp.clip(
            dev.params.cap_per_seed - (row_cum - lens), 0, None
        )
        lens = jnp.minimum(lens, allowed)
        m_idx, m_dist, m_cnt = range_search_pallas(
            starts, lens, seeds, dev.WT, dev.params.radius,
            R=starts.shape[1], M=m_per_seed, interpret=search_interpret,
        )
        match_ovf = jnp.any(m_cnt > m_per_seed)
        m_cnt = jnp.minimum(m_cnt, m_per_seed).astype(jnp.int32)

        # per-seed output base within its read row
        cum = jnp.cumsum(m_cnt).astype(jnp.int32)
        excl = cum - m_cnt
        read_first_excl = excl[jnp.clip(base, 0, QCAP - 1)]    # [B]
        seed_rel = excl - read_first_excl[seed_read]           # [QCAP]
        anchor_ovf = jnp.any(
            carry_n[seed_read] + seed_rel + m_cnt > a_cap
        )

        mk = jnp.arange(m_per_seed, dtype=jnp.int32)
        slot = (
            carry_n[seed_read][:, None] + seed_rel[:, None] + mk[None, :]
        )                                                      # [QCAP, M]
        ok = (mk[None, :] < m_cnt[:, None]) & seed_valid[:, None]
        slot = jnp.where(ok & (slot < a_cap), slot, a_cap)
        rows = jnp.broadcast_to(seed_read[:, None], (QCAP, m_per_seed))

        widx = dev.perm[m_idx]                                 # original idx
        a_t = a_t.at[rows, slot].set(dev.win_pos[widx], mode="drop")
        a_q = a_q.at[rows, slot].set(
            jnp.broadcast_to(seed_qpos[:, None], slot.shape), mode="drop"
        )
        a_d = a_d.at[rows, slot].set(m_dist, mode="drop")
        a_g = a_g.at[rows, slot].set(
            jnp.where(ok, dev.win_group[widx], -1), mode="drop"
        )
    a_t, a_q, a_d, a_g = (x[:, :a_cap] for x in (a_t, a_q, a_d, a_g))

    # ---- 5. per-read sort by (group, target, query) -----------------------
    sort_g = jnp.where(a_g >= 0, a_g, np.int32(1 << 20))
    sort_g, a_t, a_q, a_d, a_g = jax.lax.sort(
        (sort_g, a_t, a_q, a_d, a_g), dimension=1, num_keys=3
    )
    valid = a_g >= 0
    n_anchors_row = valid.sum(axis=1).astype(jnp.int32)

    # ---- 6. banded chaining ----------------------------------------------
    if chain_impl == "scan":
        scores, preds = chain_scores_banded(
            a_t, a_q, a_d, jnp.where(valid, a_g, -1), valid,
            dev.params.radius, dim, chain_cfg,
        )
    else:
        from ..ops.chain_kernel import chain_scores_banded_pallas

        scores, preds = chain_scores_banded_pallas(
            a_t, a_q, a_d, jnp.where(valid, a_g, -1), valid,
            float(dev.params.radius), dim, chain_cfg,
            interpret=(chain_impl == "pallas_interpret"),
        )
    s = jnp.where(valid, scores, NEG)

    def best_and_trace(sc):
        b1 = jnp.max(sc, axis=1)
        i1 = jnp.argmax(sc, axis=1).astype(jnp.int32)
        return b1, i1

    s1, i1 = best_and_trace(s)

    def traceback(end_idx):
        """Vectorized pointer walk; returns (start_idx, n, sum_dist,
        member_mask [B, A])."""
        member = jnp.zeros((B, a_cap), bool).at[bsel[:, 0], end_idx].set(True)
        state = (end_idx, jnp.ones((B,), jnp.int32),
                 a_d[bsel[:, 0], end_idx], member)

        def body(k, st):
            cur, n, sd, mem = st
            nxt = preds[bsel[:, 0], cur]
            more = nxt != cur
            cur2 = jnp.where(more, nxt, cur)
            mem = mem.at[bsel[:, 0], cur2].set(True)
            n = n + more.astype(jnp.int32)
            sd = sd + jnp.where(more, a_d[bsel[:, 0], cur2], 0.0)
            return (cur2, n, sd, mem)

        cur, n, sd, mem = jax.lax.fori_loop(0, trace_max, body, state)
        return cur, n, sd, mem

    start1, n1, sumd1, mem1 = traceback(i1)
    g1 = a_g[bsel[:, 0], i1]
    t_end1 = a_t[bsel[:, 0], i1]
    t_start1 = a_t[bsel[:, 0], start1]
    q_end1 = a_q[bsel[:, 0], i1]
    q_start1 = a_q[bsel[:, 0], start1]

    # second chain: best end anchor not in chain 1 and not overlapping its
    # extent on the same group (primary-chain overlap rule,
    # spatial_index.cc:233-247)
    overlap = (
        (a_g == g1[:, None])
        & (a_t >= t_start1[:, None] - dim)
        & (a_t <= t_end1[:, None] + dim)
    )
    s_2 = jnp.where(mem1 | overlap, NEG, s)
    s2, i2 = best_and_trace(s_2)
    start2, n2, sumd2, mem2 = traceback(i2)
    has2 = s2 > np.float32(chain_cfg.min_chaining_score)
    s2 = jnp.where(has2, s2, 0.0)

    # ---- 7. carry-out: members of chains 1+2 ------------------------------
    mem = mem1 | (mem2 & has2[:, None])
    mem &= valid
    mpos = jnp.where(mem, jnp.cumsum(mem, axis=1) - 1, carry_cap)
    carry_ovf = jnp.any(mem.sum(axis=1) > carry_cap)
    nt = jnp.zeros((B, carry_cap + 1), jnp.int32)
    nq = jnp.zeros((B, carry_cap + 1), jnp.int32)
    nd = jnp.zeros((B, carry_cap + 1), jnp.float32)
    ng = jnp.full((B, carry_cap + 1), -1, jnp.int32)
    nt = nt.at[bsel, mpos].set(a_t, mode="drop")[:, :carry_cap]
    nq = nq.at[bsel, mpos].set(a_q, mode="drop")[:, :carry_cap]
    nd = nd.at[bsel, mpos].set(a_d, mode="drop")[:, :carry_cap]
    ng = ng.at[bsel, mpos].set(
        jnp.where(mem, a_g, -1), mode="drop"
    )[:, :carry_cap]

    new_offsets = offsets + jnp.where(has_f, counts, 0)

    summary_f = jnp.stack(
        [s1, s2, sumd1, jnp.zeros_like(s1)], axis=1
    )
    summary_i = jnp.stack(
        [g1, t_start1, t_end1, q_start1, q_end1, n1,
         1 + has2.astype(jnp.int32), counts, n_anchors_row], axis=1
    )
    ovf = jnp.stack([match_ovf, anchor_ovf, carry_ovf])
    return (
        summary_f, summary_i, counts, (nt, nq, nd, ng), new_offsets, ovf
    )

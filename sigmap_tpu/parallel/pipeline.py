"""Multi-chip mapping: data-parallel reads x sharded index search.

The reference's only parallelism is an OpenMP taskloop over reads
(sigmap.cc:618-631).  The TPU-native scale-out uses a 2-D device mesh:

  axis "data":  read wavefronts are data-parallel (per-shard chunk batches);
  axis "index": the reference point-cloud windows are sharded by sorted
                position, so every cell lives in exactly one shard and each
                shard answers radius queries against its slice; per-shard
                candidate matches merge with all_gather over ICI, mirroring
                the per-thread-buffer merge of the reference
                (sigmap.cc:217-241) across chips instead of threads.

After the gather, anchors are sorted (lexicographic device sort by
read/group/target/query) and scored with the banded device chainer; the
step returns small per-read summaries (best/second score, locus), keeping
host transfers tiny.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ChainingConfig
from ..index.build import SignalIndex
from ..mapping.chain_device import chain_scores_banded
from ..mapping.seeding import DeviceIndex, SearchParams, search_tile
from ..signal.events import batch_generate_events


def make_mesh(n_data: int, n_index: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = n_data * n_index
    arr = np.array(devices[:need]).reshape(n_data, n_index)
    return Mesh(arr, ("data", "index"))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "W4", "W8", "win_group", "win_pos", "cell_keys", "cell_starts",
        "htbl",
    ],
    meta_fields=["params", "n_shards", "hash_bits"],
)
@dataclass
class ShardedIndex:
    """Stacked per-shard index arrays; leading axis = index shard."""

    W4: jax.Array          # [S, nw_pad, 4]
    W8: jax.Array          # [S, nw_pad, 8]
    win_group: jax.Array   # [S, nw_pad]  (by sorted-window position!)
    win_pos: jax.Array     # [S, nw_pad]
    cell_keys: jax.Array   # [S, K_pad]
    cell_starts: jax.Array  # [S, K_pad + 1]
    htbl: jax.Array        # [S, H, E, 3] per-shard cell hash (common bits)
    params: SearchParams
    n_shards: int
    hash_bits: int

    @staticmethod
    def build(idx: SignalIndex, n_shards: int, radius: float = 0.08,
              **tile_kw) -> "ShardedIndex":
        if idx.win_group is None:
            idx.derive_window_metadata()
        params = SearchParams(
            radius=radius, dim=idx.dim, bucket_dims=idx.bucket_dims,
            cell_width=idx.cell_width, **tile_kw,
        )
        W = idx.windows_sorted(pad_to=8)
        grp = idx.win_group[idx.perm]
        pos = idx.win_pos[idx.perm]
        nw = idx.n_windows
        # split at cell boundaries: balanced window counts, cells intact
        bounds = [0]
        starts = idx.cell_starts
        for s in range(1, n_shards):
            target = s * nw // n_shards
            ci = int(np.searchsorted(starts, target))
            bounds.append(int(starts[min(ci, len(starts) - 1)]))
        bounds.append(nw)
        nw_pad = max(
            1, max(bounds[s + 1] - bounds[s] for s in range(n_shards))
        )
        keys_per = []
        starts_per = []
        for s in range(n_shards):
            lo, hi = bounds[s], bounds[s + 1]
            sel = (starts[:-1] >= lo) & (starts[:-1] < hi)
            k = idx.cell_keys[sel]
            st = starts[:-1][sel] - lo
            keys_per.append(k)
            starts_per.append(np.concatenate([st, [hi - lo]]))
        K_pad = max(1, max(len(k) for k in keys_per))
        SENTINEL = np.int32(2**31 - 1)

        def pad2(a, n, fill):
            out = np.full((n,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        W4s, W8s, grps, poss, keys, csts = [], [], [], [], [], []
        for s in range(n_shards):
            lo, hi = bounds[s], bounds[s + 1]
            W4s.append(pad2(W[lo:hi, :4].astype(np.float32), nw_pad, 0))
            W8s.append(pad2(W[lo:hi].astype(np.float32), nw_pad, 0))
            grps.append(pad2(grp[lo:hi].astype(np.int32), nw_pad, -1))
            poss.append(pad2(pos[lo:hi].astype(np.int32), nw_pad, 0))
            keys.append(
                pad2(keys_per[s].astype(np.int32), K_pad, SENTINEL)
            )
            cs = starts_per[s].astype(np.int32)
            csts.append(pad2(cs, K_pad + 1, cs[-1]))
        # per-shard cell hash tables at one common size so they stack
        from ..mapping.seeding import build_cell_hash

        probe = [
            build_cell_hash(keys_per[s].astype(np.int64),
                            starts_per[s].astype(np.int64))
            for s in range(n_shards)
        ]
        bits = max(b for _, b in probe)
        htbls = [
            build_cell_hash(keys_per[s].astype(np.int64),
                            starts_per[s].astype(np.int64), min_bits=bits)[0]
            for s in range(n_shards)
        ]
        return ShardedIndex(
            W4=jnp.asarray(np.stack(W4s)), W8=jnp.asarray(np.stack(W8s)),
            win_group=jnp.asarray(np.stack(grps)),
            win_pos=jnp.asarray(np.stack(poss)),
            cell_keys=jnp.asarray(np.stack(keys)),
            cell_starts=jnp.asarray(np.stack(csts)),
            htbl=jnp.asarray(np.stack(htbls)),
            params=params, n_shards=n_shards, hash_bits=bits,
        )

    def place(self, mesh: Mesh) -> "ShardedIndex":
        spec = NamedSharding(mesh, P("index"))
        put = lambda a: jax.device_put(a, spec)
        return ShardedIndex(
            W4=put(self.W4), W8=put(self.W8),
            win_group=put(self.win_group), win_pos=put(self.win_pos),
            cell_keys=put(self.cell_keys), cell_starts=put(self.cell_starts),
            htbl=put(self.htbl),
            params=self.params, n_shards=self.n_shards,
            hash_bits=self.hash_bits,
        )


def _local_device_index(sh: ShardedIndex) -> DeviceIndex:
    """View one shard's arrays (already squeezed) as a DeviceIndex.

    perm is identity here: shard windows are pre-sorted and carry their own
    metadata (win_pos/win_group are stored in sorted-window order), so
    search results index the local sorted array directly and
    pos_sorted/group_sorted coincide with win_pos/win_group.
    """
    nw = sh.W4.shape[0]
    return DeviceIndex(
        W4=sh.W4, W8=sh.W8,
        WT=jnp.zeros((8, 1), jnp.float32),  # XLA path only (no kernel WT)
        perm=jnp.arange(nw, dtype=jnp.int32),
        win_group=sh.win_group, win_pos=sh.win_pos,
        cell_keys=sh.cell_keys, cell_starts=sh.cell_starts,
        htbl=sh.htbl, pos_sorted=sh.win_pos, group_sorted=sh.win_group,
        n_windows=nw, params=sh.params, hash_bits=sh.hash_bits,
    )


def multichip_map_chunk_step(
    mesh: Mesh,
    sharded: ShardedIndex,
    chunks: jax.Array,     # [B, C] sharded over "data"
    lengths: jax.Array,    # [B]
    step_size: int = 2,
    max_seeds: int = 64,
    anchor_cap: int = 2048,
    dim: int = 6,
    chain_cfg: ChainingConfig = ChainingConfig(),
):
    """One full streaming mapping step over the mesh.

    Returns per-read summaries [B, 5]: (best_score, second_score,
    best_group, best_target_end, n_anchors), replicated over "index".
    """
    p = sharded.params
    qt = p.seeds_per_tile

    def shard_fn(sh: ShardedIndex, chunks_blk, lengths_blk):
        sh_local = jax.tree_util.tree_map(lambda a: a[0], sh)
        dev = _local_device_index(sh_local)
        return chunk_step(
            dev, chunks_blk, lengths_blk, step_size=step_size,
            max_seeds=max_seeds, anchor_cap=anchor_cap, dim=dim,
            chain_cfg=chain_cfg, axis_name="index",
        )

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("index"), P("data"), P("data")),
        out_specs=P("data"),
        check_rep=False,
    )
    return fn(sharded, chunks, lengths)


def chunk_step(
    dev: DeviceIndex,
    chunks_blk: jax.Array,
    lengths_blk: jax.Array,
    step_size: int = 2,
    max_seeds: int = 64,
    anchor_cap: int = 2048,
    dim: int = 6,
    chain_cfg: ChainingConfig = ChainingConfig(),
    axis_name: str | None = None,
):
    """One full mapping chunk step on one (or one shard of a) device:
    events -> seed selection -> radius search -> (all_gather) -> sort ->
    banded chaining -> per-read summaries [B, 5]."""
    p = dev.params
    qt = p.seeds_per_tile
    if True:
        B = chunks_blk.shape[0]
        feats, _stdv, counts, _ = batch_generate_events(
            chunks_blk, lengths_blk
        )
        # device seed selection: positions (j+1)*step, j < max_seeds
        j = jnp.arange(max_seeds)
        positions = (j + 1) * step_size                       # [S]
        seed_valid = positions[None, :] <= counts[:, None] - dim  # [B, S]
        gather_idx = jnp.clip(
            positions[None, :, None] + jnp.arange(8)[None, None, :], 0,
            feats.shape[1] - 1,
        )
        wins = jnp.take_along_axis(
            feats[:, :, None] * jnp.ones((1, 1, 8), jnp.float32),
            gather_idx, axis=1,
        )  # [B, S, 8] -- via broadcasted feats; pad dims 6,7 zeroed below
        wins = wins * (jnp.arange(8) < dim)[None, None, :]
        flat_w = wins.reshape(B * max_seeds, 8)
        flat_v = seed_valid.reshape(B * max_seeds)
        n_tiles = (B * max_seeds) // qt
        tiles_w = flat_w.reshape(n_tiles, qt, 8)
        tiles_v = flat_v.reshape(n_tiles, qt)

        def one(args):
            q, v = args
            m_sid, m_widx, m_dist, nm, nc, ovf = search_tile(dev, q, v)
            return m_sid, m_widx, m_dist, nm
        m_sid, m_widx, m_dist, nm = jax.lax.map(one, (tiles_w, tiles_v))
        # flatten tile outputs -> local anchors
        M = m_sid.shape[0] * m_sid.shape[1]
        tile_base = (
            jnp.arange(m_sid.shape[0], dtype=jnp.int32)[:, None] * qt
        )
        gsid = (m_sid + tile_base).reshape(M)
        slot_ok = (
            jnp.arange(m_sid.shape[1])[None, :] < nm[:, None]
        ).reshape(M)
        widx = m_widx.reshape(M)
        dist = m_dist.reshape(M)
        read = gsid // max_seeds
        qpos = (gsid % max_seeds + 1) * step_size
        group = jnp.where(slot_ok, dev.win_group[widx], -1)
        tpos = dev.win_pos[widx]
        # compact to anchor_cap local anchors
        keep = slot_ok & (group >= 0)
        cpos = jnp.where(keep, jnp.cumsum(keep) - 1, anchor_cap)
        def compact(a, fill):
            o = jnp.full((anchor_cap + 1,), fill, a.dtype)
            return o.at[cpos].set(jnp.where(keep, a, fill), mode="drop")[
                :anchor_cap
            ]
        a_read = compact(read.astype(jnp.int32), np.int32(1 << 20))
        a_group = compact(group, np.int32(-1))
        a_tpos = compact(tpos, np.int32(0))
        a_qpos = compact(qpos.astype(jnp.int32), np.int32(0))
        a_dist = compact(dist, np.float32(0))
        # merge anchors across index shards
        if axis_name is not None:
            g = lambda a: jax.lax.all_gather(a, axis_name).reshape(-1)
            a_read, a_group, a_tpos, a_qpos, a_dist = map(
                g, (a_read, a_group, a_tpos, a_qpos, a_dist)
            )
        a_valid = a_group >= 0
        # sort by (read, group, target, query) for chaining
        key1 = a_read * 64 + jnp.maximum(a_group, 0)
        a_dist_i = a_dist  # carried
        (k1, t_s, q_s, d_s, r_s, g_s, v_s) = jax.lax.sort(
            (key1, a_tpos, a_qpos, a_dist_i, a_read, a_group,
             a_valid.astype(jnp.int32)),
            num_keys=3,
        )
        grp_combined = jnp.where(v_s > 0, k1, -1)
        scores, _pred = chain_scores_banded(
            t_s[None], q_s[None], d_s[None], grp_combined[None],
            (v_s > 0)[None], p.radius, dim, chain_cfg,
        )
        scores = scores[0]
        # per-read best and second-best end scores via one-hot maxes
        rid = jnp.clip(r_s, 0, B - 1)
        onehot = jax.nn.one_hot(rid, B, dtype=jnp.float32)
        sc = jnp.where(v_s > 0, scores, -1e30)
        per_read = jnp.where(onehot > 0, sc[:, None], -1e30)  # [M, B]
        best = per_read.max(axis=0)
        best_arg = per_read.argmax(axis=0)
        second = jnp.where(
            jnp.arange(per_read.shape[0])[:, None] == best_arg[None, :],
            -1e30, per_read,
        ).max(axis=0)
        btarget = t_s[best_arg].astype(jnp.float32)
        bgroup = g_s[best_arg].astype(jnp.float32)
        n_anch = (onehot * (v_s > 0)[:, None]).sum(axis=0)
        return jnp.stack([best, second, bgroup, btarget, n_anch], axis=1)

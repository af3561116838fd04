"""Sweep-index: the streaming search layout for the turbo engine.

Round 1's radius-search engines answered each seed query with row gathers
(hash probe -> candidate slots -> W8[cand]); measured on v5e, XLA row
gathers run at ~2.4 GB/s (~300x below HBM) and big cumsums/sorts are
similarly latency-bound, capping the whole mapper at ~3.6 reads/s.  The
turbo engine inverts the loop: index windows are sorted by a coarse 4-dim
grid cell key and stored PRE-TILED so the search kernel
(ops/sweep_kernel.py) STREAMS contiguous window tiles at full HBM
bandwidth past blocks of key-sorted seeds, evaluating exact f32 squared
distances densely on the VPU (strict d^2 < radius: nanoflann parity,
nanoflann.hpp:249; same match set as the reference's k-d tree radius
search, spatial_index.cc:366).

Layout choices (why these constants):
* cell width = 2*sqrt(radius): the L2 ball spans <= 2 cells per dim, so a
  seed's candidate superset is 2^3 = 8 offset probes over the leading 3
  dims with the 4th dim's span merged into each probe's contiguous range;
* 4 bucketed dims balance probe count against candidate volume; the cell
  key space (RADIX^4 ~ 105k) stays small enough that a DENSE cumulative
  table replaces hash probing entirely (2 array lookups per seed-block
  probe instead of per-seed hash chains);
* windows are tiled [T, 8, TILE] f32 ("transposed" per tile) so one tile
  is ONE contiguous DMA, plus [T, TILE] i32 packed metadata
  (group << 25 | target_position) decoded without any gather.

Reference parity: the window SET (masking sigmap.cc:19-185, dedup
spatial_index.cc:43-46, straddling windows sigmap_adaptor.h:89-97) is
identical to SignalIndex; only the storage order differs, and radius
matches are order-insensitive (the reference searches with sorted=false,
spatial_index.cc:323-324).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .build import SignalIndex

# Sweep grid: cell width 2*sqrt(radius); z-scored signals live in roughly
# [-5, +5], so 18 cells of width 0.566 (offset 9) cover the range with
# outliers clipped into edge cells (exactness preserved: windows and probe
# bounds clip identically, and the final strict d^2 < r test is exact).
SWEEP_RADIX = 18
SWEEP_OFFSET = 9
# Bucket 4 dims.  Measured on v5e (2 Mb index, B=256 rounds): bucketing a
# 5th dim doubles the probe offsets (2^(bd-1)) and, because each block's
# per-offset DMA union is set by the block's SORTED-SEED key span (which
# does not shrink with more dims), total tile visits GROW ~20% — bd=4 is
# the sweet spot.  bd = min(SWEEP_DIMS, dim) is the single consistency
# rule; sweep_search derives the same bd from dim.
SWEEP_DIMS = 4


def bucket_dims(dim: int) -> int:
    """Number of bucketed key dims for an index of dimension `dim`."""
    return min(SWEEP_DIMS, dim)
PAD_COORD = 1.0e30  # padding |w|^2 value: can never be within radius
META_POS_BITS = 25  # packed meta: (group << 25) | target_position


@dataclass
class SweepIndex:
    """Pre-tiled, cell-sorted window store + dense cumulative cell table."""

    tiles: np.ndarray      # [T, 8, TILE] f32 window coords (pad: PAD_COORD)
    meta: np.ndarray       # [T, 8, TILE//8] i32 (group << 25) | tpos;
                           # window w of tile t sits at (t, w // (TILE//8),
                           # w % (TILE//8))
    cum: np.ndarray        # [RADIX^4 + 1] i32 cumulative windows per cell
    n_windows: int
    tile: int
    dim: int
    cell_width: float
    radius: float

    @property
    def n_tiles(self) -> int:
        return self.tiles.shape[0]

    @staticmethod
    def build(idx: SignalIndex, radius: float, tile: int = 1024
              ) -> "SweepIndex":
        """Re-sort a SignalIndex's windows by the sweep grid and tile them.

        tile must be a multiple of 1024 on real TPU (meta tiles are
        [8, tile//8] i32 and Mosaic needs the minor dim 128-aligned);
        smaller tiles only work in interpret mode (CPU tests)."""
        nw = idx.n_windows
        dim = idx.dim
        if dim < 2:
            raise ValueError("sweep layout needs index dim >= 2")
        bd = bucket_dims(dim)
        w = 2.0 * float(np.sqrt(radius))
        if idx.win_group is None:
            idx.derive_window_metadata()
        if len(idx.ref_names) * 2 > (1 << (31 - META_POS_BITS)):
            raise ValueError("too many reference sequences for packed meta")
        if nw and int(idx.win_pos.max(initial=0)) >= (1 << META_POS_BITS):
            raise ValueError(
                "target positions overflow packed meta "
                f"(>= 2^{META_POS_BITS}); shard the index first"
            )
        # per-position coords over the leading bd dims, shifted slices
        coords = np.clip(
            np.floor(idx.values / w).astype(np.int32) + SWEEP_OFFSET,
            0, SWEEP_RADIX - 1,
        )
        key = np.zeros(nw, np.int32)
        for d in range(bd):
            key *= SWEEP_RADIX
            key += coords[d : d + nw]
        perm = np.argsort(key, kind="stable")
        # dense cumulative table over the full key space
        counts = np.bincount(key, minlength=SWEEP_RADIX**bd)
        cum = np.zeros(SWEEP_RADIX**bd + 1, np.int32)
        np.cumsum(counts, out=cum[1:])
        if dim > 6:
            raise ValueError("sweep layout needs a free row for |w|^2")
        T = max(1, -(-nw // tile))
        tiles = np.full((T * tile, 8), 0.0, np.float32)
        wsq = np.zeros(nw, np.float64)
        for d in range(dim):
            col = idx.values[perm + d]
            tiles[:nw, d] = col
            wsq += col.astype(np.float64) ** 2
        # row `dim` holds |w|^2 so the kernel can form d^2 from one MXU
        # cross-term: d^2 = |q|^2 + |w|^2 - 2 q.w (seeds are zero in rows
        # >= dim, so the dot over all 8 rows never touches this row).
        # Padding windows: zero coords + |w|^2 = PAD_COORD, so d^2 =
        # |q|^2 + PAD_COORD > radius for every seed (the expansion form
        # would cancel catastrophically with huge pad coordinates).
        tiles[:nw, dim] = wsq.astype(np.float32)
        tiles[nw:, :] = 0.0
        tiles[nw:, dim] = PAD_COORD
        meta = np.zeros(T * tile, np.int32)
        meta[:nw] = (
            (idx.win_group[perm].astype(np.int32) << META_POS_BITS)
            | idx.win_pos[perm].astype(np.int32)
        )
        # [T, 8, tile//8] so a tile's metadata is one whole-block DMA
        # (Mosaic can't slice single rows out of (8,128)-tiled HBM arrays)
        return SweepIndex(
            tiles=np.ascontiguousarray(
                tiles.reshape(T, tile, 8).transpose(0, 2, 1)
            ),
            meta=meta.reshape(T, 8, tile // 8),
            cum=cum, n_windows=nw, tile=tile, dim=dim,
            cell_width=w, radius=float(radius),
        )

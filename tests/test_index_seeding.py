"""Index construction + device radius search vs the exact k-d tree oracle."""

import numpy as np
import pytest

from sigmap_tpu import native
from sigmap_tpu.config import IndexConfig
from sigmap_tpu.index.build import (
    SignalIndex, build_index, masked_positions, revcomp_kmers, zscore_f64,
)
from sigmap_tpu.io.fasta import ReferenceSequence
from sigmap_tpu.utils import encode_bases, rolling_kmer_codes


def _seqs(tiny_genome):
    from sigmap_tpu.utils import CODE_TO_CHAR

    out = []
    for name, codes in tiny_genome:
        s = ReferenceSequence(name, codes)
        s.prepare_negative()
        out.append(s)
    return out


def test_revcomp_kmers():
    kmers = rolling_kmer_codes(encode_bases("ACGTT"), 3)
    rc = revcomp_kmers(kmers, 3)
    # revcomp(ACG)=CGT, revcomp(CGT)=ACG, revcomp(GTT)=AAC
    def enc(s):
        v = 0
        for c in s:
            v = v * 4 + "ACGT".index(c)
        return v

    assert list(kmers) == [enc("ACG"), enc("CGT"), enc("GTT")]
    assert list(rc) == [enc("CGT"), enc("ACG"), enc("AAC")]


def test_masking_semantics():
    # sequence with an N and a repeated 4-mer region
    seq = "ACGT" * 40 + "N" + "ACGT" * 40
    s = ReferenceSequence("x", encode_bases(seq))
    s.prepare_negative()
    k = 5
    pos_m, neg_m = masked_positions([s], k, frequency=0.0001)
    m = pos_m[0]
    assert len(m) == len(seq) - k + 1
    # the window ENDING at the N (start = N_pos+1-k) must be masked
    n_pos = seq.index("N")
    assert m[n_pos + 1 - k]
    # windows STARTING right after N are unmasked only masked by frequency;
    # ACGT-repeat kmers are extremely frequent here -> masked by threshold
    assert m.mean() > 0.9  # nearly everything is high-frequency in this toy


def test_build_index_structure(pore6, tiny_genome):
    seqs = _seqs(tiny_genome)
    cfg = IndexConfig()
    idx = build_index(seqs, pore6, cfg, verbose=False)
    assert idx.dim == 6
    assert idx.n_points > 0
    # windows sorted by cell key: recompute keys and check monotone
    W = np.lib.stride_tricks.sliding_window_view(idx.values, idx.dim)
    coords = np.clip(
        np.floor(W[idx.perm][:, : idx.bucket_dims] / idx.cell_width).astype(
            np.int64
        )
        + SignalIndex.CELL_OFFSET,
        0, SignalIndex.CELL_RADIX - 1,
    )
    key = np.zeros(len(idx.perm), np.int64)
    for d in range(idx.bucket_dims):
        key = key * SignalIndex.CELL_RADIX + coords[:, d]
    assert (np.diff(key) >= 0).all()
    # CSR covers all windows
    assert idx.cell_starts[0] == 0 and idx.cell_starts[-1] == idx.n_windows
    # positions decode round trip
    idx.derive_window_metadata()
    assert idx.win_group.min() >= 0
    assert idx.win_group.max() <= 1  # single sequence, two strands


def test_index_save_load_and_pt(pore6, tiny_genome, tmp_path):
    seqs = _seqs(tiny_genome)
    idx = build_index(seqs, pore6, IndexConfig(), verbose=False)
    idx.save(str(tmp_path / "g"))
    idx2 = SignalIndex.load(str(tmp_path / "g"))
    np.testing.assert_array_equal(idx.values, idx2.values)
    np.testing.assert_array_equal(idx.perm, idx2.perm)
    assert idx2.ref_names == idx.ref_names

    idx.save_pt(str(tmp_path / "g.pt"))
    idx3 = SignalIndex.load_pt(
        str(tmp_path / "g.pt"), IndexConfig(), 0.08, idx.ref_names,
        idx.ref_lengths,
    )
    np.testing.assert_array_equal(idx.values, idx3.values)
    np.testing.assert_array_equal(idx.positions, idx3.positions)
    np.testing.assert_array_equal(idx.perm, idx3.perm)


def test_device_search_matches_kdtree_oracle(pore6, tiny_genome):
    from sigmap_tpu.mapping.seeding import (
        DeviceIndex, flatten_matches, pad_seeds, search_flat,
    )

    seqs = _seqs(tiny_genome)
    idx = build_index(seqs, pore6, IndexConfig(), verbose=False)
    radius = 0.08
    dev = DeviceIndex.from_host(
        idx, radius=radius, seeds_per_tile=16, cap_per_seed=8192,
        surv_per_tile=16384, matches_per_tile=8192,
    )

    # queries: noisy copies of true windows + pure noise
    rng = np.random.default_rng(3)
    W = np.lib.stride_tricks.sliding_window_view(idx.values, idx.dim)
    qi = rng.integers(0, idx.n_windows, 40)
    noisy = W[qi] + rng.normal(0, 0.1, (40, idx.dim)).astype(np.float32)
    pure = rng.normal(0, 1, (8, idx.dim)).astype(np.float32)
    queries = np.concatenate([noisy, pure]).astype(np.float32)
    q8 = np.zeros((len(queries), 8), np.float32)
    q8[:, : idx.dim] = queries

    seeds, valid, n_tiles = pad_seeds(q8, dev.params)
    out = search_flat(dev, seeds, valid, n_tiles)
    sids, widx, dist, n_cand, ovf = flatten_matches(out, dev.params)
    assert not ovf.any()

    tree = native.KdTree(idx.values, idx.dim, 20)
    for qid in range(len(queries)):
        oi, od = tree.radius(queries[qid], radius)
        got = widx[sids == qid]
        gotd = dist[sids == qid]
        assert set(got.tolist()) == set(oi.tolist()), f"query {qid}"
        # distances agree
        ref = dict(zip(oi.tolist(), od.tolist()))
        for w_, d_ in zip(got.tolist(), gotd.tolist()):
            assert abs(ref[w_] - d_) < 1e-5


def test_native_masks_match_numpy(tiny_genome):
    from sigmap_tpu import native
    from sigmap_tpu.io.fasta import ReferenceSequence

    name, codes = tiny_genome[0]
    s = ReferenceSequence(name, codes[:20000])
    s.prepare_negative()
    pm_py, nm_py = masked_positions([s], 11, 0.0002)
    out = native.kmer_masks([s.codes], [s.neg_codes], 11, 0.0002)
    if out is None:
        pytest.skip("native lib unavailable")
    np.testing.assert_array_equal(pm_py[0], out[0][0])
    np.testing.assert_array_equal(nm_py[0], out[1][0])

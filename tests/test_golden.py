"""Golden-fixture tests: outputs frozen from the REFERENCE C++ itself.

See tests/golden/README.md for provenance (harnesses compiled against
/root/reference/src).  These are the non-circular anchors for the event
detector and the seeding+chaining engine: the expected values were
produced by the reference's own DetectEvents / SpatialIndex code, not by
anything in this repository.
"""

import os

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def _f32(name):
    return np.fromfile(os.path.join(GOLD, name), np.float32)


def test_event_detector_matches_reference_golden():
    from sigmap_tpu.config import EventDetectorConfig
    from sigmap_tpu.signal import events_ref

    sig = _f32("events_in.f32")
    lines = open(os.path.join(GOLD, "events_out.txt")).read().splitlines()
    n_ref = int(lines[0])
    ref = np.array([[float(x) for x in l.split()] for l in lines[1:]])
    assert len(ref) == n_ref

    cfg = EventDetectorConfig()  # DNA preset == event_detection_defaults
    ps, pss = events_ref.prefix_sums(sig)
    t1 = events_ref.tstat(ps, pss, len(sig), cfg.window_length1)
    t2 = events_ref.tstat(ps, pss, len(sig), cfg.window_length2)
    peaks = events_ref.detect_peaks(t1, t2, len(sig), cfg)
    starts, means, stdvs = events_ref.events_from_peaks(
        peaks, ps, pss, len(sig)
    )
    assert len(starts) == n_ref, (len(starts), n_ref)
    np.testing.assert_array_equal(starts, ref[:, 0].astype(np.int64))
    lengths = np.diff(np.concatenate([starts, [len(sig)]]))
    np.testing.assert_array_equal(lengths, ref[:, 1].astype(np.int64))
    np.testing.assert_allclose(means, ref[:, 2], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(stdvs, ref[:, 3], rtol=2e-4, atol=2e-3)


@pytest.fixture(scope="module")
def golden_chain_index():
    """SignalIndex over the golden raw signals (no pore model, no mask),
    mirroring SpatialIndex::Construct's point cloud (dedup 0.01, positive
    then negative stream, packed positions)."""
    from sigmap_tpu import native
    from sigmap_tpu.config import IndexConfig
    from sigmap_tpu.index.build import _finalize_index, pack_position

    pos = _f32("ref_pos.f32")
    neg = _f32("ref_neg.f32")
    cfg = IndexConfig()
    dim = cfg.dimension
    values_parts, pos_parts = [], []
    prev_last = None
    for strand, sig in ((0, pos), (1, neg)):
        n_win = len(sig) - dim + 1
        mask = np.zeros(n_win, np.uint8)
        kept, prev_last = native.dedup(
            sig[:n_win], mask, cfg.dedup_delta, prev_val=prev_last
        )
        values_parts.append(sig[kept])
        pos_parts.append(pack_position(0, kept.astype(np.uint64), strand))
    idx = _finalize_index(
        np.concatenate(values_parts), np.concatenate(pos_parts),
        dim, cfg.max_leaf, cfg, 0.08, ["golden"], [len(pos)],
    )
    return idx


def test_chaining_matches_reference_golden(golden_chain_index):
    from sigmap_tpu.config import SigmapConfig
    from sigmap_tpu.oracle import Oracle

    idx = golden_chain_index
    query = _f32("query.f32")
    lines = open(os.path.join(GOLD, "chains_out.txt")).read().splitlines()
    n_chains = int(lines[0])
    ref_chains = []
    anchors = None
    for l in lines[1:]:
        f = l.split()
        if f[0] == "C":
            anchors = []
            ref_chains.append({
                "direction": int(f[1]), "ref": int(f[2]),
                "score": float(f[3]), "num_anchors": int(f[4]),
                "start": int(f[5]), "end": int(f[6]), "mapq": int(f[7]),
                "anchors": anchors,
            })
        else:
            anchors.append((int(f[1]), int(f[2]), float(f[3])))
    assert len(ref_chains) == n_chains

    oracle = Oracle(idx, SigmapConfig())
    chains = oracle.chains_for_chunk(query, step=2, offset=0, prev=[])
    assert len(chains) == n_chains, (len(chains), n_chains)
    for got, want in zip(chains, ref_chains):
        assert got.direction == want["direction"]
        assert got.ref_index == want["ref"]
        assert got.num_anchors == want["num_anchors"]
        assert got.start_position == want["start"]
        assert got.end_position == want["end"]
        assert got.mapq == want["mapq"]
        np.testing.assert_allclose(got.score, want["score"], rtol=1e-4)
        # anchor-for-anchor (reference prints best chain's member anchors
        # in traceback order)
        a = got.anchors
        assert len(a) == len(want["anchors"])
        for (tp, qp, d), ga in zip(want["anchors"], a):
            assert int(ga["target"]) == tp
            assert int(ga["query"]) == qp
            assert abs(float(ga["dist"]) - d) < 5e-4

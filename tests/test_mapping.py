"""End-to-end mapping: device driver vs oracle, and vs simulation truth."""

import dataclasses

import numpy as np
import pytest

from sigmap_tpu.config import (
    ChainingConfig, MappingConfig, RuntimeConfig, SigmapConfig,
)
from sigmap_tpu.index.build import build_index
from sigmap_tpu.io.fasta import ReferenceSequence
from sigmap_tpu.io.signals import ReadSignal, dac_to_pa
from sigmap_tpu.mapping.chain import POSITIVE, generate_chains, make_anchors
from sigmap_tpu.mapping.driver import Mapper
from sigmap_tpu.oracle import Oracle
from sigmap_tpu.synth import simulate_reads


TEST_CFG = SigmapConfig(
    runtime=RuntimeConfig(
        read_batch=8, seeds_per_tile=32, cap_per_seed=8192,
        surv_per_tile=65536, matches_per_tile=16384,
    )
)


@pytest.fixture(scope="module")
def setup(pore6, tiny_genome):
    seqs = [ReferenceSequence(n, c) for n, c in tiny_genome]
    idx = build_index(seqs, pore6, TEST_CFG.index, verbose=False)
    reads = simulate_reads(pore6, tiny_genome, 8, seed=21, read_bases=1500)
    signals = [
        ReadSignal(r.read_id, r.digitisation, r.range, r.offset,
                   dac_to_pa(r.raw, r.digitisation, r.range, r.offset))
        for r in reads
    ]
    return idx, reads, signals


def test_chain_module_basic():
    # a clean diagonal of anchors chains into one high-scoring chain
    t = np.arange(0, 200, 10)
    q = np.arange(0, 200, 10) + 3
    d = np.full(len(t), 0.01, np.float32)
    chains = generate_chains(
        {(0, 0): make_anchors(t, q, d)}, [], 1, 0.08, 6
    )
    assert len(chains) >= 1
    best = chains[0]
    assert best.direction == POSITIVE
    assert best.num_anchors == len(t)
    assert best.start_position == 0 and best.end_position == 190
    assert best.mapq == 60 or len(chains) > 1


def test_streaming_driver_matches_oracle(setup):
    idx, reads, signals = setup
    mapper = Mapper(idx, TEST_CFG)
    oracle = Oracle(idx, TEST_CFG)
    records = {r.read_name: r for r in mapper.streaming_map(signals)}
    assert len(records) == len(signals)

    n_pos_match = 0
    for r, s in zip(reads, signals):
        ci, nev, chains, stopped = oracle.streaming_read(s.pa)
        rec = records[s.read_id]
        if chains:
            best = chains[0]
            if rec.is_mapped:
                # driver and oracle agree on the mapped locus
                assert rec.ref_index == best.ref_index
                ref_len = idx.ref_lengths[best.ref_index]
                expect_start = (
                    best.start_position
                    if best.direction == POSITIVE
                    else ref_len + 1 - best.end_position
                )
                assert rec.fragment_start == expect_start, s.read_id
                assert rec.mapq == best.mapq
                n_pos_match += 1
        else:
            assert not rec.is_mapped
    assert n_pos_match >= len(signals) - 1


def test_streaming_accuracy_vs_truth(setup):
    """Mapped positions must land on the simulated origin locus."""
    idx, reads, signals = setup
    mapper = Mapper(idx, TEST_CFG)
    records = {r.read_name: r for r in mapper.streaming_map(signals)}
    pore_k = 6
    n_correct = 0
    n_mapped = 0
    for r, s in zip(reads, signals):
        rec = records[s.read_id]
        if not rec.is_mapped:
            continue
        n_mapped += 1
        strand_ok = rec.direction == r.strand
        lo = rec.fragment_start
        hi = rec.fragment_start + rec.fragment_length
        # generous overlap test with the true fragment
        if strand_ok and lo < r.ref_end and hi > r.ref_start:
            n_correct += 1
    assert n_mapped >= len(signals) // 2, f"only {n_mapped} mapped"
    assert n_correct == n_mapped, f"{n_correct}/{n_mapped} correct"


def test_batch_map_matches_oracle(setup):
    idx, reads, signals = setup
    cfg = TEST_CFG
    mapper = Mapper(idx, cfg)
    oracle = Oracle(idx, cfg)
    # short reads to keep whole-read seeding cheap on CPU
    short = signals[:4]
    recs = {r.read_name: r for r in mapper.map_reads(short)}
    for s in short:
        nfeat, chains = oracle.map_read(s.pa)
        if nfeat <= cfg.mapping.min_feature_length:
            assert s.read_id not in recs
            continue
        rec = recs[s.read_id]
        if chains:
            best = chains[0]
            assert rec.read_length == nfeat
            assert rec.mapq == best.mapq
            assert rec.read_start == int(best.anchors["query"][-1])
            ref_len = idx.ref_lengths[best.ref_index]
            expect_start = (
                best.start_position
                if best.direction == POSITIVE
                else ref_len + 1 - best.end_position
            )
            assert rec.fragment_start == expect_start
        else:
            assert rec.mapq == 61


def test_streaming_early_stop_happens(setup):
    """Confident reads should stop before consuming all chunks."""
    idx, reads, signals = setup
    mapper = Mapper(idx, TEST_CFG)
    records = mapper.streaming_map(signals)
    cis = []
    for rec in records:
        for t in rec.tags.split("\t"):
            if t.startswith("ci:i:"):
                cis.append(int(t.split(":")[2]))
    total_chunks = sum(s.length // 4000 for s in signals)
    assert sum(cis) < total_chunks, "no early stopping happened"


def test_num_threads_parity(setup):
    """-t N (RuntimeConfig.num_threads) must not change any output: the
    exact engine's threaded per-read chaining and turbo's threaded
    quantization are pure parallelizations (sigmap.cc:1340-1341)."""
    from sigmap_tpu.mapping.turbo import quantize_batch

    idx, reads, signals = setup
    c1 = dataclasses.replace(
        TEST_CFG, runtime=dataclasses.replace(
            TEST_CFG.runtime, num_threads=1)
    )
    c3 = dataclasses.replace(
        TEST_CFG, runtime=dataclasses.replace(
            TEST_CFG.runtime, num_threads=3)
    )
    r1 = Mapper(idx, c1).streaming_map(signals)
    r3 = Mapper(idx, c3).streaming_map(signals)
    def lines(rs):
        from sigmap_tpu.io.paf import mapped_line, unmapped_line

        out = []
        for r in rs:
            ln = (
                mapped_line(r, idx.ref_names[r.ref_index],
                            idx.ref_lengths[r.ref_index])
                if r.is_mapped else unmapped_line(r)
            )
            # mt:f is wall time — the one legitimately thread-dependent field
            out.append("\t".join(
                f for f in ln.split("\t") if not f.startswith("mt:f:")
            ))
        return out
    assert lines(r1) == lines(r3)
    q1 = quantize_batch(signals, len(signals), 4, 4000, 30, threads=1)
    q3 = quantize_batch(signals, len(signals), 4, 4000, 30, threads=3)
    for a, b in zip(q1, q3):
        np.testing.assert_array_equal(a, b)

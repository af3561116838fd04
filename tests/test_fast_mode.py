"""Fast (all-device) streaming mode: accuracy vs simulation truth and
consistency with the exact path's loci."""

import numpy as np
import pytest

from sigmap_tpu.config import RuntimeConfig, SigmapConfig
from sigmap_tpu.index.build import build_index
from sigmap_tpu.io.fasta import ReferenceSequence
from sigmap_tpu.io.signals import ReadSignal, dac_to_pa
from sigmap_tpu.mapping.driver import Mapper
from sigmap_tpu.synth import random_genome, simulate_reads

CFG = SigmapConfig(
    runtime=RuntimeConfig(
        read_batch=8, seeds_per_tile=32, cap_per_seed=8192,
        surv_per_tile=65536, matches_per_tile=16384,
        search_impl="kernel_interpret",
    )
)


@pytest.fixture(scope="module")
def setup(pore6):
    genome = random_genome(100_000, seed=7)
    seqs = [ReferenceSequence(n, c) for n, c in genome]
    idx = build_index(seqs, pore6, CFG.index, verbose=False)
    reads = simulate_reads(pore6, genome, 8, seed=21, read_bases=1500)
    signals = [
        ReadSignal(r.read_id, r.digitisation, r.range, r.offset,
                   dac_to_pa(r.raw, r.digitisation, r.range, r.offset))
        for r in reads
    ]
    return idx, reads, signals


def test_fast_mode_accuracy(setup):
    idx, reads, signals = setup
    mapper = Mapper(idx, CFG)
    recs = {r.read_name: r for r in mapper.streaming_map_fast(signals)}
    assert len(recs) == len(signals)
    mapped = correct = 0
    for r in reads:
        rec = recs[r.read_id]
        if not rec.is_mapped:
            continue
        mapped += 1
        lo = rec.fragment_start
        hi = rec.fragment_start + rec.fragment_length
        if rec.direction == r.strand and lo < r.ref_end and hi > r.ref_start:
            correct += 1
    assert mapped >= len(reads) - 2
    assert correct == mapped


def test_flat_engine_matches_kernel_engine(setup):
    """The one-stage hash-probe engine must produce the same mappings as
    the Pallas/interpret kernel engine (identical anchor sets feed the
    same chaining; only assembly order within a read differs and the
    per-read sort cancels that)."""
    import dataclasses

    idx, reads, signals = setup
    flat_cfg = dataclasses.replace(
        CFG, runtime=dataclasses.replace(
            CFG.runtime, search_impl="flat", flat_t_cap=1 << 20
        )
    )
    kern = {r.read_name: r for r in Mapper(idx, CFG).streaming_map_fast(
        signals)}
    flat = {r.read_name: r for r in Mapper(idx, flat_cfg).streaming_map_fast(
        signals)}
    assert set(kern) == set(flat)
    for name in kern:
        k, f = kern[name], flat[name]
        assert k.is_mapped == f.is_mapped, name
        if k.is_mapped:
            assert (k.ref_index, k.direction) == (f.ref_index, f.direction)
            assert k.fragment_start == f.fragment_start, name
            assert k.fragment_length == f.fragment_length, name
            assert k.mapq == f.mapq, name


def test_flat_search_matches_xla_search(setup):
    """search_round_flat's match set equals search_flat's exactly."""
    import jax.numpy as jnp

    from sigmap_tpu.mapping.seeding import (
        DeviceIndex, flatten_matches, pad_seeds, search_flat,
        search_round_flat,
    )

    idx, _, _ = setup
    dev = DeviceIndex.from_host(
        idx, CFG.mapping.search_radius, seeds_per_tile=32,
        cap_per_seed=8192, surv_per_tile=65536, matches_per_tile=16384,
    )
    rng = np.random.default_rng(3)
    W = np.asarray(dev.W8)
    pick = rng.integers(0, dev.n_windows, 100)
    q = (W[pick] + np.concatenate(
        [rng.normal(0, 0.1, (100, 6)), np.zeros((100, 2))], 1
    )).astype(np.float32)
    seeds, valid, n_tiles = pad_seeds(q, dev.params)
    out = search_flat(dev, jnp.asarray(seeds), jnp.asarray(valid), n_tiles)
    sids, widx, _, _, ovf = flatten_matches(out, dev.params)
    assert not ovf.any()
    ref = set(zip(sids.tolist(), widx.tolist()))

    sid, cand, d2, match, offs, _, sovf = search_round_flat(
        dev, jnp.asarray(seeds), jnp.asarray(valid), 1 << 19
    )
    assert not np.asarray(sovf).any()
    m = np.asarray(match)
    perm = np.asarray(dev.perm)
    got = set(zip(np.asarray(sid)[m].tolist(),
                  perm[np.asarray(cand)[m]].tolist()))
    assert got == ref


def test_fast_mode_loci_match_exact_mode(setup):
    idx, reads, signals = setup
    mapper = Mapper(idx, CFG)
    fast = {r.read_name: r for r in mapper.streaming_map_fast(signals)}
    exact = {r.read_name: r for r in mapper.streaming_map(signals)}
    both = 0
    for name in fast:
        f, e = fast[name], exact[name]
        if f.is_mapped and e.is_mapped:
            both += 1
            assert f.ref_index == e.ref_index, name
            assert f.direction == e.direction, name
            # same locus within a generous window (banded vs exact chains)
            assert abs(f.fragment_start - e.fragment_start) < 500, name
    assert both >= len(signals) - 2

"""Multi-chip sharded pipeline tests on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from sigmap_tpu.config import IndexConfig
from sigmap_tpu.index.build import build_index
from sigmap_tpu.io.fasta import ReferenceSequence
from sigmap_tpu.io.pore_model import make_synthetic_pore_model
from sigmap_tpu.io.signals import dac_to_pa
from sigmap_tpu.mapping.seeding import DeviceIndex
from sigmap_tpu.parallel.pipeline import (
    ShardedIndex, chunk_step, make_mesh, multichip_map_chunk_step,
)
from sigmap_tpu.synth import random_genome, simulate_reads

TILE_KW = dict(
    seeds_per_tile=16, cap_per_seed=4096, surv_per_tile=8192,
    matches_per_tile=4096,
)


@pytest.fixture(scope="module")
def setup(pore6):
    genome = random_genome(30_000, seed=9)
    seqs = [ReferenceSequence(n, c) for n, c in genome]
    idx = build_index(seqs, pore6, IndexConfig(), verbose=False)
    reads = simulate_reads(pore6, genome, 8, seed=10, read_bases=800)
    C = 4000
    chunks = np.zeros((8, C), np.float32)
    lengths = np.zeros(8, np.int32)
    for i, r in enumerate(reads):
        s = dac_to_pa(r.raw, r.digitisation, r.range, r.offset)[:C]
        chunks[i, : len(s)] = s
        lengths[i] = len(s)
    return idx, chunks, lengths


def test_single_chip_chunk_step(setup):
    idx, chunks, lengths = setup
    dev = DeviceIndex.from_host(idx, radius=0.08, **TILE_KW)
    out = np.asarray(
        chunk_step(dev, chunks, lengths, max_seeds=64, anchor_cap=1024)
    )
    assert out.shape == (8, 5)
    # most reads should produce a confident best chain
    assert (out[:, 0] > 10).sum() >= 6


@pytest.mark.parametrize("n_data,n_index", [(4, 2), (2, 4), (8, 1)])
def test_multichip_matches_single(setup, n_data, n_index):
    idx, chunks, lengths = setup
    if len(jax.devices()) < n_data * n_index:
        pytest.skip("needs 8 devices")
    dev = DeviceIndex.from_host(idx, radius=0.08, **TILE_KW)
    single = np.asarray(
        chunk_step(dev, chunks, lengths, max_seeds=64, anchor_cap=1024)
    )
    mesh = make_mesh(n_data, n_index)
    sharded = ShardedIndex.build(idx, n_index, radius=0.08, **TILE_KW).place(
        mesh
    )
    ch = jax.device_put(chunks, NamedSharding(mesh, P("data")))
    le = jax.device_put(lengths, NamedSharding(mesh, P("data")))
    multi = np.asarray(
        multichip_map_chunk_step(
            mesh, sharded, ch, le, max_seeds=64, anchor_cap=1024
        )
    )
    # best scores and loci agree with the single-chip step
    np.testing.assert_allclose(multi[:, 0], single[:, 0], atol=1e-3)
    np.testing.assert_allclose(multi[:, 3], single[:, 3], atol=0)


def test_sharded_index_covers_all_windows(setup):
    idx, _, _ = setup
    sh = ShardedIndex.build(idx, 4, radius=0.08, **TILE_KW)
    total = int((np.asarray(sh.win_group) >= 0).sum())
    assert total == idx.n_windows


def test_multihost_helpers(tmp_path):
    from sigmap_tpu.parallel.multihost import merge_host_paf, shard_files_for_host

    files = [f"f{i:02d}" for i in range(10)]
    s0 = shard_files_for_host(files, 0, 3)
    s1 = shard_files_for_host(files, 1, 3)
    s2 = shard_files_for_host(files, 2, 3)
    assert sorted(s0 + s1 + s2) == sorted(files)
    assert not (set(s0) & set(s1))

    p0 = tmp_path / "h0.paf"
    p1 = tmp_path / "h1.paf"
    p0.write_text("a\t1\n")
    p1.write_text("b\t2\nc\t3\n")
    out = tmp_path / "all.paf"
    n = merge_host_paf([str(p1), str(p0)], str(out))
    assert n == 3
    assert out.read_text().splitlines()[0] == "a\t1"  # rank-major order

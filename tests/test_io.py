"""Host I/O layer tests: FASTA, pore model (incl. rolling-hash quirk),
fast5/blow5/slow5 round-trips, pA conversion, PAF formatting."""

import numpy as np
import pytest

from sigmap_tpu.io.fasta import read_fasta, write_fasta
from sigmap_tpu.io.paf import (
    ChainsSummary, PAFRecord, PAFWriter, batch_tags, mapped_line,
    streaming_tags, unmapped_line,
)
from sigmap_tpu.io.pore_model import PoreModel, make_synthetic_pore_model
from sigmap_tpu.io.signals import dac_to_pa, load_all_read_signals
from sigmap_tpu.io.slow5 import (
    read_blow5, read_slow5_ascii, svb_decode, svb_encode, svb_zd_decode,
    svb_zd_encode, write_blow5, write_slow5,
)
from sigmap_tpu.synth import simulate_reads, random_genome
from sigmap_tpu.utils import encode_bases, revcomp_codes, seed_from_codes, rolling_kmer_codes


def test_encode_revcomp():
    codes = encode_bases("ACGTNacgt")
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3]
    rc = revcomp_codes(encode_bases("AACGTN"))
    # revcomp of AACGTN = NACGTT
    assert list(rc) == [4, 0, 1, 2, 3, 3]


def test_rolling_kmers_match_scalar_seed():
    codes = encode_bases("ACGTACGTNNACGT")
    k = 4
    rolled = rolling_kmer_codes(codes, k)
    for i in range(len(codes) - k + 1):
        assert rolled[i] == seed_from_codes(codes, i, k)


def test_fasta_roundtrip(tmp_path):
    path = str(tmp_path / "x.fa")
    write_fasta(path, [("chr1", "ACGT" * 50), ("chr2 extra", "TTTTGGGG")])
    seqs = read_fasta(path)
    assert [s.name for s in seqs] == ["chr1", "chr2"]
    assert seqs[0].seq_str() == "ACGT" * 50
    # negative strand of chr2 TTTTGGGG -> CCCCAAAA
    from sigmap_tpu.utils import CODE_TO_CHAR

    assert CODE_TO_CHAR[seqs[1].neg_codes].tobytes().decode() == "CCCCAAAA"


def test_pore_model_roundtrip_and_quirk(tmp_path):
    pm = make_synthetic_pore_model(k=3, seed=1)
    path = str(tmp_path / "m.model")
    pm.save(path)
    pm2 = PoreModel.load(path)
    assert pm2.k == 3
    np.testing.assert_allclose(pm.level_mean, pm2.level_mean, atol=1e-5)

    # expected_signal reproduces the reference rolling-hash off-by-one
    # (pore_model.cc:70-79): out[i>=1] uses the k-mer starting at i+1.
    codes = encode_bases("ACGTAC")
    sig = pm.expected_signal(codes)
    assert len(sig) == 4

    def kmer_idx(s):
        v = 0
        for c in s:
            v = v * 4 + "ACGT".index(c)
        return v

    assert sig[0] == pm.level_mean[kmer_idx("ACG")]
    assert sig[1] == pm.level_mean[kmer_idx("GTA")]   # not CGT!
    assert sig[2] == pm.level_mean[kmer_idx("TAC")]
    # last entry shifts in a virtual 'A' past the end
    assert sig[3] == pm.level_mean[kmer_idx("ACA")]


def test_dac_to_pa_drops_out_of_range():
    raw = np.array([0, 100, 30000, -5000], dtype=np.int16)
    # scale=0.1, offset=10 -> pa = [1, 11, 3001, -499] -> none in (30,200)
    pa = dac_to_pa(raw, 1000.0, 100.0, 10.0)
    assert len(pa) == 0
    raw = np.array([500, 900, 2500], dtype=np.int16)
    pa = dac_to_pa(raw, 1000.0, 100.0, 10.0)  # [51, 91, 251] -> drop 251
    np.testing.assert_allclose(pa, [51.0, 91.0], atol=1e-4)


def test_svb_roundtrip(rng):
    vals = rng.integers(0, 2**28, size=1001).astype(np.uint32)
    vals[:10] = [0, 1, 255, 256, 65535, 65536, 2**24 - 1, 2**24, 77, 3]
    dec = svb_decode(svb_encode(vals), len(vals))
    np.testing.assert_array_equal(vals, dec)


def test_svb_zd_roundtrip(rng):
    sig = rng.integers(-2000, 2000, size=4321).astype(np.int16)
    dec = svb_zd_decode(svb_zd_encode(sig), len(sig))
    np.testing.assert_array_equal(sig, dec)


@pytest.mark.parametrize("rec_comp,sig_comp", [(0, 0), (1, 1), (2, 1)])
def test_blow5_roundtrip(tmp_path, rec_comp, sig_comp, pore6):
    genome = random_genome(20_000, seed=3)
    reads = simulate_reads(pore6, genome, 3, seed=5, read_bases=200)
    path = str(tmp_path / "r.blow5")
    write_blow5(
        path,
        [r.__dict__ for r in reads],
        rec_comp=rec_comp,
        sig_comp=sig_comp,
    )
    loaded = read_blow5(path)
    assert [s.read_id for s in loaded] == [r.read_id for r in reads]
    for s, r in zip(loaded, reads):
        expect = dac_to_pa(r.raw, r.digitisation, r.range, r.offset)
        np.testing.assert_allclose(s.pa, expect, atol=1e-4)


def test_blow5_frozen_byte_fixture(tmp_path):
    """Decode the hand-assembled tests/golden/minimal.blow5 (bytes written
    longhand from the SLOW5 spec constants in make_blow5_fixture.py,
    independent of io/slow5.py), its ASCII .slow5 twin, and assert our own
    writer reproduces the frozen bytes exactly."""
    import os

    here = os.path.join(os.path.dirname(__file__), "golden")
    blow5_path = os.path.join(here, "minimal.blow5")
    slow5_path = os.path.join(here, "minimal.slow5")
    raw = np.array([10, 12, 9, 9, 500], np.int16)
    expect = dac_to_pa(raw, 8192.0, 1500.0, 10.0)

    loaded_b = read_blow5(blow5_path)
    assert len(loaded_b) == 1 and loaded_b[0].read_id == "r001"
    np.testing.assert_allclose(loaded_b[0].pa, expect, rtol=1e-6)

    loaded_a = read_slow5_ascii(slow5_path)
    assert len(loaded_a) == 1 and loaded_a[0].read_id == "r001"
    np.testing.assert_array_equal(loaded_a[0].pa, loaded_b[0].pa)

    # writer regression anchor: byte-for-byte equality with the fixture
    out = str(tmp_path / "re.blow5")
    write_blow5(
        out,
        [{"read_id": "r001", "raw": raw, "digitisation": 8192.0,
          "range": 1500.0, "offset": 10.0, "sampling_rate": 4000.0}],
        rec_comp=0, sig_comp=1,
    )
    with open(out, "rb") as f_new, open(blow5_path, "rb") as f_ref:
        assert f_new.read() == f_ref.read()


def test_slow5_ascii_roundtrip(tmp_path, pore6):
    genome = random_genome(20_000, seed=3)
    reads = simulate_reads(pore6, genome, 2, seed=6, read_bases=150)
    path = str(tmp_path / "r.slow5")
    write_slow5(path, [r.__dict__ for r in reads])
    loaded = read_slow5_ascii(path)
    assert len(loaded) == 2
    for s, r in zip(loaded, reads):
        expect = dac_to_pa(r.raw, r.digitisation, r.range, r.offset)
        np.testing.assert_allclose(s.pa, expect, atol=1e-4)


def test_load_all_read_signals_dir(tmp_path, pore6):
    from sigmap_tpu.io.fast5 import write_multi_fast5

    genome = random_genome(20_000, seed=3)
    reads = simulate_reads(pore6, genome, 4, seed=8, read_bases=120)
    sub = tmp_path / "sub"
    sub.mkdir()
    write_multi_fast5(str(tmp_path / "a.fast5"), [r.__dict__ for r in reads[:2]])
    write_blow5(str(sub / "b.blow5"), [r.__dict__ for r in reads[2:]])
    signals = load_all_read_signals(str(tmp_path))
    assert sorted(s.read_id for s in signals) == sorted(r.read_id for r in reads)


def test_fast5_roundtrip(tmp_path, pore6):
    from sigmap_tpu.io.fast5 import read_fast5, write_multi_fast5

    genome = random_genome(20_000, seed=3)
    reads = simulate_reads(pore6, genome, 2, seed=9, read_bases=100)
    path = str(tmp_path / "x.fast5")
    write_multi_fast5(path, [r.__dict__ for r in reads])
    loaded = read_fast5(path)
    assert {s.read_id for s in loaded} == {r.read_id for r in reads}


def test_paf_formatting():
    rec = PAFRecord(
        read_id=0, read_name="r1", read_length=1234, read_start=10,
        read_end=500, ref_index=0, fragment_start=1000, fragment_length=491,
        mapq=60, direction=1,
        tags="mt:f:1.500000\tci:i:2\tsl:i:1234",
    )
    line = mapped_line(rec, "chr1", 99999)
    cols = line.rstrip("\n").split("\t")
    assert cols[:12] == [
        "r1", "1234", "10", "500", "+", "chr1", "99999", "1000", "1491",
        "1234", "491", "60",
    ]
    un = PAFRecord(
        read_id=1, read_name="r2", read_length=55, read_start=0, read_end=0,
        ref_index=0, fragment_start=0, fragment_length=0, mapq=61, direction=0,
        tags="mt:f:0.100000",
    )
    uline = unmapped_line(un)
    assert uline.count("*") == 9
    assert "\t61\t" in uline


def test_tag_strings():
    s = ChainsSummary(12, 3, 45.5, 30.25, 25.0, 0.01, -8.5, 7.25)
    t = streaming_tags(1.5, 3, 4000, s)
    assert t.split("\t") == [
        "mt:f:1.500000", "ci:i:3", "sl:i:4000", "cm:i:12", "nc:i:3",
        "s1:f:45.500000", "s2:f:30.250000", "sm:f:25.000000",
        "ad:f:0.010000", "at:f:-8.500000", "aq:f:7.250000",
    ]
    # unmapped batch-mode tags use integer zeros (sigmap.cc:522-524)
    t2 = batch_tags(0.5, 100, None)
    assert t2 == "mt:f:0.500000\tsl:i:100\tcm:i:0\ts1:f:0\ts2:f:0"


def test_paf_writer_groups_by_ref(tmp_path):
    w = PAFWriter(str(tmp_path / "o.paf"), ["a", "b"], [100, 200])
    w.append(PAFRecord(0, "r0", 10, 0, 5, 1, 20, 6, 60, 1, "x:i:1"))
    w.append(PAFRecord(1, "r1", 10, 0, 5, 0, 20, 6, 60, 0, "x:i:2"))
    n = w.finalize()
    assert n == 2
    lines = open(tmp_path / "o.paf").read().splitlines()
    assert lines[0].startswith("r1\t")  # ref 'a' group first
    assert lines[1].startswith("r0\t")

"""Debug/dormant modes: DTWAlign, CWTAlign, dump helpers, CWT pipeline."""

import numpy as np

from sigmap_tpu import debug_modes
from sigmap_tpu.io.fast5 import write_multi_fast5
from sigmap_tpu.ops.cwt import (
    cwt_dog, cwt_feature_signal, generate_peaks, mad_normalize, npad_for,
)
from sigmap_tpu.synth import genome_to_fasta_str, random_genome, simulate_reads


def _workload(tmp_path, pore6, n=2, bases=300, genome_len=5000):
    genome = random_genome(genome_len, seed=31)
    (tmp_path / "ref.fa").write_text(genome_to_fasta_str(genome))
    pore6.save(str(tmp_path / "pore.model"))
    reads = simulate_reads(pore6, genome, n, seed=32, read_bases=bases)
    sig = tmp_path / "sigs"
    sig.mkdir(exist_ok=True)
    write_multi_fast5(str(sig / "r.fast5"), [r.__dict__ for r in reads])
    return genome, reads


def test_npad_and_dog():
    assert npad_for(4000) == 8192
    assert npad_for(5) == 8
    d = cwt_dog(np.sin(np.linspace(0, 20, 256)).astype(np.float32), 2.0)
    assert d.shape == (256,)
    assert np.isfinite(d).all()
    # DOG responds to edges: a step signal has extreme response near the step
    step = np.zeros(256, np.float32)
    step[128:] = 1.0
    r = cwt_dog(step, 2.0)
    # (zero-padding injects a second edge at the pad boundary, like the
    # reference's cwavelet, so the contrast is modest)
    assert np.abs(r[120:136]).max() > np.abs(r[:100]).max() * 1.5


def test_mad_and_peaks():
    x = np.array([1, 2, 3, 4, 100, 4, 3, 2, 1], np.float32)
    m = mad_normalize(x)
    assert np.isfinite(m).all()
    sig = np.sin(np.linspace(0, 12 * np.pi, 300)).astype(np.float32)
    peaks, pos = generate_peaks(sig, 0.5)
    assert len(peaks) >= 10
    # alternating peaks/valleys
    assert (np.diff(pos) > 0).all()


def test_cwt_feature_signal(pore6):
    genome = random_genome(3000, seed=1)
    sig = pore6.expected_signal(genome[0][1]).astype(np.float32)
    feats, pos = cwt_feature_signal(sig, 1.0)
    assert len(feats) == len(pos)
    assert len(feats) > 50


def test_dtw_align_mode(tmp_path, pore6):
    genome, reads = _workload(tmp_path, pore6, n=1, bases=100, genome_len=800)
    res = debug_modes.dtw_align(
        str(tmp_path / "ref.fa"), str(tmp_path / "pore.model"),
        str(tmp_path / "sigs"),
    )
    assert len(res) == 1
    _, _, dist, end = res[0]
    assert np.isfinite(dist) and end > 0


def test_cwt_align_mode(tmp_path, pore6):
    genome, reads = _workload(tmp_path, pore6, n=1, bases=120, genome_len=1000)
    res = debug_modes.cwt_align(
        str(tmp_path / "ref.fa"), str(tmp_path / "pore.model"),
        str(tmp_path / "sigs"),
    )
    assert len(res) == 1
    assert res[0][4] >= 0  # rough end position mapped back


def test_dump_modes(tmp_path, pore6):
    _workload(tmp_path, pore6, n=2, bases=150, genome_len=2000)
    p1 = debug_modes.fast5_to_text(str(tmp_path / "sigs"), str(tmp_path / "o"))
    lines = open(p1).read().splitlines()
    assert len(lines) > 100
    float(lines[0])
    p2 = debug_modes.events_to_text(str(tmp_path / "sigs"), str(tmp_path / "o"))
    lines2 = open(p2).read().splitlines()
    assert len(lines2) > 20
    float(lines2[0])

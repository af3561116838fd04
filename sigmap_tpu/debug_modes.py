"""Debug/experimental entry points mirroring the reference's dormant modes.

These are the compiled-but-not-dispatched paths of the reference driver
(sigmap.cc:1499-1504): DTWAlign (sigmap.cc:882-930), CWTAlign
(sigmap.cc:932-997), FAST5ToText (sigmap.cc:1236-1257), EventsToText
(sigmap.cc:1198-1234).
"""

from __future__ import annotations

import sys

import numpy as np

from .config import SigmapConfig
from .io.fasta import read_fasta
from .io.pore_model import PoreModel
from .io.signals import load_all_read_signals
from .ops.cwt import cwt_feature_signal
from .ops.sdtw import sdtw_np
from .signal import events_ref


def _reference_signals(ref_path: str, pore_path: str):
    pore = PoreModel.load(pore_path)
    seqs = read_fasta(ref_path)
    return seqs, [pore.expected_signal(s.codes) for s in seqs]


def dtw_align(ref_path: str, pore_path: str, sig_dir: str, out=sys.stderr):
    """Whole-signal sDTW of every read against every reference
    (sigmap.cc:882-930).  Uses the device scan kernel when signals are
    large, the exact recurrence otherwise."""
    from .index.build import zscore_f64

    seqs, ref_sigs = _reference_signals(ref_path, pore_path)
    signals = load_all_read_signals(sig_dir)
    results = []
    for s in signals:
        read_norm = zscore_f64(s.pa)
        for seq, rsig in zip(seqs, ref_sigs):
            ref_norm = zscore_f64(rsig)
            dist, end = sdtw_np(ref_norm, read_norm)
            print(
                f"Read name: {s.read_id}, reference name: {seq.name}\n"
                f"DTW distance: {dist}, mapping_end_position: {end}.",
                file=out,
            )
            results.append((s.read_id, seq.name, dist, end))
    return results


def cwt_align(ref_path: str, pore_path: str, sig_dir: str,
              cwt_scale0: float = 1.0, out=sys.stderr):
    """CWT-feature sDTW (sigmap.cc:932-997): reference features at scale0,
    read features at 8*scale0."""
    seqs, ref_sigs = _reference_signals(ref_path, pore_path)
    ref_feats = [cwt_feature_signal(rs, cwt_scale0) for rs in ref_sigs]
    signals = load_all_read_signals(sig_dir)
    results = []
    for s in signals:
        feats, _pos = cwt_feature_signal(s.pa, 8 * cwt_scale0)
        for seq, (rf, rpos) in zip(seqs, ref_feats):
            dist, end = sdtw_np(rf, feats)
            rough = int(rpos[end - 1]) if 0 < end <= len(rpos) else -1
            print(
                f"Read name: {s.read_id}, reference name: {seq.name}\n"
                f"DTW distance: {dist}, feature_mapping_end_position: {end}, "
                f"rough mapping end postion: {rough}.",
                file=out,
            )
            results.append((s.read_id, seq.name, dist, end, rough))
    return results


def fast5_to_text(sig_dir: str, output_prefix: str) -> str:
    """Dump raw pA samples, one per line (sigmap.cc:1236-1257)."""
    path = output_prefix + "_fast5"
    with open(path, "w") as f:
        for s in load_all_read_signals(sig_dir):
            for v in s.pa:
                f.write(f"{v:.6f}\n".replace("-0.000000", "0.000000"))
    return path


def events_to_text(sig_dir: str, output_prefix: str,
                   config: SigmapConfig = SigmapConfig()) -> str:
    """Dump z-scored event means, one per line (sigmap.cc:1198-1234)."""
    path = output_prefix + "_event"
    with open(path, "w") as f:
        for s in load_all_read_signals(sig_dir):
            ps, pss = events_ref.prefix_sums(s.pa)
            L = len(s.pa)
            t1 = events_ref.tstat_centered(s.pa, L, config.event.window_length1)
            t2 = events_ref.tstat_centered(s.pa, L, config.event.window_length2)
            peaks = events_ref.detect_peaks(t1, t2, L, config.event)
            _, means, _ = events_ref.events_from_peaks(
                peaks, ps, pss, L, signal=s.pa
            )
            norm = events_ref.zscore(means)
            for v in norm:
                f.write(f"{v:.6f}\n")
    return path

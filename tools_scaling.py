#!/usr/bin/env python
"""Multi-process scaling measurement on the CPU mesh -> SCALING.json.

BASELINE.md's multi-host target (>= 80% efficiency at 2 hosts) cannot be
measured on real hardware here (one TPU chip, no pod slice), so this tool
produces the honest CPU-mesh proxy: the SAME fixed workload mapped by the
sharded turbo engine (jax.distributed, the production multi-host path of
tests/multihost_worker.py) at

  * 1 process pinned to 1 host core   (sched_setaffinity, timed phase)
  * 2 processes pinned to 1 core each (timed phase only: whole-process
    pinning starves the jax.distributed heartbeat during compiles)

so each process adds real compute, the way each host would in a pod.
Strong-scaling efficiency = T1 / (T2 * 2) ... except the workload is
fixed, so speedup = T1/T2 and efficiency = speedup / nprocs.

Every process runs one warmup pass (jit compile) before the timed pass;
only the timed mapping phase is compared.  Reference analogue: the OpenMP
taskloop fan-out this engine replaces (/root/reference/src/sigmap.cc:617-631).

Usage: python tools_scaling.py [--reads 64] [--genome-kb 1000] [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

WORKER = r"""
import os, sys, time, dataclasses
rank = int(sys.argv[1]); nprocs = int(sys.argv[2]); coord = sys.argv[3]
reads_n = int(sys.argv[4]); genome_kb = int(sys.argv[5]); batch = int(sys.argv[6])
os.environ["JAX_PLATFORMS"] = "cpu"
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=2"])
sys.path.insert(0, %(here)r)
import jax
jax.config.update("jax_platforms", "cpu")
from sigmap_tpu.parallel.multihost import initialize_distributed
if nprocs > 1:
    initialize_distributed(coord, nprocs, rank)
import numpy as np
from jax.sharding import Mesh
from sigmap_tpu.config import SigmapConfig
from sigmap_tpu.index.build import build_index
from sigmap_tpu.io.fasta import ReferenceSequence
from sigmap_tpu.io.pore_model import make_synthetic_pore_model
from sigmap_tpu.io.signals import ReadSignal, dac_to_pa
from sigmap_tpu.mapping.turbo import TurboParams
from sigmap_tpu.parallel.turbo_shard import TurboShardMapper
from sigmap_tpu.synth import random_genome, simulate_reads

cfg = SigmapConfig()
pore = make_synthetic_pore_model(k=6, seed=0)
genome = random_genome(genome_kb * 1000, seed=21)
seqs = [ReferenceSequence(n, c) for n, c in genome]
idx = build_index(seqs, pore, cfg.index, cfg.mapping.search_radius, verbose=False)
reads = simulate_reads(pore, genome, reads_n, seed=6, read_bases=2200)
signals = [ReadSignal(r.read_id, r.digitisation, r.range, r.offset,
                      dac_to_pa(r.raw, r.digitisation, r.range, r.offset))
           for r in reads]
cfg = dataclasses.replace(cfg, runtime=dataclasses.replace(cfg.runtime, read_batch=batch))
# data axis = one shard per process's devices; index replicated
mesh = Mesh(np.array(jax.devices()).reshape(2 * nprocs, 1), ("data", "index"))
p = TurboParams(S=256, K=32, RING=64, TILE=256, peaks_impl="scan")
tm = TurboShardMapper(idx, cfg, mesh, p)
recs = tm.streaming_map(signals[:batch])          # warmup (compile)
# pin ONLY the timed phase to this rank's core: pinning the whole
# process starves the jax.distributed heartbeat during the minutes-long
# single-core compile and kills the cohort
if nprocs > 1:
    os.sched_setaffinity(0, {rank %% os.cpu_count()})
else:
    os.sched_setaffinity(0, {0})
t0 = time.perf_counter()
records = tm.streaming_map(signals)
elapsed = time.perf_counter() - t0
os.sched_setaffinity(0, set(range(os.cpu_count())))
n_mapped = sum(r.is_mapped for r in records)
print(f"SCALEOUT rank={rank} nprocs={nprocs} elapsed={elapsed:.3f} "
      f"mapped={n_mapped}/{len(records)}", flush=True)
"""


def free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_config(nprocs: int, reads: int, genome_kb: int, batch: int) -> dict:
    coord = f"localhost:{free_port()}"
    workdir = "/tmp/sigmap_scaling"
    os.makedirs(workdir, exist_ok=True)
    wpath = os.path.join(workdir, "worker.py")
    with open(wpath, "w") as f:
        f.write(WORKER % {"here": HERE})
    procs = []
    for rank in range(nprocs):
        cmd = [sys.executable, wpath,
               str(rank), str(nprocs), coord, str(reads), str(genome_kb),
               str(batch)]
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True
        ))
    outs = [p.communicate(timeout=3600)[0] for p in procs]
    elapsed = None
    mapped = None
    for out, p in zip(outs, procs):
        if p.returncode != 0:
            raise RuntimeError(f"nprocs={nprocs} worker failed:\n{out[-3000:]}")
        for line in out.splitlines():
            if line.startswith("SCALEOUT rank=0"):
                parts = dict(kv.split("=") for kv in line.split()[1:])
                elapsed = float(parts["elapsed"])
                mapped = parts["mapped"]
    return {"nprocs": nprocs, "elapsed_s": elapsed, "mapped": mapped}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=64)
    ap.add_argument("--genome-kb", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    t0 = time.time()
    r1 = run_config(1, args.reads, args.genome_kb, args.batch)
    print(f"1-proc: {r1}", file=sys.stderr, flush=True)
    r2 = run_config(2, args.reads, args.genome_kb, args.batch)
    print(f"2-proc: {r2}", file=sys.stderr, flush=True)
    speedup = r1["elapsed_s"] / r2["elapsed_s"]
    eff = speedup / 2
    result = {
        "metric": "scaling_2proc",
        "speedup": round(speedup, 3),
        "efficiency": round(eff, 3),
        "config": {"reads": args.reads, "genome_kb": args.genome_kb,
                   "batch": args.batch,
                   "note": "fixed workload, 1 core per process (timed phase "
                           "affinity), jax.distributed CPU mesh proxy "
                           "for 2 hosts"},
        "t1_s": round(r1["elapsed_s"], 3),
        "t2_s": round(r2["elapsed_s"], 3),
        "mapped_1p": r1["mapped"],
        "mapped_2p": r2["mapped"],
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(HERE, "SCALING.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

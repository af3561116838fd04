"""Local chipless AOT compile-check for all TPU kernels (no tunnel needed).

Catches Mosaic lowering errors without touching the (fragile) axon session.
Run: python tools_aot_check.py          # all kernels, isolated subprocesses
     python tools_aot_check.py NAME     # single kernel in-process

NOTE: the dispatcher process must not initialize jax/libtpu itself -
children crash on libtpu lockfile contention - so all jax imports live
inside run_one().
"""
import os
import sys


def run_one(which):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault(
        "TPU_LIBRARY_PATH",
        "/opt/venv/lib/python3.12/site-packages/libtpu/libtpu.so",
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc(
        "v5e:1x1x1", "tpu", chips_per_host_bounds=[1, 1, 1]
    )
    mesh = Mesh(np.array(topo.devices), ("x",))
    SH = NamedSharding(mesh, P())

    def check(name, fn, *shapes, **kw):
        import traceback
        try:
            args = [
                jax.ShapeDtypeStruct(s, d) if d is not None else s
                for (s, d) in shapes
            ]
            in_sh = jax.tree.map(lambda _: SH, tuple(args))
            jax.jit(fn, in_shardings=in_sh, out_shardings=SH, **kw).lower(
                *args
            ).compile()
            print(f"OK   {name}", flush=True)
            return True
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"FAIL {name}: {msg}", flush=True)
            if os.environ.get("AOT_VERBOSE"):
                traceback.print_exc()
            return False

    ok = True
    f32, i32, b1 = jnp.float32, jnp.int32, jnp.bool_

    def want(name):
        return which in (None, "all") or which == name

    from sigmap_tpu.config import ChainingConfig, EventDetectorConfig
    from sigmap_tpu.signal.events_pallas import detect_peaks_pallas
    if want("events_peaks_pallas"): ok &= check(
        "events_peaks_pallas", lambda a, b, l: detect_peaks_pallas(a, b, l),
        (((128, 4000)), f32), (((128, 4000)), f32), (((128,)), i32),
    )

    from sigmap_tpu.ops.sdtw_kernel import sdtw_pallas
    if want("sdtw_kernel"): ok &= check(
        "sdtw_kernel", lambda t, tl, q, ql: sdtw_pallas(t, tl, q, ql),
        ((128, 2048), f32), ((128,), i32), ((128, 512), f32), ((128,), i32),
    )

    from sigmap_tpu.signal.events import batch_generate_events
    if want("batch_generate_events"): ok &= check(
        "batch_generate_events(pallas)",
        lambda c, l: batch_generate_events(c, l, peaks_impl="pallas"),
        ((128, 4000), f32), ((128,), i32),
    )

    from sigmap_tpu.ops.sweep_kernel import sweep_search
    TILE = 1024
    NO = 27   # span-3 probes over bd-1 = 3 dims (index/sweep.py)
    if want("sweep_kernel"): ok &= check(
        "sweep_kernel",
        lambda bm, s, t, m: sweep_search(s, bm, t, m, radius=0.08, K=8,
                                         TILE=TILE),
        ((1024, 2 * NO + 1), i32), ((131072, 8), f32),
        ((23000, 8, TILE), f32), ((23000, 8, TILE // 8), i32),
    )

    from sigmap_tpu.config import ChainingConfig
    from sigmap_tpu.ops.chain_fused import chain_fused
    A, CARRY, B = 256 + 2048, 256, 512
    if want("chain_fused"): ok &= check(
        "chain_fused",
        lambda t, q, d, g, cs, c1, c2, c3, c4: chain_fused(
            t, q, d, g, cs, c1, c2, c3, c4, radius=0.08, ring=CARRY, kb=8,
        ),
        ((A, B), i32), ((A, B), i32), ((A, B), f32), ((A, B), i32),
        ((CARRY, B), f32), ((CARRY, B), i32), ((CARRY, B), i32),
        ((CARRY, B), i32), ((CARRY, B), f32),
    )

    print("ALL OK" if ok else "FAILURES PRESENT", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else None
    if which is None:
        import subprocess
        names = ["events_peaks_pallas", "sdtw_kernel",
                 "batch_generate_events", "sweep_kernel", "chain_fused"]
        rc = 0
        for n in names:
            r = subprocess.run([sys.executable, __file__, n],
                               capture_output=True, text=True)
            out = [l for l in (r.stdout + r.stderr).splitlines()
                   if l.startswith(("OK", "FAIL"))]
            if out:
                print("\n".join(out), flush=True)
            if r.returncode != 0:
                if not out:
                    print(f"CRASH {n}: rc={r.returncode}", flush=True)
                rc = 1
        sys.exit(rc)
    sys.exit(run_one(which))

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

    from sigmap_tpu.ops.chain_kernel import chain_scores_banded_pallas
    if want("chain_kernel"): ok &= check(
        "chain_kernel",
        lambda t, q, d, g, v: chain_scores_banded_pallas(
            t, q, d, g, v, 0.08
        ),
        ((128, 8192), i32), ((128, 8192), i32), ((128, 8192), f32),
        ((128, 8192), i32), ((128, 8192), b1),
    )

    from sigmap_tpu.ops.sdtw_kernel import sdtw_pallas
    if want("sdtw_kernel"): ok &= check(
        "sdtw_kernel", lambda t, tl, q, ql: sdtw_pallas(t, tl, q, ql),
        ((128, 2048), f32), ((128,), i32), ((128, 512), f32), ((128,), i32),
    )

    from sigmap_tpu.ops.range_search_kernel import range_search_pallas
    R = 81
    if want("range_search_kernel"): ok &= check(
        "range_search_kernel",
        lambda s, l, q, w: range_search_pallas(s, l, q, w, 0.08, R=R),
        ((6400, R), i32), ((6400, R), i32), ((6400, 8), f32),
        ((8, 2_000_000), f32),
    )

    from sigmap_tpu.signal.events import batch_generate_events
    if want("batch_generate_events"): ok &= check(
        "batch_generate_events(pallas)",
        lambda c, l: batch_generate_events(c, l, peaks_impl="pallas"),
        ((128, 4000), f32), ((128,), i32),
    )

    from sigmap_tpu.mapping.seeding import (
        DeviceIndex, SearchParams, search_flat_kernel,
    )
    # synthetic tiny device index with realistic shapes
    nw = 1_000_000
    dev = DeviceIndex(
        W4=jax.ShapeDtypeStruct((nw, 4), f32),
        W8=jax.ShapeDtypeStruct((nw, 8), f32),
        WT=jax.ShapeDtypeStruct((8, nw + 2048), f32),
        perm=jax.ShapeDtypeStruct((nw,), i32),
        win_group=jax.ShapeDtypeStruct((nw,), i32),
        win_pos=jax.ShapeDtypeStruct((nw,), i32),
        cell_keys=jax.ShapeDtypeStruct((100_000,), i32),
        cell_starts=jax.ShapeDtypeStruct((100_001,), i32),
        htbl=jax.ShapeDtypeStruct((1 << 17, 4, 3), i32),
        pos_sorted=jax.ShapeDtypeStruct((nw,), i32),
        group_sorted=jax.ShapeDtypeStruct((nw,), i32),
        n_windows=nw,
        params=SearchParams(),
        hash_bits=17,
    )
    if want("search_flat_kernel"): ok &= check(
        "search_flat_kernel",
        lambda d, s, v: search_flat_kernel(d, s, v),
        (dev, None), ((6400, 8), f32), ((6400,), b1),
    )

    from sigmap_tpu.mapping.fast_round import fast_round
    B = 64
    if want("fast_round"): ok &= check(
        "fast_round(kernels)",
        lambda d, c, l, ct, cq, cd, cg, o, r: fast_round(
            d, c, l, ct, cq, cd, cg, o, r,
            peaks_impl="pallas", chain_impl="pallas",
        ),
        (dev, None), ((B, 4000), f32), ((B,), i32),
        ((B, 512), i32), ((B, 512), i32), ((B, 512), f32), ((B, 512), i32),
        ((B,), i32), ((B,), b1),
    )
    print("ALL OK" if ok else "FAILURES PRESENT", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else None
    if which is None:
        import subprocess
        names = ["events_peaks_pallas", "chain_kernel", "sdtw_kernel",
                 "range_search_kernel", "batch_generate_events",
                 "search_flat_kernel", "fast_round"]
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

#!/usr/bin/env python
"""Microbenchmarks that calibrate the TPU search redesign."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, *args, reps=5, label=""):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1000:.2f} ms", file=sys.stderr)
    return dt


def main():
    rng = np.random.default_rng(0)
    N = 4_000_000
    W = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    Wb = W.astype(jnp.bfloat16)

    # 1. random row gather: 4M rows of 32B
    idx = jnp.asarray(rng.integers(0, N, 4_000_000).astype(np.int32))
    g = jax.jit(lambda w, i: w[i].sum())
    dt = t(g, W, idx, label="gather 4M x 32B rows")
    print(f"  -> {4e6*32/dt/1e9:.2f} GB/s", file=sys.stderr)

    idx2 = jnp.asarray(rng.integers(0, N, 500_000).astype(np.int32))
    dt = t(g, W, idx2, label="gather 500k x 32B rows")
    print(f"  -> {5e5*32/dt/1e9:.2f} GB/s", file=sys.stderr)

    # small-table gather
    T = jnp.asarray(rng.normal(size=(65536, 8)).astype(np.float32))
    idxs = jnp.asarray(rng.integers(0, 65536, 4_000_000).astype(np.int32))
    dt = t(g, T, idxs, label="gather 4M rows from 64k-row table")
    print(f"  -> {4e6*32/dt/1e9:.2f} GB/s", file=sys.stderr)

    # 2. 1-D value gather (not rows)
    V = W[:, 0]
    g1 = jax.jit(lambda w, i: w[i].sum())
    dt = t(g1, V, idx, label="gather 4M x 4B scalars")
    print(f"  -> {4e6*4/dt/1e9:.2f} GB/s", file=sys.stderr)

    # 3. brute-force distance filter via matmul K=8, bf16, chunked
    Q = 1024
    q = jnp.asarray(rng.normal(size=(Q, 8)).astype(np.float32))
    wsq = (W * W).sum(axis=1)

    @jax.jit
    def brute_count(q, W, wsq):
        qb = q.astype(jnp.bfloat16)
        qsq = (q * q).sum(axis=1)

        def chunk(carry, i):
            wb = jax.lax.dynamic_slice_in_dim(Wb, i * 262144, 262144, 0)
            ws = jax.lax.dynamic_slice_in_dim(wsq, i * 262144, 262144, 0)
            acc = jax.lax.dot_general(
                qb, wb.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            d2 = qsq[:, None] + ws[None, :] - 2.0 * acc
            return carry + (d2 < 0.08).sum(), None

        c, _ = jax.lax.scan(chunk, jnp.int32(0),
                            jnp.arange(N // 262144, dtype=jnp.int32))
        return c

    dt = t(brute_count, q, W, wsq, label=f"brute bf16 matmul {Q}x{N}x8")
    print(f"  -> {2*Q*N*8/dt/1e12:.2f} TFLOP/s eff", file=sys.stderr)

    # 3b. same but f32 highest precision
    @jax.jit
    def brute_f32(q, W, wsq):
        qsq = (q * q).sum(axis=1)

        def chunk(carry, i):
            w = jax.lax.dynamic_slice_in_dim(W, i * 262144, 262144, 0)
            ws = jax.lax.dynamic_slice_in_dim(wsq, i * 262144, 262144, 0)
            acc = jax.lax.dot_general(
                q, w.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            d2 = qsq[:, None] + ws[None, :] - 2.0 * acc
            return carry + (d2 < 0.08).sum(), None

        c, _ = jax.lax.scan(chunk, jnp.int32(0),
                            jnp.arange(N // 262144, dtype=jnp.int32))
        return c

    dt = t(brute_f32, q, W, wsq, label=f"brute f32-highest matmul {Q}x{N}x8")
    print(f"  -> {2*Q*N*8/dt/1e12:.2f} TFLOP/s eff", file=sys.stderr)

    # 4. sorts
    for B, A in ((256, 8192), (64, 8192)):
        ks = jnp.asarray(rng.integers(0, 1 << 30, (B, A)).astype(np.int32))
        v1 = jnp.asarray(rng.integers(0, 1 << 30, (B, A)).astype(np.int32))
        v2 = jnp.asarray(rng.normal(size=(B, A)).astype(np.float32))
        s = jax.jit(lambda k, a, b: jax.lax.sort((k, a, b), dimension=1,
                                                 num_keys=1))
        t(s, ks, v1, v2, label=f"sort [{B},{A}] 1key+2vals")
    k1 = jnp.asarray(rng.integers(0, 1 << 30, 4_000_000).astype(np.int32))
    v1 = jnp.asarray(rng.integers(0, 1 << 30, 4_000_000).astype(np.int32))
    s1 = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    t(s1, k1, v1, label="sort 4M 1key+1val")
    k2 = k1[:1_000_000]
    v2 = v1[:1_000_000]
    t(s1, k2, v2, label="sort 1M 1key+1val")

    # 5. cumsum over 4M
    c = jax.jit(lambda x: jnp.cumsum(x))
    t(c, v1, label="cumsum 4M i32")

    # 6. scatter 4M rows (the .at[].set pattern)
    tgt = jnp.zeros((4_000_000,), jnp.float32)
    sc = jax.jit(lambda t_, i, v: t_.at[i].set(v, mode="drop"))
    t(sc, tgt, idx, V, label="scatter 4M f32")

    # 7. dynamic_slice streaming read of whole DB
    @jax.jit
    def stream(W):
        def chunk(carry, i):
            w = jax.lax.dynamic_slice_in_dim(W, i * 262144, 262144, 0)
            return carry + w.sum(), None
        c, _ = jax.lax.scan(chunk, jnp.float32(0),
                            jnp.arange(N // 262144, dtype=jnp.int32))
        return c
    dt = t(stream, W, label="stream 4M x 32B via scan")
    print(f"  -> {4e6*32/dt/1e9:.2f} GB/s", file=sys.stderr)


if __name__ == "__main__":
    main()

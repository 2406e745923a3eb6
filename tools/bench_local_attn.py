#!/usr/bin/env python
"""Micro-bench: one local-attention op at the paper shape, XLA vs
Pallas flash kernel, fwd and fwd+bwd."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, steps=30, warmup=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / steps


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=6)
    p.add_argument("--h", type=int, default=16)
    p.add_argument("--n", type=int, default=1401)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--window", type=int, default=420)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from synthanatomy_tpu.ops.local_attention import local_attention
    from synthanatomy_tpu.ops.local_attention_pallas import local_attention_flash

    key = jax.random.key(0)
    q, k, v = jax.random.normal(
        key, (3, args.b, args.h, args.n, args.d), jnp.bfloat16
    )
    w = args.window

    xla_f = jax.jit(
        lambda q, k, v: local_attention(
            q, k, v, window=w, compute_dtype=jnp.bfloat16
        )
    )
    pal_f = jax.jit(
        lambda q, k, v: local_attention_flash(
            q, k, v, window=w, compute_dtype=jnp.bfloat16
        )
    )

    def loss_x(q, k, v):
        return jnp.sum(
            local_attention(
                q, k, v, window=w, compute_dtype=jnp.bfloat16
            ).astype(jnp.float32) ** 2
        )

    def loss_p(q, k, v):
        return jnp.sum(
            local_attention_flash(
                q, k, v, window=w, compute_dtype=jnp.bfloat16
            ).astype(jnp.float32) ** 2
        )

    xla_g = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))
    pal_g = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))

    print(f"xla fwd:    {timeit(xla_f, q, k, v)*1e3:8.2f} ms")
    print(f"pallas fwd: {timeit(pal_f, q, k, v)*1e3:8.2f} ms")
    print(f"xla bwd:    {timeit(xla_g, q, k, v)*1e3:8.2f} ms")
    print(f"pallas bwd: {timeit(pal_g, q, k, v)*1e3:8.2f} ms")

    a = np.asarray(pal_f(q, k, v), np.float32)
    bref = np.asarray(xla_f(q, k, v), np.float32)
    print("max|Δ| fwd:", np.abs(a - bref).max())

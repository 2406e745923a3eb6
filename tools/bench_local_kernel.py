"""Micro-benchmark for the flash local-attention kernel at the paper
shape (b6, 8 local heads, w420, L1401, d64), fwd and fwd+bwd, amortized
over a jitted lax.scan so the axon tunnel's per-call dispatch floor
(~3 ms) disappears from the numbers.

Usage:
  python tools/bench_local_kernel.py [--variant=current] [--iters=50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=6)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--window", type=int, default=420)
    p.add_argument("--seq", type=int, default=1401)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--bwd", action="store_true")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from synthanatomy_tpu.ops.local_attention_pallas import local_attention_flash

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    key = jax.random.key(0)
    shape = (args.batch, args.heads, args.seq, args.d)
    q, k, v = (
        jax.random.normal(kk, shape, dt) for kk in jax.random.split(key, 3)
    )

    def one(qkv):
        q, k, v = qkv
        o = local_attention_flash(
            q, k, v, window=args.window, causal=True, use_rotary=False,
            compute_dtype=dt,
        )
        return o

    if args.bwd:

        def loss(qkv):
            o = one(qkv)
            return jnp.sum(jnp.square(o.astype(jnp.float32)))

        grad = jax.grad(loss)

        @jax.jit
        def run(qkv):
            def body(c, _):
                g = grad(c)
                # feed gradients back so the scan can't be collapsed
                return jax.tree.map(
                    lambda x, gg: x + 0.0 * gg.astype(x.dtype), c, g
                ), ()

            c, _ = jax.lax.scan(body, qkv, None, length=args.iters)
            return c

    else:

        @jax.jit
        def run(qkv):
            def body(c, _):
                q, k, v = c
                o = one(c)
                return (q + 0.0 * o.astype(q.dtype), k, v), ()

            c, _ = jax.lax.scan(body, qkv, None, length=args.iters)
            return c

    t0 = time.time()
    np.asarray(jax.tree.leaves(run((q, k, v)))[0][0, 0, 0])
    print(f"compile+1st: {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    np.asarray(jax.tree.leaves(run((q, k, v)))[0][0, 0, 0])
    dt_s = (time.time() - t0) / args.iters
    kind = "fwd+bwd" if args.bwd else "fwd"
    print(
        f"{kind}: {dt_s * 1e3:.3f} ms/call "
        f"(b{args.batch} h{args.heads} w{args.window} L{args.seq})"
    )


if __name__ == "__main__":
    main()

"""Measure the halo-tiled fused residual-layer kernel against the XLA
module path at the paper hot shape (the 80³-scale stacks that the
round-5 roofline found to be 61% of the b1 VQ-VAE train step).

Compares, at (B, 80, 112, 80, 128) ch=res_ch=128 ×3 layers:
  - XLA ResidualLayer stack (the production module path)
  - fused halo-tiled kernel (1 window DMA + value-level w-shifts)
fwd-only and fwd+bwd (the fused path's backward is the XLA recompute
vjp, so fwd+bwd isolates how much of the 73.7 ms stack cost the fused
forward removes).

Usage: python tools/bench_res_stack.py [--batch=1 --reps=10 --cpu]
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
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--fwd-only", action="store_true")
    p.add_argument("--shape", default="80,112,80",
                   help="D,H,W (default: the paper level-0 stack)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from synthanatomy_tpu.models.vqvae import ResidualLayer
    from synthanatomy_tpu.ops.res_stack_pallas import (
        fused_residual_layer,
        supports_fused_residual,
    )

    D, H, W = (int(s) for s in args.shape.split(","))
    B, C, R = args.batch, 128, 128
    DT = jnp.bfloat16
    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]
    interpret = dev.platform == "cpu"
    rng = np.random.default_rng(0)
    n_layers = 3

    with jax.default_device(cpu):
        x = jnp.asarray(rng.normal(size=(B, D, H, W, C)), DT)
        layers = [ResidualLayer(C, R, 0.0, slim=True, dtype=DT) for _ in range(n_layers)]
        params = [m.init(jax.random.key(i), x) for i, m in enumerate(layers)]

    assert supports_fused_residual(x.shape, R), x.shape

    def xla_stack(ps, xx):
        for m, pp in zip(layers, ps):
            xx = m.apply(pp, xx)
        return xx

    def fused_stack(ps, xx):
        for pp in ps:
            lp = pp["params"]
            c1, c2 = sorted(lp.keys())  # TorchConv3d_0 (3³), _1 (1³)
            w1, b1 = lp[c1]["kernel"], lp[c1]["bias"]
            w2, b2 = lp[c2]["kernel"], lp[c2]["bias"]
            xx = fused_residual_layer(
                xx, w1, b1, w2.reshape(w2.shape[-2:]), b2, interpret,
            )
        return xx

    # ---- exactness first (kernel vs module, same inputs) ----------------
    pd = jax.device_put(params, dev)
    xd = jax.device_put(x, dev)
    y_ref = np.asarray(
        jax.jit(lambda p, c: jnp.sum(xla_stack(p, c).astype(jnp.float32)))(pd, xd)
    )
    y_k = np.asarray(
        jax.jit(lambda p, c: jnp.sum(fused_stack(p, c).astype(jnp.float32)))(pd, xd)
    )
    rel = abs(y_k - y_ref) / (abs(y_ref) + 1e-6)
    print(f"exactness: sum ref={y_ref:.1f} fused={y_k:.1f} rel={rel:.2e}")

    # ---- timing ----------------------------------------------------------
    def timed(name, stack_fn, with_bwd):
        if with_bwd:
            def loss(ps, xx):
                return jnp.sum(jnp.square(stack_fn(ps, xx).astype(jnp.float32)))
            vg = jax.value_and_grad(loss, argnums=(0, 1))

            @jax.jit
            def chain(ps, x0):
                def body(c, _):
                    v, (gp, gx) = vg(ps, c)
                    gsum = sum(jnp.sum(g.astype(jnp.float32))
                               for g in jax.tree.leaves(gp))
                    return c + gx.astype(c.dtype) * 1e-9, v + gsum * 1e-20
                c, vs = jax.lax.scan(body, x0, None, length=args.reps)
                return jnp.sum(c.astype(jnp.float32)) * 0 + vs[-1]
        else:
            @jax.jit
            def chain(ps, x0):
                def body(c, _):
                    y = stack_fn(ps, c)
                    return c + y * 1e-9, jnp.sum(y.astype(jnp.float32)) * 1e-20
                c, vs = jax.lax.scan(body, x0, None, length=args.reps)
                return jnp.sum(c.astype(jnp.float32)) * 0 + vs[-1]

        np.asarray(chain(pd, xd))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chain(pd, xd))
            best = min(best, (time.perf_counter() - t0) / args.reps)
        flop = 2 * B * D * H * W * C * R * 28 * n_layers * (3 if with_bwd else 1)
        print(f"{name:24s} {'fwd+bwd' if with_bwd else 'fwd    '} "
              f"{best*1e3:8.2f} ms  ({flop/best/1e12:6.1f} TFLOP/s)")
        return best * 1e3

    for with_bwd in ([False] if args.fwd_only else [False, True]):
        t_x = timed("XLA module stack", xla_stack, with_bwd)
        t_f = timed("fused", fused_stack, with_bwd)
        print(f"    -> fused vs XLA: {t_x/t_f:.2f}x")


if __name__ == "__main__":
    main()

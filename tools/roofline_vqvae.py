#!/usr/bin/env python
"""Per-level VQ-VAE training roofline (VERDICT r4 #3).

The b1 paper train step (4-level/256ch, 160x224x160, MSE) measures
243 ms no-remat = 34% MFU (BASELINE.md) with only a whole-step XLA cost
analysis behind it.  This tool itemizes the step the way the decode
roofline did (the method that found the thin-output transposed-conv
win): each encoder conv / residual stack / decoder deconv / VQ / loss
is isolated as its own jitted fwd+bwd program, cost-analyzed (FLOPs +
bytes via XLA cost analysis) and measured on-chip (scan-chained reps so
the ~3 ms tunnel dispatch floor amortizes away), then compared against
its MXU/HBM speed-of-light.

Components use the production module classes (TorchConv3d,
TorchConvTranspose3d, ResidualLayer, ops.vq quantize_ema) at the exact
per-level shapes of the paper topology (reference baseline.py:213-299),
so the isolated lowering matches the train step's.  The backward is
driven by a sum-of-squares cotangent (one extra elementwise pass over
the component output — noted, small vs the conv work).

Usage:
  python tools/roofline_vqvae.py                 # measure on the chip
  python tools/roofline_vqvae.py --no-measure    # cost analysis only
  python tools/roofline_vqvae.py --reps=4 --batch=1
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def main() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--no-measure", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import flax.linen as nn
    import jax.numpy as jnp

    from synthanatomy_tpu.models.vqvae import (
        ResidualLayer,
        TorchConv3d,
        TorchConvTranspose3d,
    )
    from synthanatomy_tpu.ops import vq as vq_ops

    B = args.batch
    DT = jnp.bfloat16
    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]
    rngk = jax.random.key(0)

    class ResStack(nn.Module):
        ch: int
        res_ch: int
        n: int = 3

        @nn.compact
        def __call__(self, x):
            for _ in range(self.n):
                x = ResidualLayer(self.ch, self.res_ch, 0.0, slim=True, dtype=DT)(x)
            return x

    class ConvRelu(nn.Module):
        ch: int
        k: int
        s: int
        pad: int

        @nn.compact
        def __call__(self, x):
            return nn.relu(
                TorchConv3d(self.ch, kernel_size=self.k, stride=self.s,
                            padding=self.pad, dilation=1, dtype=DT)(x)
            )

    class Deconv(nn.Module):
        ch: int

        @nn.compact
        def __call__(self, x):
            return TorchConvTranspose3d(
                self.ch, kernel_size=4, stride=2, padding=1,
                output_padding=0, dilation=1, dtype=DT,
            )(x)

    # paper topology shapes (4 levels / 256 ch / 3 res layers, embed 32)
    S0 = (B, 160, 224, 160, 1)
    S1 = (B, 80, 112, 80, 128)
    S2 = (B, 40, 56, 40, 128)
    S3 = (B, 20, 28, 20, 128)
    S4 = (B, 10, 14, 10, 256)
    SE = (B, 10, 14, 10, 32)

    components = [
        # (name, module, input shape)
        ("enc_conv_0 1->128 @160^3", ConvRelu(128, 4, 2, 1), S0),
        ("enc_res_0  128 @80", ResStack(128, 128), S1),
        ("enc_conv_1 128->128 @80", ConvRelu(128, 4, 2, 1), S1),
        ("enc_res_1  128 @40", ResStack(128, 128), S2),
        ("enc_conv_2 128->128 @40", ConvRelu(128, 4, 2, 1), S2),
        ("enc_res_2  128 @20", ResStack(128, 128), S3),
        ("enc_conv_3 128->256 @20", ConvRelu(256, 4, 2, 1), S3),
        ("enc_res_3  256 @10", ResStack(256, 256), S4),
        ("enc_out    256->32 k3", ConvRelu(32, 3, 1, 1), S4),
        ("dec_in     32->256 k3", ConvRelu(256, 3, 1, 1), SE),
        ("dec_res_0  256 @10", ResStack(256, 256), S4),
        ("dec_up_0   256->128", Deconv(128), S4),
        ("dec_res_1  128 @20", ResStack(128, 128), S3),
        ("dec_up_1   128->128", Deconv(128), S3),
        ("dec_res_2  128 @40", ResStack(128, 128), S2),
        ("dec_up_2   128->128", Deconv(128), S2),
        ("dec_res_3  128 @80", ResStack(128, 128), S1),
        ("dec_up_3   128->1 (thin)", Deconv(1), S1),
    ]

    def row(name, flops, bytes_, ms=None):
        mxu = flops / (V5E_BF16_TFLOPS * 1e12) * 1e3
        hbm = bytes_ / (V5E_HBM_GBS * 1e9) * 1e3
        line = (
            f"{name:26s} {flops/1e12:6.2f} TFLOP {bytes_/1e9:7.2f} GB"
            f"  MXU-ideal {mxu:6.2f} ms  HBM-ideal {hbm:6.2f} ms"
        )
        if ms is not None:
            bound = max(mxu, hbm)
            line += f"  measured {ms:7.2f} ms ({bound/ms*100 if ms else 0:3.0f}% of SOL)"
        print(line)
        return mxu, hbm

    totals = [0.0, 0.0, 0.0]

    def bench(name, loss_fn, params, x, static_ok=True):
        """fwd+bwd cost analysis + chained on-chip timing."""
        vg = jax.value_and_grad(loss_fn, argnums=(0, 1))
        lowered = jax.jit(vg).lower(params, x)
        ca = lowered.compile().cost_analysis()
        flops = float(ca.get("flops", float("nan")))
        nbytes = float(ca.get("bytes accessed", float("nan")))
        ms = None
        if not args.no_measure:
            @jax.jit
            def chain(p, x0):
                def body(c, _):
                    v, (gp, gx) = vg(p, c)
                    # keep the PARAM gradients live (a scalar reduction)
                    # or XLA dead-code-eliminates the dW convs and the
                    # chain silently measures only fwd+dX
                    gsum = sum(jnp.sum(g.astype(jnp.float32))
                               for g in jax.tree.leaves(gp))
                    return c + gx.astype(c.dtype) * 1e-9, v + gsum * 1e-20
                c, vs = jax.lax.scan(body, x0, None, length=args.reps)
                return jnp.sum(c.astype(jnp.float32)) * 0 + vs[-1]
            pd = jax.device_put(params, dev)
            xd = jax.device_put(x, dev)
            np.asarray(chain(pd, xd))  # compile + warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                np.asarray(chain(pd, xd))
                best = min(best, (time.perf_counter() - t0) / args.reps)
            ms = best * 1e3
        totals[0] += flops
        totals[1] += nbytes
        totals[2] += ms or 0.0
        row(name, flops, nbytes, ms)

    print(f"VQ-VAE paper train-step decomposition, b={B} (fwd+bwd per "
          f"component, reps={args.reps})")
    rng = np.random.default_rng(0)

    # measurement-floor calibration: a null component shows the fixed
    # per-rep cost of the chained-scan harness (dispatch + scan glue);
    # subtract it from every row when reading the table
    class _Null(nn.Module):
        @nn.compact
        def __call__(self, x):
            return x * self.param("g", nn.initializers.ones, (1,), jnp.float32)

    components = [("calibration (null)", _Null(), S4)] + components
    for name, mod, shape in components:
        with jax.default_device(cpu):
            x = jnp.asarray(rng.normal(size=shape), DT)
            params = mod.init(rngk, x)

        def loss_fn(p, xx, _m=mod):
            y = _m.apply(p, xx)
            return jnp.sum(jnp.square(y.astype(jnp.float32)))

        bench(name, loss_fn, params, x)

    # ---- VQ (quantize + EMA stats) -------------------------------------
    with jax.default_device(cpu):
        vstate = vq_ops.init_vq_state(rngk, 2048, 32, "normal")
        xe = jnp.asarray(rng.normal(size=SE), jnp.float32)

    def vq_loss(p, x):
        # gradient flows through the straight-through estimator on x
        # (the train step's actual path); the codebook/argmin are
        # non-differentiable constants there
        q, loss, idx, new_state = vq_ops.quantize_ema(
            vstate, x, decay=0.5, commitment_cost=0.25, training=True,
        )
        return (
            jnp.sum(jnp.square(q.astype(jnp.float32)))
            + loss
            + jnp.sum(new_state.cluster_size) * 0.0
            + p["g"] * 0.0
        )

    bench("VQ quantize+EMA 2048x32", vq_loss,
          {"g": jnp.zeros((), jnp.float32)}, xe)

    # ---- MSE loss over the full volume ----------------------------------
    with jax.default_device(cpu):
        xr = jnp.asarray(rng.normal(size=S0), DT)

    def mse_loss(p, x):
        return jnp.mean(jnp.square((x - p["ref"]).astype(jnp.float32)))

    bench("MSE loss @160^3", mse_loss, {"ref": xr * 0.5}, xr)

    print("-" * 100)
    name_ms = f"  measured sum {totals[2]:.2f} ms" if not args.no_measure else ""
    mxu = totals[0] / (V5E_BF16_TFLOPS * 1e12) * 1e3
    hbm = totals[1] / (V5E_HBM_GBS * 1e9) * 1e3
    print(
        f"component sum: {totals[0]/1e12:.2f} TFLOP {totals[1]/1e9:.2f} GB"
        f"  MXU-ideal {mxu:.2f} ms  HBM-ideal {hbm:.2f} ms{name_ms}"
    )
    print("(compare: measured full no-remat b1 MSE train step = 243 ms, "
          "BASELINE.md; the gap to the component sum is Adam + step glue)")


if __name__ == "__main__":
    main()

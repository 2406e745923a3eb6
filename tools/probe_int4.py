#!/usr/bin/env python
"""Probe: can Mosaic stream int4 weights inside a Pallas kernel?

Step 1 of the int4 weight-streaming candidate for the fused decode
kernel (VERDICT r4 #2): before touching ops/fused_decode.py, check that
(a) a `pallas_call` with a jnp.int4 input compiles and runs on the real
chip, (b) the int4→bf16 in-register upcast + matmul matches the XLA
reference, and (c) the HBM byte saving is real — time a GEMV-shaped
kernel (the decode regime) streaming the same logical weights as int8
vs int4 over many grid steps.

Usage: python tools/probe_int4.py [--cpu]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() != "tpu"
    print(f"backend: {jax.default_backend()} (interpret={interpret})")

    B, K, N, L = 16, 512, 2048, 96  # GEMV-ish decode shape, L grid steps

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
    w_i8 = jnp.asarray(rng.integers(-7, 8, size=(L, K, N)), jnp.int8)
    scales = jnp.asarray(rng.uniform(0.01, 0.02, size=(L, 1, N)), jnp.float32)

    def make(wdtype):
        w = w_i8.astype(wdtype)

        def kernel(x_ref, w_ref, s_ref, o_ref, acc):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            y = jnp.dot(
                x_ref[...], w_ref[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * s_ref[0]
            # fold back to (B, K) so the carry chains layer-to-layer
            acc[...] = acc[...] + jnp.sum(
                y.reshape(B, N // K, K), axis=1
            ) * 1e-3

            @pl.when(i == L - 1)
            def _():
                o_ref[...] = acc[...]

        call = pl.pallas_call(
            kernel,
            grid=(L,),
            in_specs=[
                pl.BlockSpec((B, K), lambda i: (0, 0)),
                pl.BlockSpec((1, K, N), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((B, K), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, K), jnp.float32)],
            interpret=interpret,
        )
        return jax.jit(lambda xx: call(xx, w, scales))

    # ---- reference (XLA, f32) -------------------------------------------
    def ref(xx):
        acc = jnp.zeros((B, K), jnp.float32)
        for i in range(L):
            y = (
                xx.astype(jnp.float32) @ w_i8[i].astype(jnp.float32)
            ) * scales[i]
            acc = acc + jnp.sum(y.reshape(B, N // K, K), axis=1) * 1e-3
        return acc

    want = np.asarray(jax.jit(ref)(x))

    # ---- packed-int4 variant: two nibbles per int8 byte, split along
    # the contraction dim (byte k holds row k in the low nibble and row
    # k + K/2 in the high nibble — contiguous halves, no interleave)
    def make_packed():
        lo = w_i8  # reuse values in [-7, 7]
        w_lo = np.asarray(w_i8[:, : K // 2, :])
        w_hi = np.asarray(w_i8[:, K // 2 :, :])
        packed = jnp.asarray(
            ((w_hi.astype(np.int32) & 15) << 4) | (w_lo.astype(np.int32) & 15),
            jnp.int8,
        )  # (L, K/2, N)

        def kernel(x_ref, w_ref, s_ref, o_ref, acc):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            p = w_ref[0].astype(jnp.int32)
            wl = (((p & 15) ^ 8) - 8).astype(jnp.bfloat16)
            wh = ((((p >> 4) & 15) ^ 8) - 8).astype(jnp.bfloat16)
            x = x_ref[...]
            y = (
                jnp.dot(x[:, : K // 2], wl, preferred_element_type=jnp.float32)
                + jnp.dot(x[:, K // 2 :], wh, preferred_element_type=jnp.float32)
            ) * s_ref[0]
            acc[...] = acc[...] + jnp.sum(
                y.reshape(B, N // K, K), axis=1
            ) * 1e-3

            @pl.when(i == L - 1)
            def _():
                o_ref[...] = acc[...]

        call = pl.pallas_call(
            kernel,
            grid=(L,),
            in_specs=[
                pl.BlockSpec((B, K), lambda i: (0, 0)),
                pl.BlockSpec((1, K // 2, N), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((B, K), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, K), jnp.float32)],
            interpret=interpret,
        )
        return jax.jit(lambda xx: call(xx, packed, scales))

    results = {}
    for name, dt in [("int8", jnp.int8), ("int4", jnp.int4)]:
        try:
            fn = make(dt)
            got = np.asarray(fn(x))
            err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-9)
            print(f"{name}: compiles+runs, max rel err vs XLA f32: {err:.2e}")
            # timing: many reps, scalar transfer only
            reps = 200

            @jax.jit
            def chain(xx, _fn=fn):
                def body(c, _):
                    return c + _fn(c).astype(c.dtype) * 1e-6, None
                c, _ = jax.lax.scan(body, xx, None, length=reps)
                return jnp.sum(c.astype(jnp.float32))

            np.asarray(chain(x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(chain(x))
                best = min(best, time.perf_counter() - t0)
            per = best / reps
            wbytes = L * K * N * (1 if dt == jnp.int8 else 0.5)
            print(
                f"  {per*1e6:7.1f} us/step  -> {wbytes/per/1e9:6.0f} GB/s "
                f"weight stream ({wbytes/1e6:.0f} MB/step)"
            )
            results[name] = per
        except Exception as e:  # noqa: BLE001 — probe reports any failure
            print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:300]}")

    # packed-int4 (nibble-packed int8 carrier)
    try:
        fn = make_packed()
        got = np.asarray(fn(x))
        err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-9)
        print(f"packed-int4: compiles+runs, max rel err vs XLA f32: {err:.2e}")
        reps = 200

        @jax.jit
        def chain_p(xx):
            def body(c, _):
                return c + fn(c).astype(c.dtype) * 1e-6, None
            c, _ = jax.lax.scan(body, xx, None, length=reps)
            return jnp.sum(c.astype(jnp.float32))

        np.asarray(chain_p(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chain_p(x))
            best = min(best, time.perf_counter() - t0)
        per = best / reps
        wbytes = L * K * N * 0.5
        print(
            f"  {per*1e6:7.1f} us/step  -> {wbytes/per/1e9:6.0f} GB/s "
            f"weight stream ({wbytes/1e6:.0f} MB/step)"
        )
        results["packed-int4"] = per
    except Exception as e:  # noqa: BLE001
        print(f"packed-int4: FAILED — {type(e).__name__}: {str(e)[:300]}")

    if "int8" in results and "packed-int4" in results:
        print(
            f"packed-int4 speedup over int8 at this shape: "
            f"{results['int8'] / results['packed-int4']:.2f}x"
        )


if __name__ == "__main__":
    main()

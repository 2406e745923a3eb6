#!/usr/bin/env python
"""Isolate which nibble-unpack formulation Mosaic can lower.

The packed-int4 kernel (tools/probe_int4.py) fails UNIMPLEMENTED on
v5e; this probes candidate unpack sequences one op-family at a time:

  A. int32 bitwise (& >> ^)            — the failing original
  B. int32 arithmetic (floor-div/mod)
  C. float arithmetic (floor/mul/sub)  — pure VPU float ops
  D. int8-dtype bitwise directly

Usage: python tools/probe_int4_unpack.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    K2, N = 128, 256
    rng = np.random.default_rng(0)
    lo = rng.integers(-7, 8, size=(K2, N))
    hi = rng.integers(-7, 8, size=(K2, N))
    packed = jnp.asarray(((hi & 15) << 4) | (lo & 15), jnp.int8)
    want = np.concatenate([lo, hi], 0).astype(np.float32)

    def unpack_bits_i32(p8):
        p = p8.astype(jnp.int32)
        l = ((p & 15) ^ 8) - 8
        h = (((p >> 4) & 15) ^ 8) - 8
        return l.astype(jnp.float32), h.astype(jnp.float32)

    def unpack_arith_i32(p8):
        p = p8.astype(jnp.int32)
        pu = p - 256 * jnp.floor_divide(p, 256)
        hu = jnp.floor_divide(pu, 16)
        lu = pu - 16 * hu
        l = lu - 16 * jnp.floor_divide(lu + 8, 16)
        h = hu - 16 * jnp.floor_divide(hu + 8, 16)
        return l.astype(jnp.float32), h.astype(jnp.float32)

    def unpack_float(p8):
        p = p8.astype(jnp.float32)
        pu = p - 256.0 * jnp.floor(p / 256.0)
        hu = jnp.floor(pu / 16.0)
        lu = pu - 16.0 * hu
        l = lu - 16.0 * jnp.floor((lu + 8.0) / 16.0)
        h = hu - 16.0 * jnp.floor((hu + 8.0) / 16.0)
        return l, h

    def unpack_bits_i8(p8):
        l = ((p8 & jnp.int8(15)) ^ jnp.int8(8)) - jnp.int8(8)
        h = (((p8 >> 4) & jnp.int8(15)) ^ jnp.int8(8)) - jnp.int8(8)
        return l.astype(jnp.float32), h.astype(jnp.float32)

    # staged context bisections: A passes alone, but the fused-decode
    # kernel with identical unpack fails — find the failing combination
    B, K, NN = 16, 256, 512
    x = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
    pw = jnp.asarray(
        ((rng.integers(-7, 8, (K // 2, NN)) & 15) << 4)
        | (rng.integers(-7, 8, (K // 2, NN)) & 15),
        jnp.int8,
    )
    sc = jnp.asarray(rng.uniform(0.01, 0.02, (2, NN)), jnp.float32)

    def kernel_dot(x_ref, p_ref, s_ref, o_ref):
        l, h = unpack_bits_i32(p_ref[...])
        kh = l.shape[0]
        xb = x_ref[...]
        o_ref[...] = (
            jnp.dot(xb[:, :kh], l.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * s_ref[0:1]
            + jnp.dot(xb[:, kh:], h.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) * s_ref[1:2]
        )

    try:
        out = pl.pallas_call(
            kernel_dot,
            out_shape=jax.ShapeDtypeStruct((B, NN), jnp.float32),
        )(x, pw, sc)
        np.asarray(out)
        print("E unpack+two-dots+scales: compiles+runs")
    except Exception as e:  # noqa: BLE001
        print(f"E unpack+two-dots+scales: FAILED — {type(e).__name__}: "
              f"{str(e)[:160]}")

    # F: same body under a layer grid with (1, K/2, N) blocks — the
    # fused kernel's weight BlockSpec shape
    L = 4
    pwl = jnp.broadcast_to(pw, (L,) + pw.shape)
    scl = jnp.broadcast_to(sc, (L,) + sc.shape)

    def kernel_grid(x_ref, p_ref, s_ref, o_ref):
        l, h = unpack_bits_i32(p_ref[0])
        kh = l.shape[0]
        xb = x_ref[...]
        o_ref[...] = (
            jnp.dot(xb[:, :kh], l.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * s_ref[0, 0:1]
            + jnp.dot(xb[:, kh:], h.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) * s_ref[0, 1:2]
        )

    try:
        out = pl.pallas_call(
            kernel_grid,
            grid=(L,),
            in_specs=[
                pl.BlockSpec((B, K), lambda i: (0, 0)),
                pl.BlockSpec((1, K // 2, NN), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 2, NN), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((B, NN), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, NN), jnp.float32),
        )(x, pwl, scl)
        np.asarray(out)
        print("F grid + (1,K/2,N) weight blocks: compiles+runs")
    except Exception as e:  # noqa: BLE001
        print(f"F grid + (1,K/2,N) weight blocks: FAILED — "
              f"{type(e).__name__}: {str(e)[:160]}")

    for name, fn in [
        ("A int32-bitwise", unpack_bits_i32),
        ("B int32-arith", unpack_arith_i32),
        ("C float-arith", unpack_float),
        ("D int8-bitwise", unpack_bits_i8),
    ]:
        def kernel(p_ref, o_ref, _fn=fn):
            l, h = _fn(p_ref[...])
            o_ref[...] = jnp.concatenate([l, h], 0)

        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((2 * K2, N), jnp.float32),
            )(packed)
            ok = np.array_equal(np.asarray(out), want)
            print(f"{name}: compiles+runs, exact={ok}")
        except Exception as e:  # noqa: BLE001 — probe reports any failure
            print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()

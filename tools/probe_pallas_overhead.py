"""Quantify the fixed costs of the Pallas training-kernel layout.

The round-4 training roofline (BASELINE.md) pins the 101.8 ms paper
step at 42% of serial MXU speed-of-light, with the gap attributed to
per-grid-step / per-invocation fixed cost inside the two kernel
families (~76 ms measured vs ~8.5 ms compute ideal).  The proposed
structural fixes both reduce the number of `pallas_call` invocations
(fusing the FAVOR+local families per layer-block: 96 → 48 per step;
a persistent multi-layer grid: 96 → 4).  Whether either is worth the
build depends on a number nobody has measured yet: what one extra
`pallas_call` invocation actually costs relative to the same work
folded into an existing call's grid.

This probe times, on the real chip, the SAME total work (G grid steps
of a realistic per-step tile program: one (256,512)x(512,512) bf16
matmul accumulated into VMEM scratch, ~1.3 GFLOP total at G=96) in two
shapes inside a single jitted scan:

  A) one pallas_call with grid=(G,)
  B) K pallas_calls (lax.scan over K), each grid=(G/K,)

B-A isolates the per-invocation overhead x (K-1); sweeping G at K=1
gives the per-grid-step cost.  Timings follow the repo measurement
rules: everything under one jit, R outer repetitions carried through a
scan dependency, one np.asarray at the end, no per-step host syncs.

Run:  python tools/probe_pallas_overhead.py  (uses the default device;
      numbers are only meaningful on the real TPU chip)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

M, K_DIM, N = 256, 512, 512  # per-grid-step tile matmul (bf16, f32 acc)


def _kernel(x_ref, w_ref, o_ref, acc):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _out():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def _call(x, w, grid):
    return pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((M, K_DIM), lambda g: (0, 0)),
            pl.BlockSpec((K_DIM, N), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, N), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, N), jnp.float32)],
    )(x, w)


def build(num_calls: int, grid_per_call: int, reps: int):
    """reps outer iterations; each runs num_calls sequential pallas
    calls of grid_per_call steps, chained so nothing is dead code."""

    @jax.jit
    def fn(x, w):
        def rep(carry, _):
            def one(c, _):
                y = _call(c, w, grid_per_call)
                # data dependency call-to-call (residual-stream shape)
                return c + y.astype(c.dtype) * 1e-6, None

            c2, _ = jax.lax.scan(one, carry, None, length=num_calls)
            return c2, None

        out, _ = jax.lax.scan(rep, x, None, length=reps)
        return out

    return fn


def timed(fn, x, w, label):
    np.asarray(fn(x, w))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(fn(x, w))
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt * 1e3:8.1f} ms total")
    return dt


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K_DIM)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K_DIM, N)), jnp.bfloat16)
    REPS = 200
    G = 96  # total grid steps ≈ the per-step invocation count of the
    #         two kernel families (24 layers x fwd/bwd x 2 families)

    print(f"\nsame total work ({G} grid steps x {M}x{K_DIM}x{N} bf16 "
          f"matmul), {REPS} reps:")
    results = {}
    for num_calls, gpc, label in [
        (1, G, "A: 1 call, grid=96"),
        (4, G // 4, "B4: 4 calls, grid=24"),
        (24, G // 24, "B24: 24 calls, grid=4"),
        (96, 1, "B96: 96 calls, grid=1"),
    ]:
        dt = timed(build(num_calls, gpc, REPS), x, w, label)
        results[num_calls] = dt / REPS

    per_call = (results[96] - results[1]) / (96 - 1)
    per_call24 = (results[24] - results[1]) / (24 - 1)
    print(f"\nper-invocation overhead (96-call slope): "
          f"{per_call * 1e6:.1f} us")
    print(f"per-invocation overhead (24-call slope): "
          f"{per_call24 * 1e6:.1f} us")

    # per-grid-step cost: sweep G at one call
    print("\ngrid sweep (1 call):")
    gs = {}
    for g in (24, 48, 96, 192):
        dt = timed(build(1, g, REPS), x, w, f"grid={g}")
        gs[g] = dt / REPS
    per_step = (gs[192] - gs[24]) / (192 - 24)
    mxu_ideal = 2 * M * K_DIM * N / 394e12
    print(f"\nper-grid-step cost: {per_step * 1e6:.2f} us "
          f"(MXU-ideal for the tile: {mxu_ideal * 1e6:.2f} us)")
    print(f"projected saving, 96→48 invocations/step: "
          f"{per_call * 48 * 1e3:.2f} ms")
    print(f"projected saving, 96→4 invocations/step:  "
          f"{per_call * 92 * 1e3:.2f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Stage-2 (Performer prior) training-throughput bench + ablations.

BASELINE.md config 3: Performer 24L / d512 / 16 heads (8 local,
window 420) over 1401-token latent sequences, vocab 2048, batch 6
(reference README.md:106-137, run_transformer.py).  Measures ms/step
and tokens/s on the attached chip, with flags to ablate the
component/dtype/remat/chunk dimensions so the time sinks can be
attributed without a trace viewer (the axon tunnel makes per-op
tracing impractical; see BASELINE.md measurement notes).

Usage:
  python tools/bench_transformer.py                       # paper config
  python tools/bench_transformer.py --depth=12 --steps=20
  python tools/bench_transformer.py --local-heads=0       # all-FAVOR
  python tools/bench_transformer.py --local-heads=16      # all-local
  python tools/bench_transformer.py --no-remat
  python tools/bench_transformer.py --scan-chunk=256
  python tools/bench_transformer.py --attn-dtype=bfloat16
  python tools/bench_transformer.py --fwd-only
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
    p.add_argument("--depth", type=int, default=24)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--local-heads", type=int, default=8)
    p.add_argument("--window", type=int, default=420)
    p.add_argument("--seq", type=int, default=1400)
    p.add_argument("--vocab", type=int, default=2048)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--scan-chunk", type=int, default=128)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--pallas-local", action="store_true")
    p.add_argument("--pallas-favor", action="store_true")
    p.add_argument(
        "--splash-local", action="store_true",
        help="swap the local heads onto JAX's stock splash-attention "
        "TPU kernel (ops/local_attention_splash.py) — the external "
        "yardstick for the first-party banded kernels",
    )
    p.add_argument("--splash-block", type=int, default=256,
                   help="splash block_q=block_kv (padded seq rounds up)")
    p.add_argument("--splash-fused-bwd", action="store_true",
                   help="use splash's fused dq/dkv backward kernel")
    p.add_argument("--reversible", action="store_true")
    p.add_argument("--use-rezero", action="store_true",
                   help="paper block form (reference README.md:140)")
    p.add_argument("--spatial-emb", default=None,
                   choices=["fixed", "absolute"],
                   help="spatial coordinate embeddings (paper: absolute)")
    p.add_argument("--grid", default="10,14,10",
                   help="latent grid for --spatial-emb (prod == --seq)")
    p.add_argument("--attn-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="internal attention matmul dtype (fp32 accumulate)")
    p.add_argument("--fwd-only", action="store_true")
    p.add_argument(
        "--cpu", action="store_true",
        help="force the host CPU backend (the axon sitecustomize "
        "overrides JAX_PLATFORMS, so the env var alone cannot — and a "
        "wedged tunnel hangs PJRT init); for config sanity runs only",
    )
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from synthanatomy_tpu.models.performer import Performer
    from synthanatomy_tpu.train.transformer_steps import (
        create_transformer_train_state,
        make_transformer_train_step,
    )

    if args.splash_local:
        # ablation hook: route the `use_pallas_local` call site onto the
        # stock splash kernel so everything else in the step is held
        # fixed (the point of the cross-benchmark — VERDICT r4 #1)
        import functools

        import synthanatomy_tpu.models.performer as perf_mod
        from synthanatomy_tpu.ops.local_attention_splash import (
            local_attention_splash,
        )

        perf_mod.local_attention_flash = functools.partial(
            local_attention_splash,
            block_q=args.splash_block,
            block_kv=args.splash_block,
            use_fused_bwd=args.splash_fused_bwd,
        )
        args.pallas_local = True
        print(
            f"local heads -> stock splash kernel "
            f"(block={args.splash_block}, fused_bwd={args.splash_fused_bwd})"
        )

    L = args.seq + 1  # +BOS
    sp_grid = sp_ordering = None
    if args.spatial_emb:
        from synthanatomy_tpu.models.ordering import Ordering

        sp_grid = tuple(int(s) for s in args.grid.split(","))
        assert int(np.prod(sp_grid)) == args.seq, (sp_grid, args.seq)
        sp_ordering = Ordering("raster_scan", 3, sp_grid)

    model = Performer(
        num_tokens=args.vocab + 1,
        max_seq_len=L,
        dim=args.dim,
        depth=args.depth,
        heads=args.heads,
        dim_head=64,
        local_attn_heads=args.local_heads,
        local_window_size=args.window,
        scan_chunk=args.scan_chunk,
        remat_attention=not (args.no_remat or args.reversible),
        reversible=args.reversible,
        use_pallas_local=args.pallas_local,
        use_pallas_favor=args.pallas_favor,
        attn_compute_dtype=jnp.bfloat16
        if args.attn_dtype == "bfloat16"
        else jnp.float32,
        use_rezero=args.use_rezero,
        spatial_position_emb=args.spatial_emb,
        spatial_shape=sp_grid,
        ordering=sp_ordering,
        dtype=jnp.bfloat16,
    )

    rng = jax.random.key(0)
    state, tx = create_transformer_train_state(model, rng, L)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)

    x = np.random.default_rng(0).integers(0, args.vocab, (args.batch, L))
    inputs = jax.device_put(jnp.asarray(x, jnp.int32), dev)
    targets = jax.device_put(
        jnp.asarray(np.roll(x, -1, axis=1), jnp.int32), dev
    )
    sched = {"lr": 1e-4}

    n_params = sum(
        int(np.prod(v.shape)) for v in jax.tree.leaves(state.params)
    )
    print(f"params: {n_params/1e6:.1f}M")

    if args.fwd_only:
        @jax.jit
        def fwd(params, favor, inputs):
            logits = model.apply({"params": params, "favor": favor}, inputs)
            return jnp.mean(logits.astype(jnp.float32))

        t0 = time.perf_counter()
        val = fwd(state.params, state.favor, inputs)
        np.asarray(val)
        print(f"compile: {time.perf_counter() - t0:.1f}s")
        for _ in range(args.warmup):
            np.asarray(fwd(state.params, state.favor, inputs))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            val = fwd(state.params, state.favor, inputs)
        np.asarray(val)
        dt = (time.perf_counter() - t0) / args.steps
        print(f"fwd-only: {dt*1e3:.1f} ms/step")
        return

    step = jax.jit(make_transformer_train_step(model, tx), donate_argnums=0)

    t0 = time.perf_counter()
    state, metrics = step(state, inputs, targets, None, sched)
    np.asarray(metrics["Loss"])
    print(f"compile+1st: {time.perf_counter() - t0:.1f}s")

    for _ in range(args.warmup):
        state, metrics = step(state, inputs, targets, None, sched)
    np.asarray(metrics["Loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, inputs, targets, None, sched)
    np.asarray(metrics["Loss"])
    dt = (time.perf_counter() - t0) / args.steps
    toks = args.batch * L / dt
    print(
        f"train: {dt*1e3:.1f} ms/step  {toks/1e3:.1f}k tok/s  "
        f"(b={args.batch} L={L} depth={args.depth} local={args.local_heads} "
        f"chunk={args.scan_chunk} remat={not args.no_remat} "
        f"attn_dtype={args.attn_dtype})"
    )
    # rough utilisation line: 6·P·tokens FLOPs per train step
    flops = 6 * n_params * args.batch * L
    print(f"model-FLOPs util: {flops/dt/1e12:.1f} TFLOP/s (peak v5e bf16 ≈ 197)")


if __name__ == "__main__":
    main()

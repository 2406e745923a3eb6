#!/usr/bin/env python
"""Training-step roofline accounting (BASELINE.md round-4 table).

Combines three evidence sources into per-component bytes+FLOPs rows
for the paper Performer train step (24L/d512/16h, b6, L1401):

1. XLA cost analysis of the compiled step — FLOPs/bytes of everything
   XLA schedules (Pallas custom calls are opaque to it, which cleanly
   separates 'base' from 'kernels');
2. analytic FLOPs/bytes for the two Pallas kernel families, from the
   documented layouts (banded-flash local s=256/nl=2; BH-tiled FAVOR
   chunk=128);
3. the measured component shares from the ablation ledger
   (tools/bench_transformer.py swaps, BASELINE.md).

Usage: python tools/roofline_transformer.py [--batch=6 --seq=1400]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from synthanatomy_tpu.cli import parse_argv

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    _, kw = parse_argv(sys.argv[1:])
    B = int(kw.get("batch", 6))
    Lseq = int(kw.get("seq", 1400)) + 1
    depth = int(kw.get("depth", 24))
    dim = int(kw.get("dim", 512))
    heads = int(kw.get("heads", 16))
    lh = int(kw.get("local_heads", 8))
    dh = int(kw.get("dim_head", 64))
    m = int(kw.get("nb_features", 256))
    win = int(kw.get("window", 420))
    vocab = int(kw.get("vocab", 2048))
    chunk = int(kw.get("scan_chunk", 128))
    gh = heads - lh
    Lpad = -(-Lseq // chunk) * chunk  # FAVOR chunk padding
    band_s, band_nl = 256, 2  # banded-flash local layout (BASELINE.md)
    span = (band_nl + 1) * band_s

    # ---- analytic kernel accounting ------------------------------------
    T = B * Lpad
    # FAVOR fwd: feature maps (q,k) + prefix scan (accumulate + readout)
    favor_feat = 2 * (B * gh * Lpad) * dh * m * 2  # q&k projections
    favor_scan = 2 * (B * gh * Lpad) * m * dh * 2  # kv accumulate + qS read
    favor_fwd = favor_feat + favor_scan
    favor_fb = favor_fwd * 3  # two-sweep bwd ≈ 2× fwd (recompute incl.)
    favor_flops = favor_fb * depth
    favor_exps = 2 * (B * gh * Lpad) * m * 2 * depth  # fwd + bwd recompute
    # HBM per layer: q,k,v in / o out (fwd) + q,k,v,do in / dq,dk,dv out
    favor_bytes = (4 + 7) * (B * gh * Lpad * dh) * 2 * depth

    nb = -(-Lseq // band_s)
    local_fwd = 2 * 2 * (B * lh) * nb * band_s * span * dh  # QK^T + AV
    local_fb = local_fwd * 3
    local_flops = local_fb * depth
    local_bytes = (4 + 7) * (B * lh * Lseq * dh) * 2 * depth
    # score-tile exp/mask VPU work (fwd + 2 bwd sweeps)
    local_exps = (B * lh) * nb * band_s * span * 3 * depth

    # ---- XLA-visible side (cost analysis of the compiled step) ---------
    from synthanatomy_tpu.models.performer import Performer
    from synthanatomy_tpu.train.transformer_steps import (
        create_transformer_train_state,
        make_transformer_train_step,
    )

    use_kernels = os.environ.get("ROOFLINE_NO_KERNELS", "") == ""
    model = Performer(
        num_tokens=vocab + 1, max_seq_len=Lseq, dim=dim, depth=depth,
        heads=heads, dim_head=dh, local_attn_heads=lh,
        local_window_size=win, nb_features=m, dtype=jnp.bfloat16,
        scan_chunk=chunk, remat_attention=False,
        attn_compute_dtype=jnp.bfloat16,
        use_pallas_local=use_kernels, use_pallas_favor=use_kernels,
        use_rezero=True,
    )
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state, tx = create_transformer_train_state(
            model, jax.random.key(0), Lseq, learning_rate=1e-4
        )
    step = make_transformer_train_step(model, tx)
    xi = jnp.zeros((B, Lseq), jnp.int32)
    lowered = jax.jit(step).lower(state, xi, xi, None, {"lr": 1e-4})
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    xla_flops = float(ca.get("flops", float("nan")))
    xla_bytes = float(ca.get("bytes accessed", float("nan")))

    def row(name, flops, bytes_, measured_ms=None, exps=None):
        mxu = flops / (V5E_BF16_TFLOPS * 1e12) * 1e3
        hbm = bytes_ / (V5E_HBM_GBS * 1e9) * 1e3
        out = (
            f"{name:24s} {flops / 1e12:7.2f} TFLOP  {bytes_ / 1e9:6.2f} GB"
            f"  MXU-ideal {mxu:6.2f} ms  HBM-ideal {hbm:5.2f} ms"
        )
        if exps:
            out += f"  ~{exps / 1e9:.2f}G transcendentals"
        if measured_ms:
            out += f"  measured {measured_ms:.1f} ms"
        print(out)

    print(f"paper step b={B} L={Lseq} depth={depth} (kernels={use_kernels})")
    print(f"XLA cost analysis: {xla_flops / 1e12:.2f} TFLOP, "
          f"{xla_bytes / 1e9:.2f} GB accessed (Pallas custom calls opaque)")
    row("base (XLA-visible)", xla_flops, xla_bytes)
    row("FAVOR kernels (analytic)", favor_flops, favor_bytes, exps=favor_exps)
    row("local kernels (analytic)", local_flops, local_bytes, exps=local_exps)
    total_flops = xla_flops + favor_flops + local_flops
    total_bytes = xla_bytes + favor_bytes + local_bytes
    row("total", total_flops, total_bytes)
    print(
        "speed-of-light (max of per-component MXU/HBM ideals, serial): "
        f"{(xla_flops + favor_flops + local_flops) / (V5E_BF16_TFLOPS * 1e12) * 1e3:.1f} ms MXU-only, "
        f"{total_bytes / (V5E_HBM_GBS * 1e9) * 1e3:.1f} ms HBM-only"
    )


if __name__ == "__main__":
    main()

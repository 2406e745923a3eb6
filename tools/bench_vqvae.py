#!/usr/bin/env python
"""Stage-1 benchmark harness (BASELINE.md configs 1-2).

Measures on the attached TPU chip:
- config 1: paper-geometry (160×224×160) encode→indices + decode
  round-trip (the extracting/decoding path), volumes/min/chip;
- config 2: full 4-level/256ch train step, EMA codebook 2048×32,
  selectable loss, max batch that fits.

Usage: python tools/bench_vqvae.py [--batch=N --loss=mse --levels=4]
       [--adversarial [--adaptive]]   # full paper G+D step (config 2b)
       [--device_augment]             # + on-device augmentation chain
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from synthanatomy_tpu.cli import parse_argv
    from synthanatomy_tpu.models.vqvae import BaselineVQVAE
    from synthanatomy_tpu.train.vqvae_steps import (
        create_vqvae_train_state,
        make_vqvae_train_step,
    )

    _, kw = parse_argv(sys.argv[1:])
    batch = int(kw.get("batch", 1))
    loss = kw.get("loss", "mse")
    levels = int(kw.get("levels", 4))
    shape = tuple(kw.get("shape", (160, 224, 160)))
    train = bool(kw.get("train", True))
    recon = bool(kw.get("recon", True))
    adversarial = bool(kw.get("adversarial", False))
    adaptive = bool(kw.get("adaptive", False))
    grouped_bn = bool(kw.get("grouped_bn", False))
    dev_aug = bool(kw.get("device_augment", False))

    model = BaselineVQVAE(
        n_levels=levels,
        downsample_parameters=((4, 2, 1, 1),) * levels,
        upsample_parameters=((4, 2, 1, 0, 1),) * levels,
        n_embed=2048, embed_dim=32, n_channels=256, n_res_channels=256,
        n_res_layers=3, dtype=jnp.bfloat16,
        use_remat=bool(kw.get("remat", True)),
        # --fused_res=False ablates the fused residual-layer kernel
        use_fused_residual=None if bool(kw.get("fused_res", True)) else False,
    )

    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]

    # conv/VQ params are spatial-size independent: init on a small
    # volume on host CPU (full-size init on one CPU core takes minutes)
    init_shape = tuple(min(s, 32) for s in shape)

    if recon:
        # ---- config 1: extract+decode round trip -----------------------
        # production forward-only behavior: fused residual off (the
        # kernel is a remat-training-only win); --fused_recon ablates
        recon_model = (
            model if bool(kw.get("fused_recon", False))
            else model.clone(use_fused_residual=False)
        )
        with jax.default_device(cpu):
            x1 = jnp.zeros((1,) + init_shape + (1,), jnp.float32)
            variables = recon_model.init(jax.random.key(0), x1)
        variables = jax.device_put(variables, dev)

        @jax.jit
        def roundtrip(variables, x):
            idx = recon_model.apply(variables, x, method=recon_model.index_quantize)
            out = recon_model.apply(variables, idx, method=recon_model.decode_samples)
            # consume the volume ON DEVICE: the axon tunnel transfers
            # large outputs to host at ~0.01 GB/s, so np.asarray on the
            # 11.5 MB volume would dominate the timing (round-4 finding;
            # real TPU hosts move GB/s over PCIe, so device rate is the
            # honest throughput number)
            return idx[0], jnp.sum(out.astype(jnp.float32))

        x = jax.device_put(
            np.random.default_rng(0).uniform(size=(1,) + shape + (1,)).astype(np.float32),
            dev,
        )
        t0 = time.perf_counter()
        idx, out = roundtrip(variables, x)
        np.asarray(out)
        print(f"[recon] compile+run {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            idx, out = roundtrip(variables, x)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / reps
        print(
            f"[recon] {shape} extract+decode: {dt * 1e3:.1f} ms/vol → "
            f"{60 / dt:.1f} volumes/min/chip; latent {idx.shape}"
        )

    if train:
        # ---- config 2 / 2b: full train step ----------------------------
        d_model = None
        if adversarial:
            from synthanatomy_tpu.models.discriminator import (
                BaselineDiscriminator,
            )

            d_model = BaselineDiscriminator(
                dtype=jnp.bfloat16, use_split_bn=grouped_bn
            )
        with jax.default_device(cpu):
            state, g_tx, d_tx = create_vqvae_train_state(
                model, jax.random.key(0), init_shape, learning_rate=3e-4,
                d_model=d_model,
            )
        state = jax.device_put(state, dev)
        step = jax.jit(
            make_vqvae_train_step(
                model, g_tx, loss_name=loss, d_model=d_model, d_tx=d_tx,
                use_adaptive_weight=adaptive, d_grouped_stats=grouped_bn,
            )
        )
        if dev_aug:
            from synthanatomy_tpu.data.transforms import VQVAETransform
            from synthanatomy_tpu.ops.augment import (
                augment_batch,
                shear_shift_bounds,
            )

            tf = VQVAETransform(augment=True, augmentation_probability=1.0)
            prm = [
                tf.draw_device_params(shape, np.random.default_rng(i))[0]
                for i in range(batch)
            ]
            aug = jax.device_put(
                {k: np.stack([p[k] for p in prm]) for k in prm[0]}, dev
            )
            # 3-pass resampler unless --gather_augment (the slow exact
            # path, kept for ablation)
            shifts = (
                None if kw.get("gather_augment")
                else shear_shift_bounds(shape, **tf.affine_ranges())
            )
            print(f"[augment] resampler shifts: {shifts}")
            base_step = step
            step = jax.jit(
                lambda s, x, sc, lp=None, a=aug: base_step(
                    s, augment_batch(x, a, shifts), sc, lp
                )
            )
        sched = {"lr": 3e-4, "d_lr": 5e-4, "decay": 0.5,
                 "commitment_cost": 0.25, "gdl_factor": 0.0, "epoch": 0}
        xb = jax.device_put(
            np.random.default_rng(1).uniform(size=(batch,) + shape + (1,)).astype(np.float32),
            dev,
        )
        from synthanatomy_tpu.losses import vqvae as vqvae_losses
        lpips_params = None
        if vqvae_losses.loss_needs_lpips(loss):
            from synthanatomy_tpu.losses.lpips import init_lpips_params
            with jax.default_device(cpu):
                lpips_params = init_lpips_params(
                    jax.random.key(7),
                    "squeeze" if "baseline" in loss else "alex",
                )
            lpips_params = jax.device_put(lpips_params, dev)
        step = (
            step if lpips_params is None
            else (lambda s, x, sc, _st=step: _st(s, x, sc, lpips_params))
        )
        t0 = time.perf_counter()
        state, metrics = step(state, xb, sched)
        print(f"[train] compile+run {time.perf_counter() - t0:.1f}s "
              f"loss={float(metrics['Loss-Reconstruction-Total']):.4f}")
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            state, metrics = step(state, xb, sched)
        float(metrics["Loss-Reconstruction-Total"])
        np.asarray(state.step)
        dt = (time.perf_counter() - t0) / reps
        tag = "+adv" if adversarial else ""
        tag += "+adaptive" if adaptive else ""
        tag += "+groupedBN" if grouped_bn else ""
        tag += "+devaug" if dev_aug else ""
        print(
            f"[train{tag}] batch={batch} loss={loss}: {dt * 1e3:.0f} ms/step → "
            f"{batch / dt:.2f} volumes/s/chip"
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""One-command full brain synthesis (BASELINE.json config 5).

Loads a trained Performer prior and VQ-VAE from their experiment
directories and generates NIfTI volumes in a single device-resident
pipeline (sampled latents never hit the filesystem) — the fused
alternative to the reference's two-step `run_transformer
--mode=inference` → `run_vqvae --mode=decoding` flow.

Usage:
  python tools/synthesize.py run \
    --project_directory=/experiments --experiment_name=brain \
    --latent_shape='(10,14,10)' --num_volumes=8 --batch_size=8 \
    --vocab_size=2048 --n_embd=512 --n_layers=24 --n_head=16 \
    --local_attn_heads=8 --local_window_size=420 \
    --no_levels=4 --no_channels=256 \
    --num_embeddings='(2048,)' --embedding_dim='(32,)' \
    --output_directory=/experiments/brain/synthesis
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(
    project_directory: str = "",
    experiment_name: str = "",
    output_directory: str = "",
    latent_shape=(10, 14, 10),
    num_volumes: int = 8,
    batch_size: int = 8,
    temperature: float = 1.0,
    top_k=None,
    sample: bool = True,
    seed: int = 2,
    ordering_type: str = "raster_scan",
    evaluation_checkpoint: str = "recent",
    save_latents: bool = True,
    # conditioned priors (reference performer.py:252-264): one token
    # index per conditioning variable, e.g.
    # --conditioning_values='(2,0)'; applied to every generated
    # volume.  Requires the matching --conditioning_num_tokens=...
    # network flag the prior was trained with.
    conditioning_values=None,
    # transformer network flags (TransformerConfig subset)
    **network_flags,
):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    import jax.numpy as jnp

    from synthanatomy_tpu.config import TransformerConfig, VQVAEConfig
    from synthanatomy_tpu.data.nifti import save_nifti
    from synthanatomy_tpu.pipeline import make_synthesizer
    from synthanatomy_tpu.runners.transformer import build_ordering, build_performer
    from synthanatomy_tpu.runners.vqvae import build_vqvae
    from synthanatomy_tpu.train import checkpoints as C
    from synthanatomy_tpu.train.transformer_steps import create_transformer_train_state
    from synthanatomy_tpu.train.vqvae_steps import create_vqvae_train_state
    from synthanatomy_tpu.utils.general import setup_logger

    logger = setup_logger("synthesize")
    t_flags = {
        k: v for k, v in network_flags.items()
        if k in TransformerConfig.__dataclass_fields__
    }
    v_flags = {
        k: v for k, v in network_flags.items()
        if k in VQVAEConfig.__dataclass_fields__
    }
    t_cfg = TransformerConfig(
        ordering_type=ordering_type, temperature=temperature, top_k=top_k,
        sample=sample, seed=seed, mode="inference", **t_flags,
    )
    v_cfg = VQVAEConfig(mode="decoding", adversarial_component=False, **v_flags)

    latent_shape = tuple(int(s) for s in latent_shape)
    ordering = build_ordering(t_cfg, latent_shape)
    performer = build_performer(t_cfg, ordering, latent_shape)
    # decode is forward-only: the fused residual kernel is a remat-
    # training-only win (BASELINE.md round 5)
    vqvae = build_vqvae(v_cfg).clone(use_fused_residual=False)

    # restore both checkpoints
    t_ck, _ = C.check_for_checkpoints(
        os.path.join(project_directory, experiment_name, "performer", "checkpoints"),
        mode="inference", evaluation_checkpoint=evaluation_checkpoint,
    )
    v_ck, _ = C.check_for_checkpoints(
        os.path.join(
            project_directory, experiment_name, "baseline_vqvae", "checkpoints"
        ),
        mode="decoding", evaluation_checkpoint=evaluation_checkpoint,
    )
    seq_len = int(np.prod(latent_shape))
    # a conditioned prior's restore target must include the
    # conditioning-embedding params (init only creates what's used)
    conds0 = (
        [jnp.zeros((1,), jnp.int32)
         for _ in (t_cfg.conditioning_num_tokens or ())]
        if t_cfg.conditioning_num_tokens
        else None
    )
    t_state, _ = create_transformer_train_state(
        performer, jax.random.key(seed), seq_len, conditionings=conds0
    )
    t_state = C.load_checkpoint(t_ck, t_state)
    stride = int(np.prod([p[1] for p in v_cfg.downsample_parameters]))
    input_shape = tuple(s * stride for s in latent_shape)
    v_state, _, _ = create_vqvae_train_state(vqvae, jax.random.key(seed + 1), input_shape)
    v_state = C.load_checkpoint(v_ck, v_state)
    logger.info(f"Loaded prior {t_ck} and vqvae {v_ck}")

    dev = jax.devices()[0]
    p_vars = jax.device_put({"params": t_state.params, "favor": t_state.favor}, dev)
    v_vars = jax.device_put({"params": v_state.g_params, "vq": v_state.vq}, dev)

    conds = None
    if t_cfg.conditioning_num_tokens and conditioning_values is None:
        # a conditioned prior never saw the raw BOS embedding in
        # training (bos_replacement overwrites it every step) —
        # sampling it unconditioned would be silently out-of-
        # distribution, so demand explicit values like the runner does
        raise ValueError(
            "the prior was trained with conditioning_num_tokens="
            f"{t_cfg.conditioning_num_tokens!r}; pass "
            "--conditioning_values=(v0,...) to sample from it"
        )
    if conditioning_values is not None:
        vals = conditioning_values
        if isinstance(vals, (int, float)):
            vals = (vals,)
        n_tok = t_cfg.conditioning_num_tokens or ()
        if len(vals) != len(n_tok):
            raise ValueError(
                f"conditioning_values has {len(vals)} entries but the "
                f"prior was built with conditioning_num_tokens={n_tok!r}"
            )
        conds = [
            jnp.full((batch_size,), int(v), jnp.int32) for v in vals
        ]
        logger.info(f"conditioning on token indices {tuple(vals)}")

    synth = make_synthesizer(
        performer, vqvae, ordering, batch=batch_size,
        temperature=temperature, top_k=top_k, do_sample=sample,
        with_conditionings=conds is not None,
    )
    os.makedirs(output_directory or ".", exist_ok=True)
    written = []
    key = jax.random.key(seed)
    n_batches = -(-num_volumes // batch_size)
    t0 = time.perf_counter()
    for b in range(n_batches):
        key, sub = jax.random.split(key)
        volumes, grids = synth(p_vars, v_vars, sub, conds)
        volumes = np.asarray(volumes, np.float32)
        grids = np.asarray(grids).astype(np.uint16)
        for i in range(volumes.shape[0]):
            idx = b * batch_size + i
            if idx >= num_volumes:
                break
            out = os.path.join(output_directory, f"synth_{idx:04d}.nii.gz")
            save_nifti(out, volumes[i, ..., 0])
            written.append(out)
            if save_latents:
                np.save(
                    os.path.join(output_directory, f"synth_{idx:04d}_latents.npy"),
                    grids[i],
                )
    dt = time.perf_counter() - t0
    logger.info(
        f"Wrote {len(written)} volumes in {dt:.1f}s "
        f"({len(written) * 60 / dt:.1f} volumes/min)"
    )
    return written


if __name__ == "__main__":
    from synthanatomy_tpu.cli import dispatch

    dispatch({"run": run})

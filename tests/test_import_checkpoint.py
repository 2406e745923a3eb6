"""tools/import_checkpoint.py — the converted-weights → runnable
experiment bridge (the reference release contract is a ready-to-run
``checkpoint_epoch=0`` inside an experiment tree, reference
README.md:28).  An npz in the converters' flat layout must import into
a checkpoint the NORMAL CLIs can drive."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flatten(tree_with_labels):
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree_with_labels)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def test_import_performer_and_sample(tmp_path):
    """npz (paper-form prior: ReZero + spatial + conditioning + favor
    projections) → import_checkpoint → run_transformer --mode=inference
    writes samples; the imported form is auto-detected."""
    from synthanatomy_tpu.config import TransformerConfig
    from synthanatomy_tpu.runners.transformer import (
        build_ordering,
        build_performer,
    )
    from synthanatomy_tpu.train.transformer_steps import (
        create_transformer_train_state,
    )
    from tools.import_checkpoint import import_performer

    grid = (3, 3, 3)
    net = dict(
        vocab_size=16, n_embd=32, n_layers=2, n_head=4, dim_head=8,
        nb_features=8, local_attn_heads=2, local_window_size=8,
        ordering_type="raster_scan", compute_dtype="float32",
    )
    cfg = TransformerConfig(
        mode="inference",
        use_rezero=True, spatial_position_emb="absolute",
        conditioning_num_tokens=(5,), conditioning_type="bos_replacement",
        **net,
    )
    ordering = build_ordering(cfg, grid)
    model = build_performer(cfg, ordering, grid)
    state, _ = create_transformer_train_state(
        model, jax.random.key(3), int(np.prod(grid)),
        conditionings=[jnp.zeros((1,), jnp.int32)],
    )
    npz_path = str(tmp_path / "prior.npz")
    np.savez(
        npz_path,
        **_flatten({"params": state.params, "favor": state.favor}),
    )

    path = import_performer(
        npz_path,
        project_directory=str(tmp_path), experiment_name="imported",
        latent_shape=grid, **net,
    )
    assert path.endswith("checkpoint_epoch=0")

    # the normal CLI drives the imported checkpoint (conditioned prior
    # needs the conditioning CSV data path)
    import pandas as pd

    # the reference derives conditioning vocab sizes from the CSV's
    # nunique() (src/utils/transformer.py:104) — the inference CSV must
    # carry the training-time 5 distinct values for the imported
    # (5-token) conditioning table to be rebuilt at the right size
    n_subj = 5
    lat_dir = str(tmp_path / "latents")
    os.makedirs(lat_dir)
    rng = np.random.default_rng(0)
    for i in range(n_subj):
        np.save(
            f"{lat_dir}/s{i}_quantization_0.npy",
            rng.integers(0, 16, grid).astype(np.uint16),
        )
    cond_csv = str(tmp_path / "cond.csv")
    pd.DataFrame(
        {
            "subject": [f"s{i}_quantization_0.npy" for i in range(n_subj)],
            "age": [50.0, 55.0, 60.0, 65.0, 70.0],
        }
    ).to_csv(cond_csv, index=False)

    from run_transformer import run as run_transformer

    res = run_transformer(
        mode="inference",
        training_subjects=lat_dir,
        project_directory=str(tmp_path),
        experiment_name="imported",
        eval_batch_size=5,
        num_workers=0,
        use_rezero=True, spatial_position_emb="absolute",
        conditioning_path=cond_csv, conditionings=("age",),
        conditioning_type="bos_replacement",
        temperature=1.0, top_k=8,
        **net,
    )
    assert len(res["written"]) == n_subj
    samp = np.load(res["written"][0])
    assert samp.dtype == np.uint16 and samp.shape == grid
    assert samp.max() < 16


def test_import_vqvae_and_decode(tmp_path):
    """npz (VQ-VAE params + codebook) → import_checkpoint →
    run_vqvae --mode=decoding decodes latents through the imported
    weights, bit-identically to decoding with the source state."""
    from synthanatomy_tpu.config import VQVAEConfig
    from synthanatomy_tpu.runners.vqvae import build_vqvae
    from synthanatomy_tpu.train.vqvae_steps import create_vqvae_train_state
    from tools.import_checkpoint import import_vqvae

    net = dict(
        no_levels=2,
        downsample_parameters=((4, 2, 1, 1), (4, 2, 1, 1)),
        upsample_parameters=((4, 2, 1, 0, 1), (4, 2, 1, 0, 1)),
        no_channels=8, no_res_layers=1,
        num_embeddings=(16,), embedding_dim=(4,),
        use_pallas_vq=False, compute_dtype="float32",
    )
    cfg = VQVAEConfig(mode="decoding", adversarial_component=False, **net)
    model = build_vqvae(cfg)
    state, _, _ = create_vqvae_train_state(
        model, jax.random.key(1), (12, 12, 12)
    )
    npz_path = str(tmp_path / "vqvae.npz")
    np.savez(
        npz_path, **_flatten({"params": state.g_params, "vq": state.vq})
    )

    path = import_vqvae(
        npz_path,
        project_directory=str(tmp_path), experiment_name="imported",
        input_size=(12, 12, 12), **net,
    )
    assert path.endswith("checkpoint_epoch=0")

    lat_dir = str(tmp_path / "latents")
    os.makedirs(lat_dir)
    rng = np.random.default_rng(0)
    lat = rng.integers(0, 16, (3, 3, 3)).astype(np.uint16)
    np.save(f"{lat_dir}/s0_quantization_0.npy", lat)

    from run_vqvae import run as run_vqvae

    res = run_vqvae(
        mode="decoding",
        training_subjects=lat_dir,
        project_directory=str(tmp_path),
        experiment_name="imported",
        batch_size=1, num_workers=0,
        adversarial_component=False,
        evaluation_checkpoint="recent",
        **net,
    )
    nii = [p for p in res["written"] if p.endswith("_sample.nii.gz")]
    assert len(nii) == 1

    # bit-identical to decoding straight through the source state
    from synthanatomy_tpu.data.nifti import load_nifti

    decoded = np.asarray(load_nifti(nii[0], as_closest_canonical=False).data)
    direct = np.asarray(
        model.apply(
            {"params": state.g_params, "vq": state.vq},
            [jnp.asarray(lat[None], jnp.int32)],
            method=model.decode_samples,
        )
    )[0, ..., 0]
    np.testing.assert_allclose(decoded, direct, rtol=1e-6, atol=1e-6)

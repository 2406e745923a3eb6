"""Full two-stage pipeline integration test on synthetic data:

train VQ-VAE → extract latents (.npy uint16) → train Performer on the
latents → sample new latents (*_sample.npy) → decode samples back to
NIfTI volumes — the complete reference workflow (SURVEY.md §3) driven
through the public CLI entry points.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthanatomy_tpu.data.nifti import load_nifti, save_nifti


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_dir = root / "data"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        vol = rng.uniform(size=(32, 32, 32)).astype(np.float32)
        save_nifti(str(data_dir / f"subj{i}.nii.gz"), vol)
    return {"root": str(root), "data": str(data_dir)}


VQVAE_FLAGS = dict(
    mode="training",
    project_directory=None,  # filled per test
    experiment_name="e2e",
    epochs=2,
    batch_size=2,
    eval_batch_size=2,
    eval_every=2,
    checkpoint_every=1,
    num_workers=2,
    prefetch_factor=2,
    loss="mse",
    adversarial_component=True,
    no_levels=2,
    downsample_parameters=((4, 2, 1, 1), (4, 2, 1, 1)),
    upsample_parameters=((4, 2, 1, 0, 1), (4, 2, 1, 0, 1)),
    no_channels=8,
    no_res_layers=1,
    num_embeddings=(16,),
    embedding_dim=(4,),
    decay=(0.5,),
    gamma=0.999,
    compute_dtype="float32",
    use_pallas_vq=False,
)


def test_full_pipeline(project):
    from run_transformer import run as run_transformer
    from run_vqvae import run as run_vqvae

    # ---- stage 1: training -------------------------------------------
    flags = dict(VQVAE_FLAGS)
    flags["project_directory"] = project["root"]
    flags["training_subjects"] = project["data"]
    flags["validation_subjects"] = project["data"]
    result = run_vqvae(**flags)
    ckdir = os.path.join(
        project["root"], "e2e", "baseline_vqvae", "checkpoints"
    )
    assert any(n.startswith("checkpoint_epoch=") for n in os.listdir(ckdir))
    # the reference's end-of-training raw release artifact
    # (run_vqvae.py:389-392): one torch-loadable state dict
    import torch

    raw = os.path.join(ckdir, "model_state_dict_epoch=2.pt")
    assert os.path.exists(raw)
    sd = torch.load(raw, weights_only=True)
    assert "quantizer.0.impl.embedding.weight" in sd
    assert tuple(sd["quantizer.0.impl.embedding.weight"].shape) == (16, 4)
    assert len(result["history"]) == 2
    assert np.isfinite(result["history"][-1]["Loss-Reconstruction-Total"])
    # the discriminator patch map must be non-empty at this volume size
    # (an empty map silently NaNs every adversarial loss)
    assert np.isfinite(result["history"][-1]["Loss-Discriminator-Total"])

    # ---- stage 1: extracting -----------------------------------------
    flags_ex = dict(flags)
    flags_ex["mode"] = "extracting"
    out = run_vqvae(**flags_ex)
    outputs_dir = os.path.join(project["root"], "e2e", "baseline_vqvae", "outputs")
    latents = [f for f in os.listdir(outputs_dir) if f.endswith("_quantization_0.npy")]
    recons = [f for f in os.listdir(outputs_dir) if f.endswith("_reconstruction.nii.gz")]
    assert len(latents) == 4 and len(recons) == 4
    # adversarial training was on → per-sample elementwise criterion
    # maps are saved alongside (reference run_vqvae.py:516-531)
    adv = [f for f in os.listdir(outputs_dir) if f.endswith("_adversarial_loss.npy")]
    assert len(adv) == 4
    adv0 = np.load(os.path.join(outputs_dir, adv[0]))
    assert adv0.dtype == np.float32 and (adv0 >= 0).all()
    lat = np.load(os.path.join(outputs_dir, latents[0]))
    assert lat.dtype == np.uint16
    assert lat.shape == (8, 8, 8)
    assert lat.max() < 16
    # augmentation trace CSV written
    logs_dir = os.path.join(project["root"], "e2e", "baseline_vqvae", "logs")
    assert any("transformations_trace" in n for n in os.listdir(logs_dir))

    # move latents into their own dir for stage 2
    lat_dir = os.path.join(project["root"], "latents")
    os.makedirs(lat_dir, exist_ok=True)
    for f in latents:
        os.rename(os.path.join(outputs_dir, f), os.path.join(lat_dir, f))

    # ---- stage 2: training -------------------------------------------
    t_res = run_transformer(
        mode="training",
        training_subjects=lat_dir,
        validation_subjects=lat_dir,
        project_directory=project["root"],
        experiment_name="e2e",
        epochs=2,
        batch_size=2,
        eval_batch_size=2,
        eval_every=2,
        checkpoint_every=1,
        log_every=1,
        num_workers=2,
        vocab_size=16,
        n_embd=16,
        n_layers=1,
        n_head=2,
        dim_head=8,
        nb_features=8,
        local_attn_heads=1,
        local_window_size=8,
        ordering_type="hilbert",
        spatial_position_emb="fixed",
        gamma=0.999,
        compute_dtype="float32",
    )
    assert np.isfinite(t_res["history"][-1]["Loss"])
    t_ckdir = os.path.join(project["root"], "e2e", "performer", "checkpoints")
    assert any(n.startswith("checkpoint_epoch=") for n in os.listdir(t_ckdir))
    t_raw = os.path.join(t_ckdir, "model_state_dict_epoch=2.pt")
    assert os.path.exists(t_raw)  # reference run_transformer.py:290-292
    t_sd = torch.load(t_raw, weights_only=True)
    assert "token_emb.weight" in t_sd and "norm.weight" in t_sd

    # ---- stage 2: inference (sampling) -------------------------------
    s_res = run_transformer(
        mode="inference",
        training_subjects=lat_dir,
        validation_subjects=lat_dir,
        project_directory=project["root"],
        experiment_name="e2e",
        eval_batch_size=2,
        num_workers=2,
        vocab_size=16,
        n_embd=16,
        n_layers=1,
        n_head=2,
        dim_head=8,
        nb_features=8,
        local_attn_heads=1,
        local_window_size=8,
        ordering_type="hilbert",
        spatial_position_emb="fixed",
        temperature=1.0,
        top_k=8,
        compute_dtype="float32",
    )
    t_out = os.path.join(project["root"], "e2e", "performer", "outputs")
    samples = [f for f in os.listdir(t_out) if f.endswith("_sample.npy")]
    assert len(samples) == 4
    samp = np.load(os.path.join(t_out, samples[0]))
    assert samp.dtype == np.uint16 and samp.shape == (8, 8, 8)
    assert samp.max() < 16  # BOS token never emitted

    # ---- stage 1: decoding the sampled latents -----------------------
    samp_dir = os.path.join(project["root"], "samples")
    os.makedirs(samp_dir, exist_ok=True)
    for f in samples:
        os.rename(os.path.join(t_out, f), os.path.join(samp_dir, f))
    flags_dec = dict(flags)
    flags_dec["mode"] = "decoding"
    flags_dec["training_subjects"] = samp_dir
    # stamp patient-space orientation from a source scan
    flags_dec["decoding_affine"] = os.path.join(project["data"], "subj0.nii.gz")
    run_vqvae(**flags_dec)
    decoded = [
        f for f in os.listdir(outputs_dir) if f.endswith("_sample.nii.gz")
    ]
    assert len(decoded) == 4
    img = load_nifti(os.path.join(outputs_dir, decoded[0]), as_closest_canonical=False)
    assert img.data.shape == (32, 32, 32)
    assert np.isfinite(img.data).all()
    src_aff = load_nifti(
        os.path.join(project["data"], "subj0.nii.gz"), as_closest_canonical=False
    ).affine
    out_aff = load_nifti(
        os.path.join(outputs_dir, decoded[0]), as_closest_canonical=False
    ).affine
    np.testing.assert_allclose(out_aff, src_aff)
    # decoding with adversarial on also writes criterion maps:
    # 4 from extracting + 4 from decoding
    all_adv = [f for f in os.listdir(outputs_dir) if f.endswith("_adversarial_loss.npy")]
    assert len(all_adv) == 8


def test_train_then_sample_reproduces_learned_pattern():
    """Trainability + sampling coherence: a tiny Performer trained on a
    deterministic position→token pattern must greedily sample that
    exact pattern back through the full BOS/shift/ordering path — any
    off-by-one in prepare_batch, BOS handling or the cached decode
    breaks this."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from synthanatomy_tpu.models.ordering import Ordering
    from synthanatomy_tpu.models.performer import Performer
    from synthanatomy_tpu.models.sampling import make_sampler
    from synthanatomy_tpu.runners.transformer import prepare_batch
    from synthanatomy_tpu.train.transformer_steps import (
        create_transformer_train_state,
        make_transformer_train_step,
    )

    grid = (2, 3, 2)
    vocab = 12
    seq = int(np.prod(grid))
    ordering = Ordering("raster_scan", 3, grid)

    # deterministic pattern: token at flat position p is (3*p) % vocab
    pattern = (3 * np.arange(seq)) % vocab
    latents = np.broadcast_to(pattern.reshape(grid), (8,) + grid)

    model = Performer(
        num_tokens=vocab + 1, max_seq_len=seq + 1, dim=32, depth=2,
        heads=2, dim_head=8, nb_features=16, dtype=jnp.float32,
        scan_chunk=8,
    )
    state, tx = create_transformer_train_state(
        model, jax.random.key(0), seq + 1, learning_rate=3e-3
    )
    step = jax.jit(make_transformer_train_step(model, tx), donate_argnums=0)

    inputs, targets = prepare_batch(latents, ordering, vocab)
    inputs = jnp.asarray(inputs)
    targets = jnp.asarray(targets)
    loss = None
    for _ in range(150):
        state, metrics = step(state, inputs, targets, None, {"lr": 3e-3})
    loss = float(np.asarray(metrics["Loss"]))
    assert loss < 0.1, f"tiny model failed to fit the pattern (CE={loss})"

    sampler = make_sampler(
        model, ordering, batch=2, do_sample=False, fused=False
    )
    grids = np.asarray(
        sampler({"params": state.params, "favor": state.favor}, jax.random.key(1))
    )
    expected = pattern.reshape(grid)
    np.testing.assert_array_equal(grids[0], expected)
    np.testing.assert_array_equal(grids[1], expected)

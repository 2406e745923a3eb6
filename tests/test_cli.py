import pytest

from synthanatomy_tpu.cli import dispatch, parse_argv, parse_value


def test_parse_value_literals():
    assert parse_value("3") == 3
    assert parse_value("0.5") == 0.5
    assert parse_value("True") is True
    assert parse_value("false") is False
    assert parse_value("None") is None
    assert parse_value("((16,176),(16,240),(96,256))") == (
        (16, 176), (16, 240), (96, 256),
    )
    assert parse_value("(2048,)") == (2048,)
    assert parse_value("jukebox_perceptual") == "jukebox_perceptual"
    assert parse_value("/some/path.nii.gz") == "/some/path.nii.gz"


def test_parse_argv_forms():
    pos, kw = parse_argv(
        [
            "run",
            "--mode=training",
            "--batch_size", "8",
            "--roi=((16,176),(16,240),(96,256))",
            "--amp",
            "--nodeterministic",
            "--learning-rate=0.0003",
        ]
    )
    assert pos == ["run"]
    assert kw["mode"] == "training"
    assert kw["batch_size"] == 8
    assert kw["roi"] == ((16, 176), (16, 240), (96, 256))
    assert kw["amp"] is True
    assert kw["deterministic"] is False
    assert kw["learning_rate"] == 0.0003


def test_dispatch():
    calls = {}

    def run(**kw):
        calls.update(kw)
        return "ok"

    assert dispatch({"run": run}, ["run", "--epochs=5"]) == "ok"
    assert calls == {"epochs": 5}
    with pytest.raises(SystemExit):
        dispatch({"run": run}, [])
    with pytest.raises(SystemExit):
        dispatch({"run": run}, ["fly"])


def test_run_vqvae_flag_surface_matches_reference():
    """Every flag of the reference run() signature must be accepted."""
    import inspect

    from run_vqvae import run

    params = set(inspect.signature(run).parameters)
    reference_flags = {
        "training_subjects", "validation_subjects", "project_directory",
        "experiment_name", "mode", "no_augmented_extractions", "device",
        "distributed_port", "amp", "deterministic", "cuda_benchmark", "seed",
        "epochs", "learning_rate", "gamma", "log_every", "checkpoint_every",
        "eval_every", "augmentation_probability", "augmentation_strength",
        "loss", "adversarial_component", "finetune_adversarial_component",
        "finetune_patience", "discriminator_network",
        "discriminator_learning_rate", "discriminator_loss", "generator_loss",
        "use_adversarial_adaptive_weight",
        "adaptive_adversarial_weight_threshold",
        "adaptive_adversarial_weight_value", "initial_factor_value",
        "initial_factor_steps", "max_factor_steps", "max_factor_value",
        "normalize", "roi", "batch_size", "patch_size", "eval_batch_size",
        "eval_patch_size", "training_epoch_length", "num_workers",
        "prefetch_factor", "starting_epoch", "network", "use_subpixel_conv",
        "use_slim_residual", "no_levels", "downsample_parameters",
        "upsample_parameters", "no_res_layers", "no_channels",
        "codebook_type", "num_embeddings", "embedding_dim", "embedding_init",
        "commitment_cost", "decay", "decay_warmup", "max_decay_epochs",
        "norm", "dropout", "act", "output_act", "evaluation_checkpoint",
        "load_nii_canonical", "save_2d_images", "save_3d_images",
    }
    missing = reference_flags - params
    assert not missing, f"missing reference flags: {missing}"


def test_run_transformer_flag_surface_matches_reference():
    import inspect

    from run_transformer import run

    params = set(inspect.signature(run).parameters)
    reference_flags = {
        "training_subjects", "validation_subjects", "project_directory",
        "experiment_name", "mode", "conditioning_path", "conditionings",
        "conditioning_type", "device", "deterministic", "cuda_benchmark",
        "seed", "epochs", "learning_rate", "gamma", "log_every",
        "checkpoint_every", "eval_every", "sample", "temperature", "top_k",
        "batch_size", "eval_batch_size", "num_workers", "prefetch_factor",
        "starting_epoch", "ordering_type", "reflected_spatial_dims",
        "transpositions_axes", "rot90_axes", "transformation_order",
        "network", "vocab_size", "n_embd", "n_layers", "n_head",
        "local_attn_heads", "local_window_size", "feature_redraw_interval",
        "generalized_attention", "emb_dropout", "ff_dropout", "attn_dropout",
        "use_rezero", "position_emb", "spatial_position_emb",
        "evaluation_checkpoint",
    }
    missing = reference_flags - params
    assert not missing, f"missing reference flags: {missing}"


def test_inferers_api():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from synthanatomy_tpu.inferers import (
        TransformerTrainingInferer,
        VQVAEDecodingInferer,
        VQVAEExtractionInferer,
    )
    from synthanatomy_tpu.models.vqvae import BaselineVQVAE

    model = BaselineVQVAE(
        n_levels=1,
        downsample_parameters=((4, 2, 1, 1),),
        upsample_parameters=((4, 2, 1, 0, 1),),
        n_embed=8, embed_dim=4, n_channels=4, n_res_channels=4,
        n_res_layers=1, dtype=jnp.float32, use_pallas_vq=False,
    )
    x = jnp.ones((1, 8, 8, 8, 1))
    variables = model.init(jax.random.key(0), x)

    ext = VQVAEExtractionInferer(model)(variables, x)
    assert "reconstruction" in ext and "quantization_0" in ext
    assert ext["quantization_0"].shape == (1, 4, 4, 4)

    dec = VQVAEDecodingInferer(model)(variables, [ext["quantization_0"]])
    np.testing.assert_allclose(
        np.asarray(dec["sample"][0]), np.asarray(ext["reconstruction"][0]),
        rtol=1e-5, atol=1e-6,
    )

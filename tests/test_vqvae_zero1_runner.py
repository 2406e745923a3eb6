"""CLI-level ZeRO-1 for the VQ-VAE: ``--zero1=True`` under pure DP
must shard BOTH optimizers' Adam moments over the data axis and train
to the same loss as the replicated run (the moments are only resharded
state — the update math is unchanged)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthanatomy_tpu.data.nifti import save_nifti


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("niftis")
    rng = np.random.default_rng(0)
    for i in range(4):
        save_nifti(
            str(d / f"subj{i}.nii.gz"),
            rng.uniform(size=(16, 16, 16)).astype(np.float32),
        )
    return str(d)


def _run(project_dir, data_dir, name, **extra):
    from run_vqvae import run as run_vqvae

    flags = dict(
        mode="training",
        training_subjects=data_dir,
        project_directory=project_dir,
        experiment_name=name,
        epochs=1,
        batch_size=2,
        checkpoint_every=1,
        num_workers=0,
        loss="mse",
        adversarial_component=False,
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
        seed=7,
    )
    flags.update(extra)
    return run_vqvae(**flags)


def test_cli_vqvae_zero1_matches_replicated(tmp_path, data_dir):
    base = _run(str(tmp_path), data_dir, "repl", mesh_shape=(2,))
    z1 = _run(str(tmp_path), data_dir, "zero1", mesh_shape=(2,), zero1=True)
    np.testing.assert_allclose(
        z1["history"][-1]["Loss-MSE-Reconstruction"],
        base["history"][-1]["Loss-MSE-Reconstruction"],
        rtol=1e-5,
    )


def test_finetune_gate_release_is_sticky():
    """Regression: the release must survive a streak that completes and
    then BREAKS before the host's periodic check — the old counter-only
    gate (reset to 0 on the first out-of-range step) lost it and could
    freeze the generator forever."""
    import jax.numpy as jnp

    from synthanatomy_tpu.runners.vqvae import make_finetune_gate

    gate = make_finetune_gate(0.4, 0.6, patience=3)
    counter = jnp.zeros((), jnp.int32)
    released = jnp.zeros((), jnp.bool_)
    # 3 in-range steps complete the streak...
    for _ in range(3):
        counter, released = gate(counter, released, jnp.float32(0.5))
    assert bool(released)
    # ...then the loss leaves the band BEFORE the host looks: the
    # counter resets but the release decision must persist
    counter, released = gate(counter, released, jnp.float32(0.9))
    assert int(counter) == 0
    assert bool(released)

    # never-released case stays False
    c2 = jnp.zeros((), jnp.int32)
    r2 = jnp.zeros((), jnp.bool_)
    for v in (0.5, 0.5, 0.9, 0.5, 0.5):
        c2, r2 = gate(c2, r2, jnp.float32(v))
    assert not bool(r2)


def test_cli_vqvae_eval_with_uneven_tail_batch(tmp_path, data_dir):
    """Regression: a validation set whose tail batch is not divisible
    by the mesh (3 subjects, eval_batch_size=2, 2-device mesh) crashed
    shard_batch with a device_put divisibility error; the uneven tail
    must run replicated instead."""
    import shutil

    val_dir = str(tmp_path / "val3")
    os.makedirs(val_dir)
    for i in range(3):
        shutil.copy(
            os.path.join(data_dir, f"subj{i}.nii.gz"),
            os.path.join(val_dir, f"val{i}.nii.gz"),
        )
    res = _run(
        str(tmp_path), data_dir, "uneven_eval",
        validation_subjects=val_dir,
        eval_batch_size=2,
        eval_every=1,
    )
    assert np.isfinite(res["history"][-1]["Loss-MSE-Reconstruction"])
    # the eval actually ran (best-metric checkpoint written)
    ckdir = os.path.join(
        str(tmp_path), "uneven_eval", "baseline_vqvae", "checkpoints"
    )
    assert any("key_metric" in n for n in os.listdir(ckdir)), os.listdir(ckdir)

"""Preemption semantics: a run that stops early must NOT write the
final ``checkpoint_epoch=<config.epochs>`` name — auto-resume
(starting_epoch=-1 → max epoch) would then believe training completed
and silently skip the remaining epochs."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthanatomy_tpu.data.nifti import save_nifti


class _TrippedGuard:
    """Stands in for PreemptionGuard: preemption signalled from the
    start, so the loop checkpoints epoch 1 and breaks."""

    should_stop = True

    def __init__(self, *a, **k):
        pass

    def restore(self):
        pass


def test_preempted_vqvae_training_skips_final_checkpoint(
    tmp_path, monkeypatch
):
    from synthanatomy_tpu.utils import general as G

    monkeypatch.setattr(G, "PreemptionGuard", _TrippedGuard)

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        save_nifti(
            str(data_dir / f"s{i}.nii.gz"),
            rng.uniform(size=(16, 16, 16)).astype(np.float32),
        )

    from run_vqvae import run as run_vqvae

    run_vqvae(
        mode="training",
        project_directory=str(tmp_path),
        experiment_name="preempt",
        training_subjects=str(data_dir),
        epochs=3,
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
    )
    ckdir = os.path.join(str(tmp_path), "preempt", "baseline_vqvae", "checkpoints")
    names = sorted(os.listdir(ckdir))
    # the loop broke after epoch 1 (emergency checkpoint written); the
    # epochs=3 final name must be absent or resume would skip epochs 2-3
    assert names == ["checkpoint_epoch=1"]

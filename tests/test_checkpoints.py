import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthanatomy_tpu.train import checkpoints as C
from synthanatomy_tpu.train.vqvae_steps import create_vqvae_train_state
from synthanatomy_tpu.models.vqvae import BaselineVQVAE


def _tiny_state():
    model = BaselineVQVAE(
        n_levels=1,
        downsample_parameters=((4, 2, 1, 1),),
        upsample_parameters=((4, 2, 1, 0, 1),),
        n_embed=8, embed_dim=4, n_channels=4, n_res_channels=4,
        n_res_layers=1, dtype=jnp.float32, use_pallas_vq=False,
    )
    state, _, _ = create_vqvae_train_state(model, jax.random.key(0), (8, 8, 8))
    return state


def test_folder_structure_and_auto_resume_flip(tmp_path):
    logger = logging.getLogger("t")
    dirs, se = C.create_folder_structure(str(tmp_path), "exp", "baseline_vqvae")
    assert se == 0
    for key in ("checkpoint_directory", "logs_directory", "outputs_directory", "cache_dir"):
        assert os.path.isdir(dirs[key])
    # non-empty checkpoint dir flips starting_epoch to -1
    os.makedirs(os.path.join(dirs["checkpoint_directory"], "checkpoint_epoch=3"))
    _, se2 = C.create_folder_structure(
        str(tmp_path), "exp", "baseline_vqvae", logger=logger
    )
    assert se2 == -1


def test_save_load_roundtrip_and_prune(tmp_path):
    state = _tiny_state()
    ckdir = str(tmp_path)
    C.save_checkpoint(ckdir, state, epoch=1)
    p2 = C.save_checkpoint(ckdir, state.replace(step=state.step + 5), epoch=2)
    # n_saved=1: epoch 1 pruned
    names = sorted(os.listdir(ckdir))
    assert names == ["checkpoint_epoch=2"]

    restored = C.load_checkpoint(p2, state)
    assert int(restored.step) == 5
    np.testing.assert_allclose(
        np.asarray(restored.vq["level_0"].codebook),
        np.asarray(state.vq["level_0"].codebook),
    )


def test_check_for_checkpoints_rules(tmp_path):
    state = _tiny_state()
    ckdir = str(tmp_path)
    # training, nothing there
    path, se = C.check_for_checkpoints(ckdir, mode="training", starting_epoch=0)
    assert path is None and se == 0
    with pytest.raises(FileNotFoundError):
        C.check_for_checkpoints(ckdir, mode="training", starting_epoch=-1)

    C.save_checkpoint(ckdir, state, epoch=4)
    path, se = C.check_for_checkpoints(ckdir, mode="training", starting_epoch=-1)
    assert se == 4 and path.endswith("checkpoint_epoch=4")
    with pytest.raises(FileNotFoundError):
        C.check_for_checkpoints(ckdir, mode="training", starting_epoch=9)

    # eval 'recent'
    path, _ = C.check_for_checkpoints(ckdir, mode="extracting", starting_epoch=0)
    assert path.endswith("checkpoint_epoch=4")
    # eval 'best'
    with pytest.raises(FileNotFoundError):
        C.check_for_checkpoints(
            ckdir, mode="extracting", starting_epoch=0, evaluation_checkpoint="best"
        )
    C.save_best_checkpoint(ckdir, state, 0.987)
    path, _ = C.check_for_checkpoints(
        ckdir, mode="extracting", starting_epoch=0, evaluation_checkpoint="best"
    )
    assert "checkpoint_key_metric=0.987" in path
    # a second best save replaces the first
    C.save_best_checkpoint(ckdir, state, 0.99)
    bests = [n for n in os.listdir(ckdir) if n.startswith("checkpoint_key_metric")]
    assert len(bests) == 1 and "0.99" in bests[0]

"""CLI-level pipeline parallelism: ``--pp_stages=N`` must shard the
depth axis over a ('data', 'pipe') mesh (GPipe fill-drain microbatch
schedule) and train to the same result as a single device, with
checkpoints staying in the canonical per-block layout.

The reference never shards a network depth-wise (SURVEY §2.10 lists PP
as not-required-for-parity); this is the TPU-native extension for
models deeper than one chip's HBM.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def latents_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("latents")
    rng = np.random.default_rng(0)
    for i in range(4):
        np.save(
            str(d / f"s{i}_quantization_0.npy"),
            rng.integers(0, 16, (4, 4, 4)).astype(np.uint16),
        )
    return str(d)


def _run(project_dir, latents_dir, name, **extra):
    from run_transformer import run as run_transformer

    flags = dict(
        mode="training",
        training_subjects=latents_dir,
        project_directory=project_dir,
        experiment_name=name,
        epochs=1,
        batch_size=2,
        checkpoint_every=1,
        log_every=1,
        num_workers=0,
        vocab_size=16,
        n_embd=32,
        n_layers=2,
        n_head=4,
        dim_head=8,
        nb_features=8,
        local_attn_heads=2,
        local_window_size=8,
        ordering_type="raster_scan",
        gamma=0.999,
        compute_dtype="float32",
        seed=7,
    )
    flags.update(extra)
    return run_transformer(**flags)


def test_cli_pp_trains_and_matches_single_device(tmp_path, latents_dir):
    import jax

    base = _run(
        str(tmp_path), latents_dir, "single",
        mesh_shape=(1, 1),
        use_pallas_local_attn=False, use_pallas_favor_attn=False,
    )

    # 8 devices / 2 stages → DP×PP (2, 2) mesh (data shrinks to divide
    # the batch); n_layers=2 cuts into 2 single-layer stages
    pp = _run(
        str(tmp_path), latents_dir, "pp2",
        pp_stages=2,
        use_pallas_local_attn=False, use_pallas_favor_attn=False,
    )
    # same tolerance rationale as the SP runner test: 2 Adam steps
    # amplify shard_map fp reduction-order noise
    np.testing.assert_allclose(
        pp["history"][-1]["Loss"], base["history"][-1]["Loss"], rtol=1e-4
    )
    la = dict(jax.tree_util.tree_leaves_with_path(base["state"].params))
    lb = dict(jax.tree_util.tree_leaves_with_path(pp["state"].params))
    assert la.keys() == lb.keys()  # canonical layout returned
    for path in la:
        np.testing.assert_allclose(
            np.asarray(la[path]), np.asarray(lb[path]),
            rtol=2e-3, atol=5e-4, err_msg=str(path),
        )

    # checkpoints stay canonical (single-device layout/naming) AND
    # restore into a single-device-shaped state bit-identically to the
    # returned canonical params — a PP-trained model is droppable into
    # any non-PP workflow (sampling, conversion, resume)
    ckdir = os.path.join(str(tmp_path), "pp2", "performer", "checkpoints")
    names = [n for n in os.listdir(ckdir) if n.startswith("checkpoint_epoch=")]
    assert names
    from synthanatomy_tpu.train import checkpoints as C

    restored = C.load_checkpoint(
        os.path.join(ckdir, names[0]), jax.device_get(pp["state"])
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(restored.params),
        jax.tree_util.tree_leaves_with_path(pp["state"].params),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=str(pa)
        )


def test_pp_flag_validation():
    from synthanatomy_tpu.config import TransformerConfig

    with pytest.raises(ValueError, match="mutually exclusive"):
        TransformerConfig(
            mode="training", training_subjects="x", project_directory="y",
            experiment_name="z", sp_shards=2, pp_stages=2,
        )
    with pytest.raises(ValueError, match="derives the device mesh"):
        TransformerConfig(
            mode="training", training_subjects="x", project_directory="y",
            experiment_name="z", pp_stages=2, mesh_shape=(2, 2),
        )


def test_cli_pp_rejects_indivisible_depth(tmp_path, latents_dir):
    with pytest.raises(ValueError, match="divide n_layers"):
        _run(
            str(tmp_path), latents_dir, "bad",
            pp_stages=4,  # n_layers=2 not divisible into 4 stages
            use_pallas_local_attn=False, use_pallas_favor_attn=False,
        )


def test_cli_pp_with_conditioning_matches_single_device(tmp_path, latents_dir):
    """PP training with bos_replacement conditioning through the real
    CLI data path (conditioning handled in the replicated embed prefix
    outside the pipeline loop) must match single-device training."""
    import pandas as pd

    cond_csv = str(tmp_path / "cond.csv")
    pd.DataFrame(
        {
            "subject": [f"s{i}_quantization_0.npy" for i in range(4)],
            "age": [60.0, 70.0, 60.0, 70.0],
        }
    ).to_csv(cond_csv, index=False)
    flags = dict(
        conditioning_path=cond_csv,
        conditionings=("age",),
        conditioning_type="bos_replacement",
        use_pallas_local_attn=False,
        use_pallas_favor_attn=False,
    )

    base = _run(
        str(tmp_path), latents_dir, "cond_single", mesh_shape=(1, 1), **flags
    )
    pp = _run(str(tmp_path), latents_dir, "cond_pp2", pp_stages=2, **flags)
    np.testing.assert_allclose(
        pp["history"][-1]["Loss"], base["history"][-1]["Loss"], rtol=1e-4
    )
    import jax

    la = dict(jax.tree_util.tree_leaves_with_path(base["state"].params))
    lb = dict(jax.tree_util.tree_leaves_with_path(pp["state"].params))
    assert la.keys() == lb.keys()
    for path in la:
        np.testing.assert_allclose(
            np.asarray(la[path]), np.asarray(lb[path]),
            rtol=2e-3, atol=5e-4, err_msg=str(path),
        )

"""CLI-level sequence parallelism: ``--sp_shards=N`` must shard the
token axis over a ('data', 'seq') mesh and train to the same result as
a single device (the long-context hardware lever, SURVEY §5.7 — the
reference has no equivalent; its DDP shards only the batch).

The runner path under test: runners/transformer.py builds the SP mesh,
selects ``make_sp_train_step`` (params replicated, attention
collectives over ICI) and keeps checkpoints canonical.
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


def _assert_params_close(a, b, rtol=2e-3, atol=1e-5):
    # Adam's rsqrt amplifies fp reduction-order noise near zero-moment
    # params after 1 epoch; the CE-loss pin (rtol 1e-5) is the tight
    # functional parity check
    import jax

    la = dict(jax.tree_util.tree_leaves_with_path(a))
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert la.keys() == lb.keys()
    for path in la:
        np.testing.assert_allclose(
            np.asarray(la[path]), np.asarray(lb[path]),
            rtol=rtol, atol=atol,
            err_msg=str(path),
        )


def test_cli_sp_trains_and_matches_single_device(tmp_path, latents_dir):
    base = _run(
        str(tmp_path), latents_dir, "single",
        mesh_shape=(1, 1),
        use_pallas_local_attn=False, use_pallas_favor_attn=False,
    )

    # 8 devices / 4 seq shards → DP×SP (2, 4) mesh; 4×4×4 latents
    # → 64 tokens = 4 shards × 16, window 8 | 16
    sp = _run(
        str(tmp_path), latents_dir, "sp4",
        sp_shards=4,
        use_pallas_local_attn=False, use_pallas_favor_attn=False,
    )
    # epoch CE is a mean over 2 steps: step 2 runs on params that went
    # through one Adam update, so the SP psum's fp reduction-order
    # noise (~1e-7 in the grads) is rsqrt-amplified to ~2e-5 here —
    # unlike the single-step lib tests, which pin 1e-5 with SGD
    np.testing.assert_allclose(
        sp["history"][-1]["Loss"], base["history"][-1]["Loss"], rtol=1e-4
    )
    # atol 5e-4 ≈ a few Adam steps: elements whose gradient is ~0 can
    # step ±lr when the SP psum noise flips the sign (observed on
    # 3/2080 positional-table elements); the loss pin above is the
    # tight functional check
    _assert_params_close(base["state"].params, sp["state"].params, atol=5e-4)

    # checkpoints stay canonical (single-device layout/naming)
    ckdir = os.path.join(str(tmp_path), "sp4", "performer", "checkpoints")
    assert any(n.startswith("checkpoint_epoch=") for n in os.listdir(ckdir))


def test_cli_sp_mesh_is_data_by_seq(tmp_path, latents_dir, monkeypatch):
    """The runner must build a ('data', 'seq') mesh and hand the SP
    step the real seq length (tokens, not the +BOS model capacity)."""
    captured = {}
    from synthanatomy_tpu.parallel import sequence_parallel as SP

    orig = SP.make_sp_train_step

    def spy(model, tx, mesh, seq_len, **kw):
        captured["axes"] = dict(mesh.shape)
        captured["seq_len"] = seq_len
        captured["data_axis"] = kw.get("data_axis")
        return orig(model, tx, mesh, seq_len, **kw)

    monkeypatch.setattr(SP, "make_sp_train_step", spy)
    _run(
        str(tmp_path), latents_dir, "spy_sp",
        sp_shards=4,
        use_pallas_local_attn=False, use_pallas_favor_attn=False,
    )
    assert captured["axes"] == {"data": 2, "seq": 4}
    assert captured["seq_len"] == 64
    assert captured["data_axis"] == "data"


def test_sp_flag_validation():
    from synthanatomy_tpu.config import TransformerConfig

    with pytest.raises(ValueError, match="derives the device mesh"):
        TransformerConfig(
            mode="training", training_subjects="x", project_directory="y",
            experiment_name="z", sp_shards=2, mesh_shape=(2, 2),
        )
    with pytest.raises(ValueError, match="zero1"):
        TransformerConfig(
            mode="training", training_subjects="x", project_directory="y",
            experiment_name="z", sp_shards=2, zero1=True,
        )


def test_vqvae_rejects_model_mesh_axis():
    """(d, m>1) meshes silently replicated the conv model over the
    model axis before; now an explicit config error points at DP."""
    from synthanatomy_tpu.config import VQVAEConfig

    with pytest.raises(ValueError, match="data-parallel only"):
        VQVAEConfig(
            mode="training", training_subjects="x", project_directory="y",
            experiment_name="z", mesh_shape=(2, 2),
        )
    # (N,) and (N, 1) stay accepted
    VQVAEConfig(
        mode="training", training_subjects="x", project_directory="y",
        experiment_name="z", mesh_shape=(2, 1),
    )


def test_cli_sp_with_conditioning_matches_single_device(tmp_path, latents_dir):
    """SP training with bos_replacement conditioning through the REAL
    CLI data path (conditioning CSV join → token embeddings → shard-0
    injection inside the SP step) must match single-device training."""
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
    sp = _run(str(tmp_path), latents_dir, "cond_sp4", sp_shards=4, **flags)
    np.testing.assert_allclose(
        sp["history"][-1]["Loss"], base["history"][-1]["Loss"], rtol=1e-4
    )
    _assert_params_close(base["state"].params, sp["state"].params, atol=5e-4)

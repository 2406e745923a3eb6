"""CLI-level tensor parallelism: ``--mesh_shape='(d,m)'`` must
actually shard the model axis and train to the same result as a
single device.

Covers the two runner TP paths:

- GSPMD DP×TP (``(2,2)``): params + Adam moments Megatron-sharded via
  ``shard_transformer_state`` (previously the runner replicated and
  silently wasted the model axis);
- manual Megatron shard_map step (``(1,2)`` + Pallas flags): packed
  head layout on device, canonical layout in results/checkpoints.
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


def test_cli_tp_mesh_trains_and_matches_single_device(tmp_path, latents_dir):
    import jax

    base = _run(
        str(tmp_path), latents_dir, "single",
        mesh_shape=(1, 1),
        use_pallas_local_attn=False, use_pallas_favor_attn=False,
    )

    # --- GSPMD DP×TP (2,2): params sharded over 'model'
    gspmd = _run(
        str(tmp_path), latents_dir, "gspmd22",
        mesh_shape=(2, 2),
        use_pallas_local_attn=False, use_pallas_favor_attn=False,
    )
    np.testing.assert_allclose(
        gspmd["history"][-1]["Loss"], base["history"][-1]["Loss"], rtol=1e-5
    )
    _assert_params_close(base["state"].params, gspmd["state"].params)

    # --- manual Megatron TP (1,2) with Pallas flags on (CPU fallback
    # inside the kernels; the PATH selection is what's under test)
    manual = _run(
        str(tmp_path), latents_dir, "manual12",
        mesh_shape=(1, 2),
        use_pallas_local_attn=True, use_pallas_favor_attn=True,
    )
    np.testing.assert_allclose(
        manual["history"][-1]["Loss"], base["history"][-1]["Loss"], rtol=1e-5
    )
    # returned state is canonical (unpacked) — directly comparable
    _assert_params_close(base["state"].params, manual["state"].params)

    # checkpoints restore into the single-device layout
    ckdir = os.path.join(str(tmp_path), "manual12", "performer", "checkpoints")
    assert any(n.startswith("checkpoint_epoch=") for n in os.listdir(ckdir))


def test_cli_gspmd_tp_actually_shards(tmp_path, latents_dir, monkeypatch):
    """Regression for the silent-replication bug: with a model axis the
    runner must place the qkv kernels with a 'model'-sharded spec."""
    captured = {}
    from synthanatomy_tpu.parallel import sharding_rules as SR

    orig_shard = SR.shard_transformer_state

    def spy(mesh, tx, state, *a, **k):
        out = orig_shard(mesh, tx, state, *a, **k)
        captured["spec"] = out.params["block_0"]["attn"]["to_q"][
            "kernel"
        ].sharding.spec
        return out

    monkeypatch.setattr(SR, "shard_transformer_state", spy)
    _run(
        str(tmp_path), latents_dir, "spy22",
        mesh_shape=(2, 2),
        use_pallas_local_attn=False, use_pallas_favor_attn=False,
    )
    from jax.sharding import PartitionSpec as P

    assert captured["spec"] == P(None, "model")


def test_cli_zero1_shards_moments(tmp_path, latents_dir):
    """--zero1 under pure DP: Adam moments sharded on the data axis."""
    res = _run(
        str(tmp_path), latents_dir, "zero1",
        mesh_shape=(2,), zero1=True,
        use_pallas_local_attn=False, use_pallas_favor_attn=False,
    )
    assert np.isfinite(res["history"][-1]["Loss"])


def test_cli_zero1_with_pallas_flags_avoids_dp_shard_map(
    tmp_path, latents_dir, monkeypatch
):
    """Regression: with the (default-on) Pallas attention flags, the
    pure-DP multi-chip branch used the shard_map DP step whose P()
    specs silently RE-REPLICATED the ZeRO-1-sharded Adam moments while
    the runner logged them as sharded.  With --zero1 the runner must
    take the GSPMD step (kernels stay active via custom_partitioning),
    which honors the sharding."""
    called = {}
    from synthanatomy_tpu.train import transformer_steps as TS

    orig = TS.make_transformer_train_step_dp

    def spy(*a, **k):
        called["dp_step"] = True
        return orig(*a, **k)

    monkeypatch.setattr(TS, "make_transformer_train_step_dp", spy)
    res = _run(
        str(tmp_path), latents_dir, "zero1_pallas",
        mesh_shape=(2,), zero1=True,
        use_pallas_local_attn=True, use_pallas_favor_attn=True,
    )
    assert "dp_step" not in called
    assert np.isfinite(res["history"][-1]["Loss"])


def test_cli_tp_paper_form_with_conditioning(tmp_path, latents_dir):
    """The PAPER block/embedding form (ReZero + learned 'absolute'
    spatial tables + bos_replacement conditioning) through the manual
    Megatron TP path — previously tp_step_compatible rejected all three
    features and the runner silently fell back to GSPMD.  Verify the
    manual step is actually selected AND matches single-device."""
    import jax
    import pandas as pd
    import pytest as _pytest

    from synthanatomy_tpu.parallel import tensor_parallel as TP

    cond_csv = str(tmp_path / "cond.csv")
    pd.DataFrame(
        {
            "subject": [f"s{i}_quantization_0.npy" for i in range(4)],
            "age": [60.0, 70.0, 60.0, 70.0],
        }
    ).to_csv(cond_csv, index=False)
    flags = dict(
        use_rezero=True,
        spatial_position_emb="absolute",
        conditioning_path=cond_csv,
        conditionings=("age",),
        conditioning_type="bos_replacement",
    )

    base = _run(
        str(tmp_path), latents_dir, "paper_single",
        mesh_shape=(1, 1),
        use_pallas_local_attn=False, use_pallas_favor_attn=False,
        **flags,
    )

    model_compat = TP.tp_step_compatible  # spy: manual path must engage
    seen = {}

    def spy(model, n):
        out = model_compat(model, n)
        seen["ok"], seen["why"] = out
        return out

    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(TP, "tp_step_compatible", spy)
        manual = _run(
            str(tmp_path), latents_dir, "paper_manual12",
            mesh_shape=(1, 2),
            use_pallas_local_attn=True, use_pallas_favor_attn=True,
            **flags,
        )
    assert seen.get("ok"), f"manual TP step rejected: {seen.get('why')}"
    np.testing.assert_allclose(
        manual["history"][-1]["Loss"], base["history"][-1]["Loss"], rtol=1e-5
    )
    _assert_params_close(base["state"].params, manual["state"].params)


def test_cli_inference_dp_sampler_with_conditioning(tmp_path, latents_dir):
    """Conditioned DP serving through the REAL inference runner: with
    eval_batch_size divisible by the device count, a conditioned prior
    must take the multi-chip DP sampler (previously it silently fell
    back to single-device serving) and write one sample per subject."""
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from synthanatomy_tpu.config import TransformerConfig
    from synthanatomy_tpu.runners.transformer import (
        build_ordering,
        build_performer,
    )
    from synthanatomy_tpu.train import checkpoints as C
    from synthanatomy_tpu.train.transformer_steps import (
        create_transformer_train_state,
    )

    cond_csv = str(tmp_path / "cond.csv")
    pd.DataFrame(
        {
            "subject": [f"s{i}_quantization_0.npy" for i in range(4)],
            "age": [60.0, 70.0, 60.0, 70.0],
        }
    ).to_csv(cond_csv, index=False)

    net = dict(
        vocab_size=16, n_embd=32, n_layers=2, n_head=4, dim_head=8,
        nb_features=8, local_attn_heads=2, local_window_size=8,
        ordering_type="raster_scan", compute_dtype="float32",
        conditioning_path=cond_csv, conditionings=("age",),
        conditioning_type="bos_replacement",
    )
    t_cfg = TransformerConfig(
        mode="inference", training_subjects=latents_dir,
        project_directory=str(tmp_path), experiment_name="dpserve",
        conditioning_num_tokens=(2,),
        **{k: v for k, v in net.items()
           if k in TransformerConfig.__dataclass_fields__
           and k not in ("conditioning_path", "conditionings",
                         "conditioning_type")},
        **{k: net[k] for k in ("conditioning_path", "conditionings",
                               "conditioning_type")},
    )
    ordering = build_ordering(t_cfg, (4, 4, 4))
    performer = build_performer(t_cfg, ordering, (4, 4, 4))
    state, _ = create_transformer_train_state(
        performer, jax.random.key(0), 64,
        conditionings=[jnp.zeros((1,), jnp.int32)],
    )
    ckdir = os.path.join(str(tmp_path), "dpserve", "performer", "checkpoints")
    os.makedirs(ckdir)
    C.save_checkpoint(ckdir, state, 1)

    spy = {}
    from synthanatomy_tpu.models import sampling as S

    orig = S.make_dp_sampler

    def wrapped(*a, **k):
        spy["dp"] = True
        return orig(*a, **k)

    import pytest as _pytest

    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(S, "make_dp_sampler", wrapped)
        res = _run(
            str(tmp_path), latents_dir, "dpserve",
            mode="inference",
            eval_batch_size=8,  # divisible by the 8-device CPU mesh
            **net,
        )
    assert spy.get("dp"), "conditioned prior did not take the DP sampler"
    assert len(res["written"]) == 4
    samp = np.load(res["written"][0])
    assert samp.dtype == np.uint16 and samp.shape == (4, 4, 4)
    assert samp.max() < 16

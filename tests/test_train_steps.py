import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthanatomy_tpu.models.discriminator import BaselineDiscriminator
from synthanatomy_tpu.models.performer import Performer
from synthanatomy_tpu.models.vqvae import BaselineVQVAE
from synthanatomy_tpu.train import schedulers
from synthanatomy_tpu.train.transformer_steps import (
    create_transformer_train_state,
    make_transformer_eval_step,
    make_transformer_train_step,
)
from synthanatomy_tpu.train.vqvae_steps import (
    create_vqvae_train_state,
    make_vqvae_eval_step,
    make_vqvae_train_step,
)


def _small_vqvae():
    return BaselineVQVAE(
        n_levels=2,
        downsample_parameters=((4, 2, 1, 1), (4, 2, 1, 1)),
        upsample_parameters=((4, 2, 1, 0, 1), (4, 2, 1, 0, 1)),
        n_embed=16, embed_dim=8, n_channels=8, n_res_channels=8,
        n_res_layers=1, dtype=jnp.float32, use_pallas_vq=False,
    )


SCHED = {
    "lr": 3e-4, "d_lr": 5e-4, "decay": 0.5, "commitment_cost": 0.25,
    "gdl_factor": 0.0, "epoch": 0,
}


def test_vqvae_train_step_mse_decreases_loss():
    model = _small_vqvae()
    state, g_tx, _ = create_vqvae_train_state(
        model, jax.random.key(0), (16, 16, 16), learning_rate=1e-3
    )
    step = jax.jit(make_vqvae_train_step(model, g_tx, loss_name="mse"))
    x = jax.random.uniform(jax.random.key(1), (2, 16, 16, 16, 1))

    losses = []
    for _ in range(12):
        state, metrics = step(state, x, SCHED)
        losses.append(float(metrics["Loss-MSE-Reconstruction"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 12
    assert np.isfinite(losses).all()
    assert "VQ0-Perplexity" in metrics


def test_vqvae_train_step_adversarial():
    model = _small_vqvae()
    d_model = BaselineDiscriminator(ndf=4, n_layers=2, dtype=jnp.float32)
    state, g_tx, d_tx = create_vqvae_train_state(
        model, jax.random.key(0), (16, 16, 16), d_model=d_model
    )
    step = jax.jit(
        make_vqvae_train_step(
            model, g_tx, loss_name="mse", d_model=d_model, d_tx=d_tx,
            generator_criterion="least_square",
            discriminator_criterion="least_square",
        )
    )
    x = jax.random.uniform(jax.random.key(1), (2, 16, 16, 16, 1))
    d0 = state.d_params
    state, metrics = step(state, x, SCHED)
    assert "Loss-Discriminator-Total" in metrics
    assert "Loss-Adversarial_Generator-Reconstruction" in metrics
    assert np.isfinite(float(metrics["Loss-Generator-Total"]))
    # both networks actually updated
    changed = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)), d0, state.d_params
    )
    assert any(jax.tree.leaves(changed))


def test_split_batchnorm_groups1_matches_flax_batchnorm():
    """SplitBatchNorm with groups=1 must reproduce nn.BatchNorm (train
    normalization + running-stat update and eval path)."""
    import flax.linen as nn

    from synthanatomy_tpu.models.discriminator import SplitBatchNorm

    x = jax.random.normal(jax.random.key(0), (4, 5, 5, 5, 6), jnp.float32)
    ref = nn.BatchNorm(
        use_running_average=False, momentum=0.9, epsilon=1e-5,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    got = SplitBatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
    vr = ref.init(jax.random.key(1), x)
    vg = got.init(jax.random.key(1), x, training=True)
    # share identical params/stats
    vg = {"params": vr["params"], "batch_stats": vr["batch_stats"]}
    yr, mr = ref.apply(vr, x, mutable=["batch_stats"])
    yg, mg = got.apply(vg, x, training=True, groups=1, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yg), np.asarray(yr), atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mg["batch_stats"][k]),
            np.asarray(mr["batch_stats"][k]), atol=1e-6,
        )
    # eval path
    ref_eval = nn.BatchNorm(
        use_running_average=True, momentum=0.9, epsilon=1e-5,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    ye = ref_eval.apply(
        {"params": vr["params"], "batch_stats": mr["batch_stats"]}, x
    )
    yge = got.apply(
        {"params": vr["params"], "batch_stats": mg["batch_stats"]},
        x, training=False,
    )
    np.testing.assert_allclose(np.asarray(yge), np.asarray(ye), atol=1e-5)


def test_discriminator_grouped_stats_matches_two_pass():
    """One concatenated fake+real pass with stat_groups=2 must equal the
    two sequential train-mode forwards exactly (logits and the final
    running statistics) — the reference's per-forward BatchNorm
    semantics (trainer.py:219-256) preserved in one conv pass."""
    d = BaselineDiscriminator(
        ndf=4, n_layers=2, dtype=jnp.float32, use_split_bn=True
    )
    x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 16, 1))
    fake = jax.random.uniform(jax.random.key(1), (2, 16, 16, 16, 1))
    variables = d.init(jax.random.key(2), x, training=True)

    lf, m1 = d.apply(variables, fake, training=True, mutable=["batch_stats"])
    lr_, m2 = d.apply(
        {"params": variables["params"], "batch_stats": m1["batch_stats"]},
        x, training=True, mutable=["batch_stats"],
    )
    both, mg = d.apply(
        variables, jnp.concatenate([fake, x], 0), training=True,
        stat_groups=2, mutable=["batch_stats"],
    )
    gf, gr = jnp.split(both, 2, axis=0)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(lf), atol=2e-6)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(lr_), atol=2e-6)
    ref_leaves = jax.tree.leaves(m2["batch_stats"])
    got_leaves = jax.tree.leaves(mg["batch_stats"])
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_vqvae_train_step_grouped_bn_matches_two_pass():
    """The full adversarial step with d_grouped_stats=True must produce
    the same D update as the two-pass step (both built on
    SplitBatchNorm so the only difference is the batching)."""
    model = _small_vqvae()
    d_model = BaselineDiscriminator(
        ndf=4, n_layers=2, dtype=jnp.float32, use_split_bn=True
    )
    x = jax.random.uniform(jax.random.key(1), (2, 16, 16, 16, 1))

    def run(grouped):
        state, g_tx, d_tx = create_vqvae_train_state(
            model, jax.random.key(0), (16, 16, 16), d_model=d_model
        )
        step = jax.jit(
            make_vqvae_train_step(
                model, g_tx, loss_name="mse", d_model=d_model, d_tx=d_tx,
                d_grouped_stats=grouped,
            )
        )
        for _ in range(3):
            state, metrics = step(state, x, SCHED)
        return state, metrics

    s_ref, m_ref = run(False)
    s_got, m_got = run(True)
    np.testing.assert_allclose(
        float(m_got["Loss-Discriminator-Total"]),
        float(m_ref["Loss-Discriminator-Total"]), rtol=1e-5,
    )
    for a, b in zip(
        jax.tree.leaves(s_ref.d_params), jax.tree.leaves(s_got.d_params)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
    for a, b in zip(
        jax.tree.leaves(s_ref.d_batch_stats),
        jax.tree.leaves(s_got.d_batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_vqvae_adaptive_weight_path():
    model = _small_vqvae()
    d_model = BaselineDiscriminator(ndf=4, n_layers=2, dtype=jnp.float32)
    state, g_tx, d_tx = create_vqvae_train_state(
        model, jax.random.key(0), (16, 16, 16), d_model=d_model
    )
    step = jax.jit(
        make_vqvae_train_step(
            model, g_tx, loss_name="mse", d_model=d_model, d_tx=d_tx,
            use_adaptive_weight=True, adaptive_threshold=2, adaptive_value=7.0,
        )
    )
    x = jax.random.uniform(jax.random.key(1), (1, 16, 16, 16, 1))
    # below threshold: fixed value
    _, m0 = step(state, x, {**SCHED, "epoch": 0})
    assert float(m0["Adversarial-Weight"]) == 7.0
    # above threshold: grad-norm ratio (finite, positive)
    _, m1 = step(state, x, {**SCHED, "epoch": 5})
    w = float(m1["Adversarial-Weight"])
    assert np.isfinite(w) and w >= 0.0 and w != 7.0


def test_vqvae_adaptive_weight_matches_full_backward():
    """The head-only adaptive-weight formulation (round 4: cheap vjp
    over [last deconv → losses] with the sown last-layer input held
    constant) must reproduce the reference definition exactly: the
    norm ratio of the FULL backward's last-layer kernel grads
    (trainer.py:278-287)."""
    from synthanatomy_tpu.losses import vqvae as vqvae_losses
    from synthanatomy_tpu.losses.adversarial import generator_loss

    model = _small_vqvae()
    d_model = BaselineDiscriminator(ndf=4, n_layers=2, dtype=jnp.float32)
    state, g_tx, d_tx = create_vqvae_train_state(
        model, jax.random.key(0), (16, 16, 16), d_model=d_model
    )
    step = jax.jit(
        make_vqvae_train_step(
            model, g_tx, loss_name="mse", d_model=d_model, d_tx=d_tx,
            use_adaptive_weight=True,
        )
    )
    x = jax.random.uniform(jax.random.key(1), (2, 16, 16, 16, 1))
    _, metrics = step(state, x, {**SCHED, "epoch": 5})
    w_head = float(metrics["Adversarial-Weight"])

    # independent reference computation: two full backwards, norms of
    # the last-layer kernel grads (the pre-round-4 step formulation)
    loss_fn = vqvae_losses.get_vqvae_loss("mse")
    last = model.last_layer_name()
    _, drop_rng, _ = jax.random.split(state.rng, 3)
    d_vars = {"params": state.d_params, "batch_stats": state.d_batch_stats}

    def forward(g_params):
        out, _ = model.apply(
            {"params": g_params, "vq": state.vq}, x,
            decay=SCHED["decay"], commitment_cost=SCHED["commitment_cost"],
            training=True, mutable=["vq", "diagnostics"],
            rngs={"dropout": drop_rng},
        )
        r_l, _ = loss_fn(out, x)
        lf = d_model.apply(
            d_vars, out["reconstruction"][0].astype(jnp.float32),
            training=False,
        )
        g_l, _ = generator_loss(lf, criterion="least_square", weight=0.005)
        return r_l, g_l

    _, vjp_fn = jax.vjp(forward, state.g_params)
    g_recon = vjp_fn((jnp.ones(()), jnp.zeros(())))[0]
    g_gen = vjp_fn((jnp.zeros(()), jnp.ones(())))[0]
    n_r = jnp.linalg.norm(g_recon[last]["kernel"].reshape(-1))
    n_g = jnp.linalg.norm(g_gen[last]["kernel"].reshape(-1))
    w_full = float(jnp.clip(n_r / (n_g + 1e-4), 0.0, 1e4))
    np.testing.assert_allclose(w_head, w_full, rtol=1e-5)


def test_vqvae_finetune_gate_freezes_generator():
    model = _small_vqvae()
    d_model = BaselineDiscriminator(ndf=4, n_layers=2, dtype=jnp.float32)
    state, g_tx, d_tx = create_vqvae_train_state(
        model, jax.random.key(0), (16, 16, 16), d_model=d_model
    )
    step = jax.jit(
        make_vqvae_train_step(
            model, g_tx, loss_name="mse", d_model=d_model, d_tx=d_tx,
            train_generator=False,
        )
    )
    x = jax.random.uniform(jax.random.key(1), (1, 16, 16, 16, 1))
    g0 = state.g_params
    state, _ = step(state, x, SCHED)
    same = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), g0, state.g_params
    )
    assert all(jax.tree.leaves(same))


def test_vqvae_eval_step():
    model = _small_vqvae()
    state, _, _ = create_vqvae_train_state(model, jax.random.key(0), (16, 16, 16))
    eval_step = jax.jit(make_vqvae_eval_step(model, loss_name="mse"))
    x = jax.random.uniform(jax.random.key(1), (2, 16, 16, 16, 1))
    recon, metrics = eval_step(state, x, SCHED)
    assert recon.shape == x.shape
    assert np.isfinite(float(metrics["Loss"]))


def test_transformer_train_step_learns():
    model = Performer(
        num_tokens=9, max_seq_len=16, dim=16, depth=1, heads=2, dim_head=8,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    state, tx = create_transformer_train_state(
        model, jax.random.key(0), 16, learning_rate=1e-2
    )
    step = jax.jit(make_transformer_train_step(model, tx))
    # learnable pattern: constant token sequence
    inputs = jnp.full((4, 16), 8, jnp.int32).at[:, 1:].set(3)
    targets = jnp.full((4, 16), 3, jnp.int32)
    losses = []
    for _ in range(25):
        state, metrics = step(state, inputs, targets, None, {"lr": 1e-2})
        losses.append(float(metrics["Loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]

    eval_step = jax.jit(make_transformer_eval_step(model))
    logits, em = eval_step(state, inputs, targets, None)
    assert logits.shape == (4, 16, 9)
    # model learned to predict token 3
    assert (np.asarray(logits[:, 5:]).argmax(-1) == 3).mean() > 0.9


def test_scheduler_calculators_match_reference_semantics():
    # linear: constant below step_constant, capped at max above
    assert schedulers.linear(0.0, 25, 50, 5.0, 10) == 0.0
    assert schedulers.linear(0.0, 25, 50, 5.0, 100) == 5.0
    mid = schedulers.linear(0.0, 25, 50, 5.0, 40)
    assert 0 < mid < 5.0
    # exponential / step / multistep
    assert schedulers.exponential(1.0, 0.9, 2) == pytest.approx(0.81)
    assert schedulers.step(1.0, 0.5, 10, 25) == pytest.approx(0.25)
    assert schedulers.multistep(1.0, 0.1, [3, 7], 5) == pytest.approx(0.1)
    # auto gamma reaches 1e-5 at the end of training
    g = schedulers.get_gamma(3e-4, epochs=100, epoch_length=10)
    assert 3e-4 * g ** (100 * 10) == pytest.approx(1e-5, rel=1e-6)
    # decay warmups end at 0.99
    assert schedulers.decay_warmup_step(0.5, 50, 49) == pytest.approx(0.99)
    assert schedulers.decay_warmup_linear(0.5, 50, 50) == pytest.approx(0.99)
    with pytest.raises(ValueError):
        schedulers.get_calculator("cosine")


def test_runner_scheduled_values():
    """The runner's per-epoch scheduled-scalar assembly (auto gamma,
    decay warmup, Baur GDL ramp)."""
    from synthanatomy_tpu.config import VQVAEConfig
    from synthanatomy_tpu.runners.vqvae import _scheduled

    cfg = VQVAEConfig(
        adversarial_component=False, loss="baur", gamma="auto", epochs=10,
        learning_rate=3e-4, decay=(0.5,), decay_warmup="linear",
        max_decay_epochs=10, initial_factor_value=0,
        initial_factor_steps=2, max_factor_steps=5, max_factor_value=5,
    )
    s0 = _scheduled(cfg, 0, epoch_length=7)
    s9 = _scheduled(cfg, 9, epoch_length=7)
    assert s0["lr"] == pytest.approx(3e-4)
    assert s9["lr"] < s0["lr"]
    assert s0["decay"] == pytest.approx(0.5)
    assert s9["decay"] > s0["decay"] and s9["decay"] <= 0.99
    assert s0["gdl_factor"] == 0.0
    assert s9["gdl_factor"] == pytest.approx(5.0)
    assert s0["commitment_cost"] == 0.25

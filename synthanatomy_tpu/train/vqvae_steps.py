"""Stage-1 (VQ-VAE) jitted train/eval steps.

The functional replacement for the reference's Ignite
``AdversarialTrainer._iteration`` (src/engines/trainer.py:122-294):
one compiled function performs G forward → D(fake) → composite
reconstruction loss + weighted generator loss → G update, then
D(fake.detach()) + D(real) → weighted D loss → D update.  Differences
by design:

- G and D updates live in ONE jitted step (two optax updates) instead
  of two backward passes with separate CUDA GradScalers — bf16 on TPU
  needs no loss scaling (trainer.py:113-114);
- the adaptive adversarial weight ‖∇_last recon‖/‖∇_last gen‖
  (trainer.py:269-294) is computed from two cotangent pulls of a
  single ``jax.vjp`` forward, and the combined gradient is formed
  linearly (∇(recon + w·gen) = ∇recon + w·∇gen) — one forward, two
  backwards, exact;
- the EMA codebook update rides the same step through the mutable
  "vq" collection; under pjit its batch statistics reduce globally,
  preserving the reference's allreduce-before-update invariant;
- scheduled scalars (lr, EMA decay, commitment cost, loss factors,
  adversarial weight gate) enter as *arguments*, so the reference's
  ParamSchedulerHandler mutations never trigger recompilation.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from synthanatomy_tpu.losses import vqvae as vqvae_losses
from synthanatomy_tpu.losses.adversarial import discriminator_loss, generator_loss

__all__ = [
    "VQVAETrainState",
    "create_vqvae_train_state",
    "make_vqvae_train_step",
    "make_vqvae_eval_step",
]


class VQVAETrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    g_opt_state: Any
    vq: Any  # {"level_0": VQState}
    rng: jax.Array
    d_params: Any = None
    d_batch_stats: Any = None
    d_opt_state: Any = None


def _adam(lr: float) -> optax.GradientTransformation:
    # torch.optim.Adam defaults (betas 0.9/0.999, eps 1e-8) — reference
    # run_vqvae.py optimizer construction
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def create_vqvae_train_state(
    model,
    rng: jax.Array,
    input_shape: Tuple[int, ...],
    *,
    learning_rate: float = 3e-4,
    d_model=None,
    d_learning_rate: float = 5e-4,
) -> Tuple[VQVAETrainState, Any, Any]:
    """Initialize model+optimizer state.  Returns (state, g_tx, d_tx)."""
    init_rng, d_rng, state_rng = jax.random.split(rng, 3)
    # init on host CPU: eager per-op dispatch on the device (tunnel) is
    # orders of magnitude slower, and params are placement-independent.
    # Conv params don't depend on spatial size, so init small.
    cpu = jax.local_devices(backend="cpu")[0]
    small_shape = tuple(min(int(s), 32) for s in input_shape)
    with jax.default_device(cpu):
        x = jnp.zeros((1,) + small_shape + (1,), jnp.float32)
        variables = model.init({"params": init_rng, "dropout": init_rng}, x)
        g_params = variables["params"]
        vq = variables["vq"]
        g_tx = _adam(learning_rate)
        g_opt_state = g_tx.init(g_params)

        d_params = d_batch_stats = d_opt_state = None
        d_tx = None
        if d_model is not None:
            d_vars = d_model.init(d_rng, x, training=True)
            d_params = d_vars["params"]
            d_batch_stats = d_vars.get("batch_stats")
            d_tx = _adam(d_learning_rate)
            d_opt_state = d_tx.init(d_params)

    state = VQVAETrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_opt_state=g_opt_state,
        vq=vq,
        rng=state_rng,
        d_params=d_params,
        d_batch_stats=d_batch_stats,
        d_opt_state=d_opt_state,
    )
    return state, g_tx, d_tx


def _set_lr(opt_state, lr):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def _loss_kwargs(loss_name: str, sched: Dict[str, jax.Array], lpips_params, rng):
    kw: Dict[str, Any] = {}
    if loss_name == "baur":
        kw["gdl_factor"] = sched.get("gdl_factor", 0.0)
    if vqvae_losses.loss_needs_lpips(loss_name):
        kw["lpips_params"] = lpips_params
        kw["rng"] = rng
    return kw


def make_vqvae_train_step(
    model,
    g_tx: optax.GradientTransformation,
    *,
    loss_name: str = "mse",
    d_model=None,
    d_tx: Optional[optax.GradientTransformation] = None,
    generator_criterion: str = "least_square",
    discriminator_criterion: str = "least_square",
    adversarial_weight: float = 0.005,
    use_adaptive_weight: bool = False,
    adaptive_threshold: int = 0,
    adaptive_value: float = 1.0,
    train_generator: bool = True,
    d_grouped_stats: bool = False,
) -> Callable:
    """Build the jitted train step.

    Returns ``step(state, batch, sched, lpips_params) -> (state,
    metrics)`` where ``batch`` is (B, D, H, W, 1) in [0,1], ``sched``
    holds {'lr','d_lr','decay','commitment_cost','gdl_factor',
    'epoch'} scalars.  ``train_generator=False`` freezes G (the
    AdversarialFinetuneHandler gate, src/handlers/vqvae.py:122-174) —
    it is a static flag, so the gate change recompiles once.
    """
    loss_fn = vqvae_losses.get_vqvae_loss(loss_name)
    adversarial = d_model is not None
    last_layer = model.last_layer_name()

    def step(state: VQVAETrainState, batch, sched, lpips_params=None):
        rng, drop_rng, loss_rng = jax.random.split(state.rng, 3)
        x = batch
        metrics: Dict[str, jax.Array] = {}

        d_vars = (
            {"params": state.d_params, "batch_stats": state.d_batch_stats}
            if adversarial
            else None
        )

        def forward(g_params):
            out, muts = model.apply(
                {"params": g_params, "vq": state.vq},
                x,
                decay=sched["decay"],
                commitment_cost=sched["commitment_cost"],
                training=True,
                mutable=["vq", "diagnostics"],
                rngs={"dropout": drop_rng},
            )
            recon_loss, summaries = loss_fn(
                out, x, **_loss_kwargs(loss_name, sched, lpips_params, loss_rng)
            )
            if adversarial:
                logits_fake = d_model.apply(
                    d_vars, out["reconstruction"][0].astype(jnp.float32),
                    training=False,
                )
                gen_loss, gsum = generator_loss(
                    logits_fake, criterion=generator_criterion,
                    weight=adversarial_weight,
                )
                summaries = {**summaries, **gsum}
            else:
                gen_loss = jnp.zeros(())
            aux = (muts, summaries, out["reconstruction"][0])
            return (recon_loss, gen_loss), aux

        (losses, vjp_fn, aux) = jax.vjp(forward, state.g_params, has_aux=True)
        recon_loss, gen_loss = losses
        muts, summaries, recon = aux

        if adversarial and use_adaptive_weight:
            # the reference computes the two norm-grads w.r.t. the LAST
            # LAYER only (trainer.py:278-287) and then runs ONE combined
            # backward.  ∂loss/∂K_last never flows through the rest of
            # the network (K_last appears only in the final deconv), so
            # a head-only vjp over [last conv → losses] with the sown
            # last-layer input held constant is exact — and saves a full
            # second backward pass through the conv stacks that a
            # two-cotangent-pull formulation costs.
            h_last = muts["diagnostics"]["last_layer_input"]

            def head_losses(last_entry):
                recon_h = model.apply(
                    {"params": {last_layer: last_entry}, "vq": state.vq},
                    h_last,
                    method=lambda m, hh: m.decoder_ups[-1](hh),
                )
                out_h = {
                    "reconstruction": [recon_h],
                    # constants w.r.t. the last kernel — values don't
                    # matter for the head grads
                    "quantization_losses": [jnp.zeros(())],
                }
                r_l, _ = loss_fn(
                    out_h, x,
                    **_loss_kwargs(loss_name, sched, lpips_params, loss_rng),
                )
                lf = d_model.apply(
                    d_vars, recon_h.astype(jnp.float32), training=False
                )
                g_l, _ = generator_loss(
                    lf, criterion=generator_criterion,
                    weight=adversarial_weight,
                )
                return r_l, g_l

            _, head_vjp = jax.vjp(head_losses, state.g_params[last_layer])
            g_r_last = head_vjp((jnp.ones(()), jnp.zeros(())))[0]
            g_g_last = head_vjp((jnp.zeros(()), jnp.ones(())))[0]
            n_r = jnp.linalg.norm(g_r_last["kernel"].reshape(-1))
            n_g = jnp.linalg.norm(g_g_last["kernel"].reshape(-1))
            w = jnp.clip(n_r / (n_g + 1e-4), 0.0, 1e4)
            w = jnp.where(sched["epoch"] < adaptive_threshold, adaptive_value, w)
            w = jax.lax.stop_gradient(w)
            # ∇(recon + w·gen) in one pull — vjp is linear in the
            # cotangent, so this equals g_recon + w·g_gen exactly
            grads = vjp_fn((jnp.ones(()), w))[0]
        else:
            w = jnp.ones(())
            grads = vjp_fn((jnp.ones(()), jnp.ones(()) if adversarial else jnp.zeros(())))[0]

        if train_generator:
            g_opt_state = _set_lr(state.g_opt_state, sched["lr"])
            updates, g_opt_state = g_tx.update(grads, g_opt_state, state.g_params)
            g_params = optax.apply_updates(state.g_params, updates)
            new_vq = muts["vq"]
        else:
            g_opt_state = state.g_opt_state
            g_params = state.g_params
            new_vq = state.vq

        metrics["Loss-Reconstruction-Total"] = recon_loss
        metrics.update(summaries)
        if "diagnostics" in muts and "perplexity" in muts["diagnostics"]:
            metrics["VQ0-Perplexity"] = muts["diagnostics"]["perplexity"]
        metrics["Adversarial-Weight"] = w

        # ---- discriminator update (trainer.py:219-256)
        d_params, d_batch_stats, d_opt_state = (
            state.d_params, state.d_batch_stats, state.d_opt_state,
        )
        if adversarial:
            fake = jax.lax.stop_gradient(recon.astype(jnp.float32))

            def d_loss_fn(d_params):
                dv = {"params": d_params, "batch_stats": state.d_batch_stats}
                if d_grouped_stats:
                    # one conv pass over [fake; real] with per-half BN
                    # statistics (SplitBatchNorm) — exact two-pass
                    # semantics, half the D-update conv dispatches
                    both = jnp.concatenate([fake, x.astype(jnp.float32)], 0)
                    logits, m2 = d_model.apply(
                        dv, both, training=True, stat_groups=2,
                        mutable=["batch_stats"],
                    )
                    logits_fake, logits_real = jnp.split(logits, 2, axis=0)
                else:
                    logits_fake, m1 = d_model.apply(
                        dv, fake, training=True, mutable=["batch_stats"]
                    )
                    logits_real, m2 = d_model.apply(
                        {"params": d_params, "batch_stats": m1["batch_stats"]},
                        x.astype(jnp.float32), training=True,
                        mutable=["batch_stats"],
                    )
                dl, dsum = discriminator_loss(
                    logits_fake, logits_real,
                    criterion=discriminator_criterion, weight=adversarial_weight,
                )
                return dl * w, (m2["batch_stats"], dsum)

            (d_loss, (d_batch_stats, dsum)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state.d_params)
            d_opt_state = _set_lr(state.d_opt_state, sched["d_lr"])
            d_updates, d_opt_state = d_tx.update(d_grads, d_opt_state, state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)
            metrics.update(dsum)
            metrics["Loss-Discriminator-Total"] = d_loss
            metrics["Loss-Generator-Total"] = recon_loss + gen_loss * w

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            g_opt_state=g_opt_state,
            vq=new_vq,
            rng=rng,
            d_params=d_params,
            d_batch_stats=d_batch_stats,
            d_opt_state=d_opt_state,
        )
        return new_state, metrics

    return step


def make_vqvae_eval_step(model, *, loss_name: str = "mse") -> Callable:
    """Eval: forward in eval mode, reconstruction + loss summaries (no
    state mutation) — the SupervisedEvaluator path."""
    loss_fn = vqvae_losses.get_vqvae_loss(loss_name)

    def step(state: VQVAETrainState, batch, sched, lpips_params=None):
        out, _ = model.apply(
            {"params": state.g_params, "vq": state.vq},
            batch,
            decay=sched["decay"],
            commitment_cost=sched["commitment_cost"],
            training=False,
            mutable=["diagnostics"],
        )
        loss, summaries = loss_fn(
            out, batch, **_loss_kwargs(loss_name, sched, lpips_params, None)
        )
        return out["reconstruction"][0], {"Loss": loss, **summaries}

    return step

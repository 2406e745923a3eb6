"""Stage-2 (Performer prior) jitted train/eval steps.

Functional replacement for the reference transformer training loop
(run_transformer.py:107-118 wiring + TransformerTrainingInferer,
src/inferer/transformer.py:10-29): CE over next-token logits, Adam,
exponential LR decay fed as a call-time scalar.  The FAVOR+ projection
redraw (feature_redraw_interval) is a host-side call to
``models.performer.redraw_projections`` between steps.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from synthanatomy_tpu.losses.transformer import ce_loss

__all__ = [
    "TransformerTrainState",
    "create_transformer_train_state",
    "make_transformer_train_step",
    "make_transformer_train_step_dp",
    "make_transformer_eval_step",
]


class TransformerTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    favor: Any
    opt_state: Any
    rng: jax.Array


def create_transformer_train_state(
    model,
    rng: jax.Array,
    seq_len: int,
    *,
    learning_rate: float = 1e-4,
    conditionings: Optional[Sequence[jax.Array]] = None,
    abstract: bool = False,
) -> Tuple[TransformerTrainState, optax.GradientTransformation]:
    """``abstract=True`` returns a ShapeDtypeStruct skeleton (via
    ``jax.eval_shape`` — no compute) to use as a checkpoint-restore
    target: the real init runs 24 layers of QR factorizations for the
    FAVOR projections, minutes on one host core, all discarded when a
    checkpoint overwrites them."""
    init_rng, favor_rng, state_rng = jax.random.split(rng, 3)
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)

    def _build():
        x = jnp.zeros((1, min(seq_len, 16)), jnp.int32)
        variables = model.init(
            {"params": init_rng, "favor": favor_rng, "dropout": init_rng},
            x,
            conditionings,
        )
        return TransformerTrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            favor=variables.get("favor", {}),
            opt_state=tx.init(variables["params"]),
            rng=state_rng,
        )

    if abstract:
        return jax.eval_shape(_build), tx
    # init on host CPU (eager device dispatch through the TPU tunnel is
    # minutes-slow for deep models)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = _build()
    return state, tx


def make_transformer_train_step(model, tx: optax.GradientTransformation) -> Callable:
    """step(state, inputs, targets, conditionings, sched) →
    (state, metrics).  inputs/targets: (B, L) int (the BOS-shifted
    pair from prepare_batch, src/utils/transformer.py:239-282)."""

    def step(state, inputs, targets, conditionings, sched):
        rng, drop_rng = jax.random.split(state.rng)

        def loss_fn(params):
            logits = model.apply(
                {"params": params, "favor": state.favor},
                inputs,
                conditionings,
                deterministic=False,
                rngs={"dropout": drop_rng},
            )
            loss, summaries = ce_loss(logits, targets)
            return loss, summaries

        (loss, summaries), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            sched["lr"], jnp.float32
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, {**summaries, "Loss": loss}

    return step


def make_transformer_train_step_dp(
    model, tx: optax.GradientTransformation, mesh, *, axis: str = "data"
) -> Callable:
    """Data-parallel train step under ``shard_map`` (explicit
    ``pmean`` of grads/metrics) instead of GSPMD.

    Functionally identical to jitting :func:`make_transformer_train_step`
    over a data mesh (tested equal), but because every device runs its
    own complete program, the Pallas attention kernels stay usable —
    GSPMD cannot partition the opaque custom calls, ``shard_map`` never
    needs to.  Params/opt-state replicated in and out; batch sharded on
    ``axis``; per-device dropout RNG is mesh-position-folded.
    """
    from jax.sharding import PartitionSpec as P

    def step(state, inputs, targets, conditionings, sched):
        rng, drop_rng = jax.random.split(state.rng)
        drop_rng = jax.random.fold_in(drop_rng, jax.lax.axis_index(axis))

        def loss_fn(params):
            logits = model.apply(
                {"params": params, "favor": state.favor},
                inputs,
                conditionings,
                deterministic=False,
                rngs={"dropout": drop_rng},
            )
            loss, summaries = ce_loss(logits, targets)
            return loss, summaries

        (loss, summaries), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        summaries = jax.lax.pmean(summaries, axis)
        state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            sched["lr"], jnp.float32
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, {**summaries, "Loss": loss}

    data = P(axis)
    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), data, data, data, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )


def make_transformer_eval_step(model) -> Callable:
    from synthanatomy_tpu.inferers import TransformerTrainingInferer

    inferer = TransformerTrainingInferer(model)

    def step(state, inputs, targets, conditionings):
        logits = inferer(
            {"params": state.params, "favor": state.favor}, inputs, conditionings
        )
        loss, summaries = ce_loss(logits, targets)
        return logits, {**summaries, "Loss": loss}

    return step

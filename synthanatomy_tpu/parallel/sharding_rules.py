"""Parameter partition specs (tensor parallelism).

The reference has no TP (SURVEY.md §2.10) — this is the TPU-native
scale-out the rebuild adds: Megatron-style sharding of the Performer's
attention heads and FF hidden dim over the ``model`` mesh axis.
Column-parallel into the heads/hidden (activations sharded on the
feature dim), row-parallel back out (GSPMD inserts the psum), token/
positional embeddings and LayerNorms replicated.  The VQ-VAE runs pure
DP — its conv channel counts are small enough that TP would be
ICI-bound.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "performer_param_spec",
    "param_shardings",
    "shard_params",
    "opt_state_shardings",
    "shard_transformer_state",
    "zero1_opt_state_shardings",
    "shard_opt_state_zero1",
]

# (path regex, spec) — first match wins.  Paths are '/'-joined key
# sequences into the flax params tree.
_PERFORMER_RULES = (
    # attention projections: column-parallel in, row-parallel out
    (re.compile(r".*(to_q|to_k|to_v)/kernel$"), P(None, "model")),
    (re.compile(r".*(to_q|to_k|to_v)/bias$"), P("model")),
    (re.compile(r".*to_out/kernel$"), P("model", None)),
    (re.compile(r".*to_out/bias$"), P()),
    # feed-forward
    (re.compile(r".*ff/w1/kernel$"), P(None, "model")),
    (re.compile(r".*ff/w1/bias$"), P("model")),
    (re.compile(r".*ff/w2/kernel$"), P("model", None)),
    (re.compile(r".*ff/w2/bias$"), P()),
    # output head: shard the vocab dim
    (re.compile(r".*to_out$"), P()),
    (re.compile(r"to_out/kernel$"), P(None, "model")),
)


def performer_param_spec(path: str, leaf) -> P:
    for rx, spec in _PERFORMER_RULES:
        if rx.match(path):
            # guard: axis must divide the dimension; fall back to
            # replication otherwise (e.g. tiny test models)
            return spec
    return P()


def param_shardings(mesh: Mesh, params: Any, spec_fn=performer_param_spec):
    """NamedSharding pytree for a params tree, validating divisibility."""
    model_size = mesh.shape.get("model", 1)

    def _one(path_tuple, leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in path_tuple)
        spec = spec_fn(path, leaf)
        # drop axes that do not divide evenly (small test configs)
        fixed = []
        for dim, ax in zip(leaf.shape, tuple(spec) + (None,) * (leaf.ndim - len(spec))):
            if ax == "model" and dim % max(model_size, 1) != 0:
                fixed.append(None)
            else:
                fixed.append(ax)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(_one, params)


def shard_params(mesh: Mesh, params: Any, spec_fn=performer_param_spec):
    return jax.device_put(params, param_shardings(mesh, params, spec_fn))


def opt_state_shardings(
    mesh: Mesh, tx, opt_state: Any, pshardings: Any
):
    """Sharding tree for an optax state: params-like leaves (Adam
    moments) follow the parameter shardings (Megatron sharded Adam —
    the update is elementwise, so GSPMD keeps it local); counts/
    hyperparams replicated."""
    import optax

    repl = NamedSharding(mesh, P())
    base = jax.tree.map(lambda _: repl, opt_state)
    return optax.tree_map_params(
        tx, lambda _, s: s, base, pshardings, transform_non_params=lambda x: x
    )


def shard_transformer_state(mesh: Mesh, tx, state, spec_fn=performer_param_spec):
    """Place a TransformerTrainState for GSPMD tensor-parallel training:
    params sharded per the Megatron rules, optimizer moments sharded
    like their params, favor projections / step / rng replicated.

    This is the wiring the CLI ``--mesh_shape='(d,m)'`` path uses — a
    plain replicated device_put here would silently waste the model
    axis (the params would be full-size on every device)."""
    pshard = param_shardings(mesh, state.params, spec_fn)
    repl = NamedSharding(mesh, P())
    return state.replace(
        params=jax.device_put(state.params, pshard),
        opt_state=jax.device_put(
            state.opt_state,
            opt_state_shardings(mesh, tx, state.opt_state, pshard),
        ),
        favor=jax.device_put(state.favor, repl),
        step=jax.device_put(state.step, repl),
        rng=jax.device_put(state.rng, repl),
    )


# ---------------------------------------------------------------------------
# ZeRO-1: shard optimizer state (Adam moments) over the data axis.
# The reference has nothing comparable (deepspeed is used only for
# init_distributed, SURVEY.md §2.10); under GSPMD this is purely a
# placement annotation — the all-gathers for the update are inserted
# automatically and ride ICI.
# ---------------------------------------------------------------------------


def zero1_opt_state_shardings(mesh: Mesh, opt_state: Any, axis: str = "data"):
    """NamedSharding tree sharding the leading dim of every ≥1-D
    optimizer-state leaf over ``axis`` when divisible (moments, etc.);
    scalars/counts stay replicated."""
    size = mesh.shape.get(axis, 1)

    def _one(leaf):
        if (
            hasattr(leaf, "ndim")
            and leaf.ndim >= 1
            and size > 1
            and leaf.shape[0] % size == 0
        ):
            return NamedSharding(
                mesh, P(axis, *([None] * (leaf.ndim - 1)))
            )
        return NamedSharding(mesh, P())

    return jax.tree.map(_one, opt_state)


def shard_opt_state_zero1(mesh: Mesh, opt_state: Any, axis: str = "data"):
    return jax.device_put(
        opt_state, zero1_opt_state_shardings(mesh, opt_state, axis)
    )

"""Pipeline parallelism (GPipe-style) for the Performer prior.

The reference trains its two stages as separate programs and never
shards one network across devices depth-wise (SURVEY.md §2.10 lists PP
as not-required-for-parity); this module adds it the TPU-native way for
models deeper than one chip's HBM: the depth-L block stack is cut into
P contiguous stages sharded over a ``pipe`` mesh axis, and microbatches
stream through a fill-drain schedule under ``shard_map`` with
``lax.ppermute`` moving activations stage→stage over ICI (the
scaling-book pipelining recipe — no NCCL send/recv, no schedule
threads; the whole pipeline is ONE jitted SPMD program and autodiff
differentiates straight through the collectives).

Design notes:

- Per-layer block params are homogeneous, so they stack into (L, ...)
  arrays; sharding axis 0 over ``pipe`` gives each device its stage's
  (L/P, ...) slab, which a ``lax.scan`` applies layer-by-layer (the
  standard stacked-layer form — one compiled block body, not L copies).
- Embedding/positional prefix and final-norm/head run replicated
  outside the pipeline (they are <2% of FLOPs).
- Schedule: M microbatches, M + P - 1 ticks; stage 0 feeds microbatch
  t while the last stage emits microbatch t-(P-1).  Bubble fraction =
  (P-1)/(M+P-1).  Outputs are psum-broadcast so every device finishes
  with the full logits (cheap: one (M, mb, L, D) collective).
- ``remat_stage`` wraps each stage application in ``jax.checkpoint`` so
  only per-microbatch stage boundaries are stored — the standard
  GPipe memory model.

Exactness: identical math to the sequential block stack — verified by
fp32 forward/grad parity tests on an 8-device CPU mesh
(tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "stack_block_params",
    "make_pipelined_apply",
    "pack_pp_tree",
    "unpack_pp_tree",
    "pack_pp_state",
    "unpack_pp_state",
    "pp_param_specs",
    "make_pp_train_step",
]


def stack_block_params(model, variables) -> Tuple[Any, Any]:
    """Stack the per-layer block params/favor collections into pytrees
    with a leading (L,) stage axis (shardable over the pipe axis)."""
    blocks = [variables["params"][f"block_{i}"] for i in range(model.depth)]
    favors = [variables["favor"][f"block_{i}"] for i in range(model.depth)]
    stacked_p = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    stacked_f = jax.tree.map(lambda *xs: jnp.stack(xs), *favors)
    return stacked_p, stacked_f


def _block_template(model):
    from synthanatomy_tpu.models.performer import PerformerBlock

    return PerformerBlock(
        model.dim, model.heads, model.dim_head, model.local_attn_heads,
        model.local_window_size, model.nb_features, model.causal,
        model.generalized_attention, model.ff_mult, model.ff_glu,
        model.ff_dropout, model.attn_dropout, model.use_scalenorm,
        model.use_rezero, model.qkv_bias, model.attn_out_bias,
        model.scan_chunk, model.no_projection,
        False,  # use_pallas_local: XLA path partitions cleanly
        False,  # use_pallas_favor
        False,  # remat handled at stage granularity here
        model.favor_cache_dtype, model.attn_compute_dtype, model.dtype,
    )


def _embed_method(m, x, conditionings=None):
    h = m._embed_prefix(x, conditionings)
    h = h + m._pos_emb(h.shape[1]).astype(h.dtype)
    return h


def _head_method(m, h, conditionings=None):
    h = m.final_norm(h)
    if conditionings is not None and m.conditioning_type == "prepending":
        h = h[:, len(m.conditioning_embs):]
    if m.tie_embed:
        return h @ m.token_emb.embedding.T.astype(h.dtype)
    return m.to_out(h)


def make_pipelined_apply(
    model,
    mesh: Mesh,
    *,
    axis: str = "pipe",
    n_microbatches: Optional[int] = None,
    remat_stage: bool = True,
    data_axis: Optional[str] = None,
) -> Callable:
    """Build ``apply(variables, stacked_p, stacked_f, x) -> logits``
    running the block stack pipeline-parallel over ``mesh[axis]``.

    ``variables`` supplies the replicated embedding/head params;
    ``stacked_p``/``stacked_f`` are :func:`stack_block_params` outputs
    (shard their leading axis over ``axis``).  The batch must divide
    into ``n_microbatches`` (default: the pipe size).  ``data_axis``
    additionally shards each microbatch over a second mesh axis
    (PP×DP — the pipeline schedule is unchanged; every data shard runs
    its own copy of it on its slice of the microbatch).
    """
    shard_map = jax.shard_map

    n_stages = mesh.shape[axis]
    if model.depth % n_stages != 0:
        raise ValueError(
            f"depth {model.depth} must divide into {n_stages} stages"
        )
    block = _block_template(model)

    def pp_blocks(stacked_p, stacked_f, h_mb):
        """Under shard_map: stacked_* local (L/P, ...); h_mb (M, mb, L, D)
        replicated.  Returns (M, mb, L, D) replicated."""
        m_count = h_mb.shape[0]
        idx = jax.lax.axis_index(axis)

        def apply_stage(h):
            def body(h, per_layer):
                p, f = per_layer
                return (
                    block.apply({"params": p, "favor": f}, h),
                    None,
                )
            h, _ = jax.lax.scan(body, h, (stacked_p, stacked_f))
            return h

        if remat_stage:
            apply_stage = jax.checkpoint(apply_stage)

        def tick(act, t):
            feed = jax.lax.dynamic_index_in_dim(
                h_mb, jnp.minimum(t, m_count - 1), axis=0, keepdims=False
            )
            inp = jnp.where(idx == 0, feed, act)
            out = apply_stage(inp)
            nxt = jax.lax.ppermute(
                out, axis, [(i, i + 1) for i in range(n_stages - 1)]
            )
            emit = jnp.where(idx == n_stages - 1, out, jnp.zeros_like(out))
            return nxt, emit

        act0 = jnp.zeros_like(h_mb[0])
        _, ys = jax.lax.scan(tick, act0, jnp.arange(m_count + n_stages - 1))
        outs = ys[n_stages - 1 :]  # microbatch m emerges at tick m+P-1
        # broadcast the last stage's outputs (others contributed zeros)
        return jax.lax.psum(outs, axis)

    spec_stage = P(axis)  # prefix spec: leading (L,) axis over the pipe
    spec_mb = P(None, data_axis)  # (M, mb, L, D): microbatch rows over DP
    pp_blocks_sharded = shard_map(
        pp_blocks,
        mesh=mesh,
        in_specs=(spec_stage, spec_stage, spec_mb),
        out_specs=spec_mb,
        # per-device control flow (stage gating, zero-padded emits)
        # is intentionally unreplicated mid-pipeline
        check_vma=False,
    )

    def apply(variables, stacked_p, stacked_f, x, conditionings=None):
        h = model.apply(
            variables, x, conditionings, method=_embed_method
        )
        b, n, d = h.shape
        m_count = n_microbatches or n_stages
        if b % m_count != 0:
            raise ValueError(
                f"batch {b} must divide into {m_count} microbatches"
            )
        mb = b // m_count
        h_mb = h.reshape(m_count, mb, n, d)
        outs = pp_blocks_sharded(stacked_p, stacked_f, h_mb)
        h_out = outs.reshape(b, n, d).astype(h.dtype)
        return model.apply(
            variables, h_out, conditionings, method=_head_method
        )

    return apply


# ---------------------------------------------------------------------------
# Full PP TRAINING step (the productized form of make_pipelined_apply)
# ---------------------------------------------------------------------------
#
# State layout: the canonical TransformerTrainState keeps per-layer
# ``block_i`` entries (the checkpoint / reference-convertible form);
# the PP step works on a PACKED form where the homogeneous block
# subtrees are stacked into one (L, ...) tree whose leading axis
# shards over the ``pipe`` mesh axis — each device holds its stage's
# (L/P, ...) slab of params AND Adam moments.  Checkpoints are written
# canonical: pack after restore, unpack before save (the same contract
# as the manual Megatron TP step, tensor_parallel.py:pack_tp_state).


def pack_pp_tree(model, tree_):
    """Params-structured dict → {'nonblock': ..., 'blocks': stacked}
    with the ``block_i`` subtrees stacked on a new leading (L,) axis."""
    d = {
        k: v for k, v in tree_.items() if not str(k).startswith("block_")
    }
    blocks = [tree_[f"block_{i}"] for i in range(model.depth)]
    return {
        "nonblock": d,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }


def unpack_pp_tree(model, packed):
    """Exact inverse of :func:`pack_pp_tree`."""
    out = dict(packed["nonblock"])
    for i in range(model.depth):
        out[f"block_{i}"] = jax.tree.map(lambda x: x[i], packed["blocks"])
    return out


def _map_opt_state(model, opt_state, *, pack: bool):
    """Apply the stack/unstack to every params-shaped subtree of an
    optax state (Adam mu/nu), leaving counts/hyperparams untouched —
    moments are params-shaped so the identical transform applies
    (Adam's update is elementwise)."""

    def _is_canonical(node):
        return isinstance(node, dict) and any(
            str(k).startswith("block_") for k in node
        )

    def _is_packed(node):
        return isinstance(node, dict) and set(node) == {"nonblock", "blocks"}

    def _rec(node):
        if isinstance(node, dict):
            if pack and _is_canonical(node):
                return pack_pp_tree(model, node)
            if not pack and _is_packed(node):
                return unpack_pp_tree(model, node)
            return {k: _rec(v) for k, v in node.items()}
        if isinstance(node, tuple):
            out = [_rec(v) for v in node]
            return type(node)(*out) if hasattr(node, "_fields") else tuple(out)
        if isinstance(node, list):
            return [_rec(v) for v in node]
        return node

    return _rec(opt_state)


def pack_pp_state(model, state):
    """Canonical TransformerTrainState → packed (stacked-blocks) form."""
    return state.replace(
        params=pack_pp_tree(model, state.params),
        favor=pack_pp_tree(model, state.favor),
        opt_state=_map_opt_state(model, state.opt_state, pack=True),
    )


def unpack_pp_state(model, state):
    """Packed → canonical (checkpoints stay reference-convertible)."""
    return state.replace(
        params=unpack_pp_tree(model, state.params),
        favor=unpack_pp_tree(model, state.favor),
        opt_state=_map_opt_state(model, state.opt_state, pack=False),
    )


def pp_param_specs(packed, *, axis: str = "pipe"):
    """PartitionSpec tree for a packed params/favor tree: the stacked
    block slabs shard their leading (L,) axis over ``axis``, everything
    else is replicated."""
    return {
        "nonblock": jax.tree.map(lambda _: P(), packed["nonblock"]),
        "blocks": jax.tree.map(lambda _: P(axis), packed["blocks"]),
    }


def make_pp_train_step(
    model,
    tx,
    mesh: Mesh,
    *,
    axis: str = "pipe",
    data_axis: Optional[str] = None,
    n_microbatches: Optional[int] = None,
    remat_stage: bool = True,
) -> Callable:
    """Build ``step(state, inputs, targets, sched[, conds]) ->
    (state, metrics)`` training ``model`` with the depth axis sharded
    over ``mesh[axis]`` (GPipe fill-drain through
    :func:`make_pipelined_apply`, which autodiff differentiates
    straight through) — and the batch over ``data_axis`` when given
    (PP×DP).  ``state`` must be in the packed form
    (:func:`pack_pp_state`).

    Constraints: no dropout (the blocks run deterministically), depth
    divisible by the stage count, batch divisible by the microbatch
    count."""
    import optax

    from synthanatomy_tpu.losses.transformer import ce_loss

    if model.emb_dropout or model.ff_dropout or model.attn_dropout:
        raise NotImplementedError(
            "PP training runs the blocks deterministically; dropout "
            "(emb/ff/attn) is unsupported — use DP or single-device"
        )
    apply = make_pipelined_apply(
        model, mesh, axis=axis, n_microbatches=n_microbatches,
        remat_stage=remat_stage, data_axis=data_axis,
    )

    def step(state, inputs, targets, sched, conds=None):
        rng, _ = jax.random.split(state.rng)
        stacked_f = state.favor["blocks"]
        favor_nonblock = state.favor["nonblock"]

        def loss_fn(params):
            variables = {
                "params": params["nonblock"],
                "favor": favor_nonblock,
            }
            logits = apply(
                variables, params["blocks"], stacked_f, inputs, conds
            )
            return ce_loss(logits, targets)

        (loss, summaries), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
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

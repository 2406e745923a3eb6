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

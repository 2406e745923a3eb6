"""GSPMD partitioning for the Pallas attention kernels.

A ``pallas_call`` is an opaque custom call: GSPMD cannot see inside it,
so a partitioned mesh would either fail to propagate shardings through
it or replicate the whole op (this framework previously gated the
kernels off any multi-device mesh for that reason).  The attention
kernels are embarrassingly parallel over the (batch, head) leading
dims — every (b, h) slice is an independent program — so the correct
SPMD story is: shard b/h freely, replicate the sequence/feature dims,
and run one kernel instance per shard.

:func:`make_bh_partitioned` wraps a kernel-impl function in
``jax.experimental.custom_partitioning`` declaring exactly that:

- propagation (Shardy ``sharding_rule`` + classic
  ``infer_sharding_from_operands`` for the non-Shardy path) forwards
  the operands' leading-dim shardings;
- the ``partition`` callback forces non-leading dims (and designated
  fully-replicated operands, e.g. the FAVOR projection matrix) to
  replication and lowers to the ORIGINAL impl on the per-shard shapes
  — each device runs its own kernel instance, no collectives.

This is what lets the flash local-attention and fused FAVOR+ kernels
stay active under GSPMD DP, TP (heads sharded over 'model' — the
Megatron decomposition) and DP×TP meshes, replacing the reference's
single-strategy DDP (SURVEY.md §2.10).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["make_bh_partitioned"]


def _lead_only(sharding, ndim: int, n_lead: int):
    """Project a sharding to its first ``n_lead`` dims (replicate the
    rest)."""
    spec = list(sharding.spec) + [None] * (ndim - len(sharding.spec))
    kept = spec[:n_lead] + [None] * (ndim - n_lead)
    return NamedSharding(sharding.mesh, P(*kept))


def _replicated(sharding, ndim: int):
    return NamedSharding(sharding.mesh, P())


def _lead_axis_names(sharding, n_lead: int):
    """Mesh axis names the first ``n_lead`` dims are sharded over."""
    names = []
    for entry in list(sharding.spec)[:n_lead]:
        if entry is None:
            continue
        if isinstance(entry, (tuple, list)):
            names.extend(entry)
        else:
            names.append(entry)
    return tuple(names)


def make_bh_partitioned(
    impl: Callable,
    *,
    n_operands: int,
    static_argnums: Tuple[int, ...],
    rule: str,
    replicated_argnums: Sequence[int] = (),
    n_lead: int = 2,
    summed_resnums: Sequence[int] = (),
):
    """Wrap ``impl`` in custom_partitioning with (b, h)-only sharding.

    ``impl``'s array operands must come first with all static args
    TRAILING (the per-shard lowering re-appends them).  Array operands
    listed in ``replicated_argnums`` are fully replicated (shared
    weights such as the FAVOR projection); every other operand and all
    results keep only their leading ``n_lead`` dims' sharding.
    ``rule`` is the Shardy einsum-like propagation rule over the array
    operands/results.

    Results listed in ``summed_resnums`` are batch reductions (weight /
    bias gradients of a kernel backward): each shard computes its
    partial and the lowering inserts a ``lax.psum`` over the lead
    mesh axes, so the declared result sharding is fully replicated.
    """
    replicated_set = frozenset(replicated_argnums)
    summed_set = frozenset(summed_resnums)
    cp = custom_partitioning(impl, static_argnums=static_argnums)

    def _arg_sharding(i, shaped):
        if i in replicated_set:
            return _replicated(shaped.sharding, len(shaped.shape))
        return _lead_only(shaped.sharding, len(shaped.shape), n_lead)

    def _res_sharding(j, shaped):
        if j in summed_set:
            return _replicated(shaped.sharding, len(shaped.shape))
        return _lead_only(shaped.sharding, len(shaped.shape), n_lead)

    def partition(*cb_args):
        *static, mesh, arg_shapes, result_shape = cb_args
        arg_sh = tuple(
            _arg_sharding(i, a) for i, a in enumerate(arg_shapes)
        )
        if isinstance(result_shape, (tuple, list)):
            out_sh = tuple(
                _res_sharding(j, r) for j, r in enumerate(result_shape)
            )
        else:
            out_sh = _res_sharding(0, result_shape)

        psum_axes = _lead_axis_names(
            _lead_only(
                arg_shapes[0].sharding, len(arg_shapes[0].shape), n_lead
            ),
            n_lead,
        )

        def lower_fn(*operands):
            res = impl(*operands, *static)
            if not summed_set or not psum_axes:
                return res
            import jax

            if isinstance(res, (tuple, list)):
                return type(res)(
                    jax.lax.psum(r, psum_axes) if j in summed_set else r
                    for j, r in enumerate(res)
                )
            return jax.lax.psum(res, psum_axes)

        return mesh, lower_fn, out_sh, arg_sh

    def infer(*cb_args):
        *static, mesh, arg_shapes, result_shape = cb_args
        src = arg_shapes[0]
        lead = _lead_only(src.sharding, len(src.shape), n_lead)

        def _with_ndim(j, shaped):
            if j in summed_set:
                return _replicated(lead, len(shaped.shape))
            spec = list(lead.spec)[:n_lead]
            return NamedSharding(
                lead.mesh,
                P(*spec, *([None] * (len(shaped.shape) - n_lead))),
            )

        if isinstance(result_shape, (tuple, list)):
            return tuple(
                _with_ndim(j, r) for j, r in enumerate(result_shape)
            )
        return _with_ndim(0, result_shape)

    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )
    return cp

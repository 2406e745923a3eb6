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


def make_bh_partitioned(
    impl: Callable,
    *,
    n_operands: int,
    static_argnums: Tuple[int, ...],
    rule: str,
    replicated_argnums: Sequence[int] = (),
    n_lead: int = 2,
):
    """Wrap ``impl`` in custom_partitioning with (b, h)-only sharding.

    ``impl``'s array operands must come first with all static args
    TRAILING (the per-shard lowering re-appends them).  Array operands
    listed in ``replicated_argnums`` are fully replicated (shared
    weights such as the FAVOR projection); every other operand and all
    results keep only their leading ``n_lead`` dims' sharding.
    ``rule`` is the Shardy einsum-like propagation rule over the array
    operands/results.
    """
    replicated_set = frozenset(replicated_argnums)
    cp = custom_partitioning(impl, static_argnums=static_argnums)

    def _arg_sharding(i, shaped):
        if i in replicated_set:
            return _replicated(shaped.sharding, len(shaped.shape))
        return _lead_only(shaped.sharding, len(shaped.shape), n_lead)

    def partition(*cb_args):
        *static, mesh, arg_shapes, result_shape = cb_args
        arg_sh = tuple(
            _arg_sharding(i, a) for i, a in enumerate(arg_shapes)
        )
        if isinstance(result_shape, (tuple, list)):
            out_sh = tuple(
                _lead_only(r.sharding, len(r.shape), n_lead)
                for r in result_shape
            )
        else:
            out_sh = _lead_only(
                result_shape.sharding, len(result_shape.shape), n_lead
            )

        def lower_fn(*operands):
            return impl(*operands, *static)

        return mesh, lower_fn, out_sh, arg_sh

    def infer(*cb_args):
        *static, mesh, arg_shapes, result_shape = cb_args
        src = arg_shapes[0]
        lead = _lead_only(src.sharding, len(src.shape), n_lead)

        def _with_ndim(shaped):
            spec = list(lead.spec)[:n_lead]
            return NamedSharding(
                lead.mesh,
                P(*spec, *([None] * (len(shaped.shape) - n_lead))),
            )

        if isinstance(result_shape, (tuple, list)):
            return tuple(_with_ndim(r) for r in result_shape)
        return _with_ndim(result_shape)

    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )
    return cp

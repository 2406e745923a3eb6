"""Shared VMEM tile-sizing heuristic for the batched Pallas kernels.

Both training kernel families (banded-flash local attention,
``local_attention_pallas.py``; fused FAVOR+, ``favor_pallas.py``)
batch a ``bt``-deep batch·head tile per grid step to amortize the
per-step fixed costs.  The depth is bounded by the same reasoning in
both: the ``live`` fp32 (bt, A, B) feature/score tensors of the kernel
body must stay well inside the ~16 MB/core scoped VMEM — and the tile
model budgets well UNDER the limit because operand double buffers,
concat copies and outputs share it (measured: the local backward at
bt=6/s=128 hit 17 MB against the 16 MB limit; the FAVOR backward at
bt=12/chunk=128 hit 19.6 MB)."""

from __future__ import annotations

__all__ = ["vmem_bh_tile"]

_BUDGET = 6 * 1024 * 1024


def vmem_bh_tile(
    bh: int, tile_elems: int, live: int, *, start: int = 8,
    budget: int = _BUDGET,
) -> int:
    """Largest ``bt <= start`` dividing ``bh`` with ``live`` fp32
    (bt, tile_elems) tensors inside ``budget`` bytes."""
    bt = start
    while bt > 1 and (bh % bt != 0 or live * bt * tile_elems * 4 > budget):
        bt -= 1
    return bt

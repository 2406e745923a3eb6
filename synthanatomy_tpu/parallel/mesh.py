"""Device mesh + sharding utilities.

The TPU-native replacement for the reference's entire distributed
stack — deepspeed ``init_distributed(nccl)`` + torch DDP +
DistributedSampler + explicit ``dist.all_reduce`` (SURVEY.md §2.10,
§5.8; reference run_vqvae.py:71-77, 832-846; baseline.py:70-72).

Design: a ``jax.sharding.Mesh`` with a ``data`` axis (DP) and an
optional ``model`` axis (TP for the Performer).  Batches are sharded on
``data``; parameters/codebook are replicated (or model-sharded);
gradient and EMA-statistic reductions are inserted by GSPMD and ride
ICI.  Multi-host: ``jax.distributed.initialize()`` + per-host data
sharding replaces the env-rank/NCCL plumbing.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "put_replicated",
    "put_sharded",
    "shard_batch",
    "host_shard_info",
]


def make_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("data", "model"),
    *,
    devices=None,
) -> Mesh:
    """Build a mesh over all devices.  Default: everything on the
    ``data`` axis, ``model`` axis of size 1."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n,) + (1,) * (len(axis_names) - 1)
    mesh_shape = tuple(int(s) for s in mesh_shape)
    need = int(np.prod(mesh_shape))
    if need > n:
        raise ValueError(
            f"mesh_shape {mesh_shape} needs {need} devices, have {n}"
        )
    # an explicit smaller mesh uses the leading devices (debug meshes
    # on many-device hosts) — loudly, so a stale/typo'd mesh_shape
    # doesn't silently train at a fraction of the machine
    if need < n:
        import logging

        logging.getLogger("synthanatomy_tpu").warning(
            f"mesh {mesh_shape} uses {need} of {n} devices; "
            f"{n - need} device(s) idle"
        )
    dev_array = np.asarray(devices[:need]).reshape(mesh_shape)
    return Mesh(dev_array, axis_names[: len(mesh_shape)])


def make_data_mesh_for_batch(
    batch_size: int,
    mesh_shape: Optional[Sequence[int]] = None,
    *,
    devices=None,
) -> Mesh:
    """Data-axis mesh whose size divides ``batch_size`` (uses the
    largest such device count) — keeps small debug batches runnable on
    many-device hosts while using every device when batch allows.

    An explicit 2-tuple ``mesh_shape`` builds a (data, model) mesh —
    the ``--mesh_shape='(d,m)'`` CLI surface."""
    if mesh_shape is not None:
        return make_mesh(mesh_shape, ("data", "model"), devices=devices)
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh((n,), ("data",), devices=devices[:n])


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim on 'data', replicate the rest."""
    spec = PartitionSpec("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(mesh: Mesh, batch):
    """Place a (possibly nested) host batch with the leading axis
    sharded over 'data'.

    Single-process: a plain sharded device_put.  Multi-process: the
    input is this host's *local* shard (the loaders are already
    host-sharded via :func:`host_shard_info`) and the global array is
    assembled across processes — the DistributedSampler + DDP-input
    replacement (reference src/utils/vqvae.py:406-408)."""
    multi = jax.process_count() > 1

    def _put(x):
        x = np.asarray(x)
        sharding = data_sharding(mesh, x.ndim)
        if multi:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree.map(_put, batch)


def put_replicated(mesh: Mesh, tree):
    """Replicate a host pytree onto every device of ``mesh``.

    Single-process: plain device_put.  Multi-process: global arrays are
    assembled from (identical) per-host copies — device_put cannot
    target non-addressable shardings."""
    sharding = replicated(mesh)
    multi = jax.process_count() > 1

    def _put(x):
        if not multi:
            return jax.device_put(x, sharding)
        # typed PRNG keys can't round-trip through numpy directly
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            data = jax.make_array_from_process_local_data(
                replicated(mesh), np.asarray(jax.random.key_data(x))
            )
            return jax.random.wrap_key_data(
                data, impl=jax.random.key_impl(x)
            )
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(_put, tree)


def put_sharded(mesh: Mesh, tree, specs):
    """Place a host pytree with per-leaf ``PartitionSpec``s — the
    sharded-parameter analogue of :func:`put_replicated`.

    Single-process: plain device_put.  Multi-process: global arrays are
    assembled shard-by-shard from each host's (identical) full copy via
    ``jax.make_array_from_callback`` — device_put cannot target
    non-addressable shardings.  ``specs`` must mirror ``tree``'s
    structure with a ``PartitionSpec`` per array leaf (e.g.
    ``tensor_parallel.tp_param_specs``)."""
    multi = jax.process_count() > 1

    def _put(x, spec):
        sh = NamedSharding(mesh, spec)
        if not multi:
            return jax.device_put(x, sh)
        xnp = np.asarray(x)
        return jax.make_array_from_callback(
            xnp.shape, sh, lambda idx: xnp[idx]
        )

    return jax.tree.map(_put, tree, specs)


def host_shard_info() -> Tuple[int, int]:
    """(shard_id, num_shards) for per-host data loading — the
    DistributedSampler replacement.  Single-process: (0, 1)."""
    return jax.process_index(), jax.process_count()

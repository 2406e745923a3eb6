"""Checkpointing + experiment directory layout.

Rebuild of the reference's MONAI CheckpointSaver/CheckpointLoader wiring
and auto-resume semantics (SURVEY.md §5.4; reference
src/utils/general.py:75-282, run_vqvae.py:312-361):

- directory layout ``{project}/{experiment}/{network}/{checkpoints,
  logs, outputs, caching}`` (general.py:225-282);
- naming contract ``checkpoint_epoch={N}`` (orbax directories instead
  of ``.pt`` files) and ``checkpoint_key_metric={score}`` for the
  best-metric saver; ``n_saved=1`` pruning for the periodic saver;
- auto-resume: if the checkpoint dir is non-empty and
  ``starting_epoch == 0``, resume from the latest epoch
  (``starting_epoch=-1`` resolution, general.py:93-107, 259-269);
- ``evaluation_checkpoint ∈ {recent, best}`` selection at inference
  (general.py:141-166).

Orbax does the actual (de)serialization of the train-state pytree.
"""

from __future__ import annotations

import logging
import os
import re
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

__all__ = [
    "create_folder_structure",
    "check_for_checkpoints",
    "save_checkpoint",
    "load_checkpoint",
    "save_best_checkpoint",
    "prune_old_checkpoints",
]

_EPOCH_RE = re.compile(r"checkpoint_epoch=(\d+)$")
_BEST_RE = re.compile(r"checkpoint_key_metric=(-?[\d.]+)$")


def create_folder_structure(
    project_directory: str,
    experiment_name: str,
    network: str,
    *,
    starting_epoch: int = 0,
    logger: Optional[logging.Logger] = None,
) -> Tuple[Dict[str, str], int]:
    """Create the experiment tree; returns (directories, starting_epoch)
    where starting_epoch flips to -1 when checkpoints already exist
    (the auto-resume trigger)."""
    experiment_directory = os.path.join(
        project_directory, experiment_name, network
    )
    dirs = {
        "experiment_directory": experiment_directory,
        "checkpoint_directory": os.path.join(experiment_directory, "checkpoints"),
        "logs_directory": os.path.join(experiment_directory, "logs"),
        "outputs_directory": os.path.join(experiment_directory, "outputs"),
        "cache_dir": os.path.join(experiment_directory, "caching"),
    }
    for d in dirs.values():
        Path(d).mkdir(parents=True, exist_ok=True)

    if starting_epoch == 0 and os.listdir(dirs["checkpoint_directory"]):
        starting_epoch = -1
        if logger:
            logger.warning("The experiment already exists. Checkpoints were found at:")
            logger.warning(dirs["checkpoint_directory"])
            logger.warning("The starting epoch has been modified from 0 to -1.")
    return dirs, starting_epoch


def _epoch_checkpoints(checkpoint_directory: str) -> Dict[int, str]:
    out = {}
    if not os.path.isdir(checkpoint_directory):
        return out
    for name in os.listdir(checkpoint_directory):
        m = _EPOCH_RE.match(name)
        if m:
            out[int(m.group(1))] = os.path.join(checkpoint_directory, name)
    return out


def check_for_checkpoints(
    checkpoint_directory: str,
    *,
    mode: str = "training",
    starting_epoch: int = 0,
    evaluation_checkpoint: str = "recent",
    logger: Optional[logging.Logger] = None,
) -> Tuple[Optional[str], int]:
    """Resolve the checkpoint path per the reference rules.  Returns
    (path or None, resolved starting_epoch)."""
    cps = _epoch_checkpoints(checkpoint_directory)
    if mode == "training":
        if starting_epoch == -1:
            if not cps:
                raise FileNotFoundError(
                    f"auto-resume requested but no checkpoints in "
                    f"{checkpoint_directory}"
                )
            starting_epoch = max(cps)
        if starting_epoch > 0:
            path = cps.get(starting_epoch)
            if path is None:
                raise FileNotFoundError(
                    f"Checkpoint for epoch {starting_epoch} not found in "
                    f"{checkpoint_directory}"
                )
            if logger:
                logger.info(f"Resume from checkpoint: {path}")
            return path, starting_epoch
        return None, starting_epoch

    # evaluation modes
    if starting_epoch > 0:
        path = cps.get(starting_epoch)
        if path is None:
            raise FileNotFoundError(
                f"Checkpoint for epoch {starting_epoch} not found"
            )
        return path, starting_epoch
    if evaluation_checkpoint == "recent":
        if not cps:
            raise FileNotFoundError(f"no checkpoints in {checkpoint_directory}")
        ep = max(cps)
        return cps[ep], ep
    if evaluation_checkpoint == "best":
        best = [
            os.path.join(checkpoint_directory, n)
            for n in os.listdir(checkpoint_directory)
            if _BEST_RE.match(n)
        ]
        if len(best) != 1:
            raise FileNotFoundError(
                f"Should only be one best metric checkpoint, found {best}"
            )
        return best[0], starting_epoch
    raise ValueError(
        f"evaluation_checkpoint must be 'recent' or 'best', got "
        f"{evaluation_checkpoint!r}"
    )


def save_checkpoint(checkpoint_directory: str, state: Any, epoch: int) -> str:
    """Write ``checkpoint_epoch={epoch}`` (orbax), pruning older epoch
    checkpoints to n_saved=1 (run_vqvae.py:346-352)."""
    path = os.path.join(checkpoint_directory, f"checkpoint_epoch={epoch}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()
    prune_old_checkpoints(checkpoint_directory, keep_epoch=epoch)
    return path


def prune_old_checkpoints(checkpoint_directory: str, keep_epoch: int) -> None:
    for ep, path in _epoch_checkpoints(checkpoint_directory).items():
        if ep != keep_epoch:
            shutil.rmtree(path, ignore_errors=True)


def save_best_checkpoint(
    checkpoint_directory: str, state: Any, metric_value: float
) -> str:
    """Best-key-metric saver (run_vqvae.py:354-361): keeps exactly one
    ``checkpoint_key_metric={value}`` directory."""
    for name in os.listdir(checkpoint_directory):
        if _BEST_RE.match(name):
            shutil.rmtree(
                os.path.join(checkpoint_directory, name), ignore_errors=True
            )
    path = os.path.join(
        checkpoint_directory, f"checkpoint_key_metric={metric_value:.4f}"
    )
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore a train-state pytree saved by :func:`save_checkpoint`
    (``target`` provides structure/shapes/dtypes).

    Falls back to a partial restore when the on-disk tree is a superset
    of the target — e.g. loading a training checkpoint (with
    discriminator/optimizer state) into an inference-shaped state, the
    reference's ``to_load`` exclusion behaviour (run_vqvae.py:330-336).
    """
    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(os.path.abspath(path), target)
    except ValueError:
        raw = ckptr.restore(os.path.abspath(path))
        return _partial_merge(target, raw)


def _partial_merge(target: Any, raw: Any) -> Any:
    """Graft every value present in the raw (untyped) checkpoint tree
    onto the matching node of ``target``; missing nodes keep the
    target's (freshly initialized) value."""
    import dataclasses

    import jax.numpy as jnp

    if raw is None:
        return target
    if isinstance(target, dict):
        if not isinstance(raw, dict):
            return target
        return {k: _partial_merge(v, raw.get(k)) for k, v in target.items()}
    if hasattr(target, "_fields"):  # NamedTuple
        vals = [
            _partial_merge(
                getattr(target, f), raw.get(f) if isinstance(raw, dict) else None
            )
            for f in target._fields
        ]
        return type(target)(*vals)
    if dataclasses.is_dataclass(target) and not isinstance(target, type):
        kw = {}
        for f in dataclasses.fields(target):
            r = raw.get(f.name) if isinstance(raw, dict) else None
            kw[f.name] = _partial_merge(getattr(target, f.name), r)
        return type(target)(**kw)
    if isinstance(target, (list, tuple)):
        out = []
        for i, v in enumerate(target):
            if isinstance(raw, (list, tuple)) and i < len(raw):
                r = raw[i]
            elif isinstance(raw, dict):
                r = raw.get(str(i), raw.get(i))
            else:
                r = None
            out.append(_partial_merge(v, r))
        return type(target)(out) if isinstance(target, list) else tuple(out)
    # leaf
    if isinstance(raw, (dict, list, tuple)):
        return target
    try:
        arr = jnp.asarray(raw)
        if hasattr(target, "dtype") and arr.dtype != target.dtype:
            arr = arr.astype(target.dtype)
        if hasattr(target, "shape") and arr.shape != target.shape:
            return target
        return arr
    except (TypeError, ValueError):
        return target

"""Shared experiment utilities.

Rebuild of reference ``src/utils/general.py``: logging setup, config
dump, determinism, network-size logging, conditioning preprocessing
helpers.  Folder structure / checkpoint discovery live in
``synthanatomy_tpu.train.checkpoints``; LR rules of thumb in
``synthanatomy_tpu.train.schedulers``.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Any, Optional, Tuple

import jax
import numpy as np

__all__ = [
    "setup_logger",
    "log_basic_info",
    "log_network_size",
    "basic_initialization",
    "quantize_conditionings",
    "uniform_sampling",
]


def setup_logger(name: str, rank: int = 0, logs_directory: Optional[str] = None) -> logging.Logger:
    """Rank-aware console (+file) logger (ignite setup_logger
    equivalent, reference general.py:327)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO if rank == 0 else logging.WARNING)
    logger.handlers.clear()
    fmt = logging.Formatter(
        f"%(asctime)s [rank {rank}] %(name)s %(levelname)s: %(message)s"
    )
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if logs_directory:
        fh = logging.FileHandler(f"{logs_directory}/{name}.log")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def log_basic_info(config: Any, logger: logging.Logger) -> None:
    import dataclasses

    logger.info("Configuration:")
    d = dataclasses.asdict(config) if dataclasses.is_dataclass(config) else dict(config)
    for k, v in d.items():
        logger.info(f"\t{k}: {v}")
    logger.info(f"JAX backend: {jax.default_backend()}")
    logger.info(f"Devices: {jax.devices()}")


def log_network_size(params: Any, logger: logging.Logger, name: str = "network") -> None:
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info(f"Number of parameters in {name}: {n:,}")


def basic_initialization(config, logger_name: str):
    """Logger + determinism + folder structure + checkpoint discovery
    (reference general.py:303-345).  Returns (logger, dirs,
    checkpoint_path, starting_epoch, root_rng)."""
    from synthanatomy_tpu.train.checkpoints import (
        check_for_checkpoints,
        create_folder_structure,
    )

    logger = setup_logger(logger_name, rank=config.rank)
    log_basic_info(config, logger)

    # persistent XLA compilation cache: big-model compiles through the
    # TPU tunnel take minutes; cache them across processes.  Default
    # lives next to the package (shared with bench/tools/tests);
    # override with SYNTHANATOMY_JAX_CACHE, disable with ''.
    cache_dir = os.environ.get(
        "SYNTHANATOMY_JAX_CACHE",
        os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
        ),
    )
    if cache_dir and jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir", cache_dir)

    dirs, starting_epoch = create_folder_structure(
        config.project_directory,
        config.experiment_name,
        config.network,
        starting_epoch=config.starting_epoch,
        logger=logger,
    )
    checkpoint_path, starting_epoch = check_for_checkpoints(
        dirs["checkpoint_directory"],
        mode=config.mode,
        starting_epoch=starting_epoch,
        evaluation_checkpoint=config.evaluation_checkpoint,
        logger=logger,
    )
    # per-rank seeding (reference set_determinism(seed + rank))
    root_rng = jax.random.key(config.seed + config.rank)
    return logger, dirs, checkpoint_path, starting_epoch, root_rng


def quantize_conditionings(
    conditionings_path: str,
    id_column: str,
    chosen_conditionings: Tuple[str, ...],
    chosen_quantiles: Tuple[Optional[int], ...],
    output_path: str,
    output_filename: str,
) -> str:
    """Quantile-bin continuous conditioning columns (reference
    general.py:348-371)."""
    import pandas as pd

    df = pd.read_csv(
        conditionings_path,
        usecols=list(chosen_conditionings) + [id_column],
        low_memory=False,
    )
    for cc, cq in zip(chosen_conditionings, chosen_quantiles):
        if cq is not None:
            df[cc] = pd.qcut(df[cc], cq, labels=False)
    df = df.dropna(axis=0, how="any").reset_index(drop=True)
    df[list(chosen_conditionings)] = df[list(chosen_conditionings)].astype(int)
    out = f"{output_path}/{output_filename}.csv"
    df.to_csv(out, index=False)
    return out


def uniform_sampling(
    conditionings_path: str,
    chosen_conditionings: Tuple[str, ...],
    output_path: str,
) -> str:
    """Uniform class-balanced subsample over conditioning groups
    (reference general.py:374-389)."""
    import pandas as pd

    df = pd.read_csv(conditionings_path)
    dfgby = df.groupby(list(chosen_conditionings))
    n = int(dfgby.size().min())
    samples = [
        group.sample(n=n, replace=False, random_state=0)
        for _, group in dfgby
    ]
    out = f"{output_path}/uniform_quantized_conditioning.csv"
    pd.concat(samples).to_csv(out, index=False)
    return out


class PreemptionGuard:
    """Graceful-preemption checkpointing (beyond the reference, which
    has checkpoint-resume only — SURVEY.md §5.3): installs a SIGTERM
    handler (by default; pass ``signals=(SIGTERM, SIGINT)`` to also
    catch Ctrl-C) that sets a flag instead of killing the process, so
    the training loop can finish the in-flight step, write an emergency
    checkpoint at the next epoch boundary and exit cleanly.  TPU
    preemptions (maintenance events, spot reclaims) deliver SIGTERM
    with a grace window — this turns them into a resumable checkpoint
    instead of a lost epoch.

    Usage::

        guard = PreemptionGuard(logger)
        for epoch in ...:
            ...train...
            if guard.should_stop:
                save_checkpoint(...); break
    """

    def __init__(self, logger=None, signals=None):
        import signal as _signal

        self.should_stop = False
        self._logger = logger
        self._prev = {}
        for sig in signals or (_signal.SIGTERM,):
            try:
                self._prev[sig] = _signal.signal(sig, self._handler)
            except (ValueError, OSError):
                pass  # not the main thread / unsupported platform

    def _handler(self, signum, frame):
        self.should_stop = True
        if self._logger is not None:
            self._logger.warning(
                f"signal {signum} received — checkpointing at the next "
                "epoch boundary and exiting"
            )

    def restore(self):
        import signal as _signal

        for sig, prev in self._prev.items():
            try:
                _signal.signal(sig, prev)
            except (ValueError, OSError):
                pass

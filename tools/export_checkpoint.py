#!/usr/bin/env python
"""Export synthanatomy_tpu parameters back to reference-layout torch
state dicts — the exact inverse of ``tools/convert_checkpoint.py``.

Lets models trained on TPU be loaded by the reference CUDA/torch
codebase (module naming of ``BaselineVQVAE``, reference
src/networks/vqvae/baseline.py:213-299, and ``BaselineDiscriminator``,
src/networks/discriminator/baseline.py:41-84):

- DHWIO conv kernels      → torch Conv3d (O, I, D, H, W)
- DHWIO forward-oriented  → torch ConvTranspose3d (I, O, D, H, W)
- VQState(codebook, cluster_size, embed_avg) → ``impl.embedding.weight``
  / ``impl.N`` / ``impl.embed_avg`` (and ``impl.embedding_avg``-free —
  the reference reads only those three buffers)
- BatchNorm scale/bias + batch_stats → weight/bias/running stats

Usage:
  python tools/export_checkpoint.py vqvae <orbax-or-npz-in> out.pt \
      [--n_levels=4 --n_res_layers=3]
Library use: ``export_vqvae_state_dict`` / ``export_discriminator_state_dict``.
"""

from __future__ import annotations

import sys
from typing import Any, Dict

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from synthanatomy_tpu.interop import (  # noqa: E402
    export_discriminator_state_dict,
    export_performer_state_dict,
    export_vqvae_state_dict,
)

__all__ = [
    "export_vqvae_state_dict",
    "export_discriminator_state_dict",
    "export_performer_state_dict",
]


def _load_source(src: str, kind: str):
    """(params, aux, favor) from a converter-layout ``.npz`` or an
    orbax checkpoint directory saved by ``train/checkpoints.py``
    (``checkpoint_epoch=N`` of the matching runner's train state)."""
    import os

    if src.endswith(".npz"):
        flat = dict(np.load(src))
        tree: Dict[str, Any] = {}
        for key, val in flat.items():
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = val
        params = tree["params"]
        aux = tree.get("vq") or tree.get("batch_stats") or {}
        return params, aux, tree.get("favor")
    if os.path.isdir(src):
        import orbax.checkpoint as ocp

        raw = ocp.StandardCheckpointer().restore(os.path.abspath(src))
        if kind == "vqvae":
            return raw["g_params"], raw.get("vq") or {}, None
        if kind == "discriminator":
            if raw.get("d_params") is None:
                raise SystemExit(
                    f"{src} carries no discriminator state (trained "
                    "with adversarial_component=False?)"
                )
            return raw["d_params"], raw.get("d_batch_stats") or {}, None
        # performer train state
        return raw["params"], {}, raw.get("favor")
    raise SystemExit(f"{src} is neither a .npz nor a checkpoint directory")


def main():
    if len(sys.argv) < 4:
        raise SystemExit(
            "usage: export_checkpoint.py {vqvae|discriminator|performer} "
            "<checkpoint-dir-or-npz> out.pt "
            "[--n_levels=N --n_res_layers=M --depth=N]"
        )
    kind, src, dst = sys.argv[1:4]
    kwargs = {}
    for tok in sys.argv[4:]:
        if tok.startswith("--"):
            k, v = tok[2:].split("=")
            kwargs[k] = int(v) if v.isdigit() else v

    import torch

    params, aux, favor = _load_source(src, kind)

    if kind == "vqvae":
        if not hasattr(aux.get("level_0", None), "codebook"):
            from synthanatomy_tpu.ops.vq import VQState

            lv = aux["level_0"]
            aux = {"level_0": VQState(
                codebook=lv["codebook"], cluster_size=lv["cluster_size"],
                embed_avg=lv["embed_avg"],
            )}
        sd = export_vqvae_state_dict(
            params, aux,
            n_levels=int(kwargs.get("n_levels", 3)),
            n_res_layers=int(kwargs.get("n_res_layers", 3)),
            use_subpixel_conv=bool(kwargs.get("use_subpixel_conv", False)),
        )
    elif kind == "discriminator":
        sd = export_discriminator_state_dict(
            params, aux, n_layers=int(kwargs.get("n_layers", 3))
        )
    elif kind == "performer":
        depth = int(
            kwargs.get(
                "depth",
                1 + max(
                    int(k.split("_")[1]) for k in params if k.startswith("block_")
                ),
            )
        )
        sd = export_performer_state_dict(params, depth=depth, favor=favor)
    else:
        raise SystemExit(f"unknown kind {kind}")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, dst)
    print(f"wrote {dst} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()

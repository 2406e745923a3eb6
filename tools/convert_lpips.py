#!/usr/bin/env python
"""Convert official LPIPS (pip ``lpips`` package / torchvision) weights
into the ``.npz`` layout consumed by
``synthanatomy_tpu.losses.lpips.load_lpips_npz``.

Inputs (all torch state dicts, loaded on CPU):
- the backbone features: torchvision ``alexnet`` / ``squeezenet1_1``
  state dict (``features.*`` conv weights), and
- the LPIPS linear heads: the pip package's ``lpips/weights/v0.1/
  {alex,squeeze}.pth`` (keys ``lin{i}.model.1.weight``).

Conversions: Conv2d (O, I, H, W) → HWIO.

Usage:
  python tools/convert_lpips.py alex alexnet.pth lpips_alex.pth out.npz
"""

from __future__ import annotations

import sys
from typing import Dict

import numpy as np

__all__ = ["convert_lpips"]


def _w(t):
    return np.transpose(np.asarray(t), (2, 3, 1, 0))  # OIHW → HWIO


def convert_lpips(
    net: str,
    backbone_sd: Dict[str, np.ndarray],
    lin_sd: Dict[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {"kind": np.asarray(net)}

    def conv(dst, src):
        flat[f"net/{dst}/w"] = _w(backbone_sd[f"{src}.weight"])
        flat[f"net/{dst}/b"] = np.asarray(backbone_sd[f"{src}.bias"])

    if net == "alex":
        # torchvision alexnet feature indices: 0, 3, 6, 8, 10
        for dst, idx in (
            ("conv1", 0), ("conv2", 3), ("conv3", 6), ("conv4", 8), ("conv5", 10),
        ):
            conv(dst, f"features.{idx}")
        n_lin = 5
    elif net == "squeeze":
        # torchvision squeezenet1_1: conv at features.0; fire modules at
        # 3,4,6,7,9,10,11,12
        conv("conv1", "features.0")
        fire_idx = (3, 4, 6, 7, 9, 10, 11, 12)
        for i, fi in enumerate(fire_idx, start=1):
            for part, tname in (
                ("squeeze", "squeeze"),
                ("expand1", "expand1x1"),
                ("expand3", "expand3x3"),
            ):
                flat[f"net/fire{i}/{part}/w"] = _w(
                    backbone_sd[f"features.{fi}.{tname}.weight"]
                )
                flat[f"net/fire{i}/{part}/b"] = np.asarray(
                    backbone_sd[f"features.{fi}.{tname}.bias"]
                )
        n_lin = 7
    else:
        raise ValueError(f"unknown net {net!r}")

    for i in range(n_lin):
        key = f"lin{i}.model.1.weight"
        if key not in lin_sd:
            key = f"lins.{i}.model.1.weight"
        flat[f"lin/lin{i}/w"] = _w(lin_sd[key])
    return flat


def main():
    if len(sys.argv) != 5:
        raise SystemExit(
            "usage: convert_lpips.py {alex|squeeze} backbone.pth lin.pth out.npz"
        )
    net, backbone_path, lin_path, out = sys.argv[1:]
    import torch

    bsd = {
        k: v.detach().cpu().numpy()
        for k, v in torch.load(backbone_path, map_location="cpu", weights_only=False).items()
        if hasattr(v, "numpy")
    }
    lsd = {
        k: v.detach().cpu().numpy()
        for k, v in torch.load(lin_path, map_location="cpu", weights_only=False).items()
        if hasattr(v, "numpy")
    }
    np.savez(out, **convert_lpips(net, bsd, lsd))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

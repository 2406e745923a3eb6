#!/usr/bin/env python
"""Fetch + convert the official LPIPS weights into the ``.npz`` layout
consumed by ``synthanatomy_tpu.losses.lpips.load_lpips_npz``.

The reference's perceptual losses use the pip ``lpips`` package with
pretrained AlexNet/SqueezeNet backbones (reference
src/losses/vqvae/vqvae.py:836-869, 1656).  This environment has no
network egress, so the framework falls back to fixed-random features
with a loud warning; run this script anywhere with internet access and
point ``--lpips_weights`` at the produced ``.npz``.

Sources (verified):
- torchvision backbones from download.pytorch.org — the filename embeds
  the first 8 hex chars of the file's sha256, which this script checks;
- LPIPS v0.1 linear heads from the PerceptualSimilarity repo (the same
  files the pip package ships) — validated structurally (key set and
  per-tap channel counts) after download.

Usage:
  python tools/fetch_lpips_weights.py alex lpips_alex.npz
  python tools/fetch_lpips_weights.py squeeze lpips_squeeze.npz
"""

from __future__ import annotations

import hashlib
import os
import sys
import tempfile
import urllib.request

SOURCES = {
    "alex": {
        "backbone": (
            "https://download.pytorch.org/models/alexnet-owt-7be5be79.pth",
            "7be5be79",
        ),
        "lin": (
            "https://github.com/richzhang/PerceptualSimilarity/raw/master/"
            "lpips/weights/v0.1/alex.pth",
            None,
        ),
    },
    "squeeze": {
        "backbone": (
            "https://download.pytorch.org/models/squeezenet1_1-b8a52dc0.pth",
            "b8a52dc0",
        ),
        "lin": (
            "https://github.com/richzhang/PerceptualSimilarity/raw/master/"
            "lpips/weights/v0.1/squeeze.pth",
            None,
        ),
    },
}


def _fetch(url: str, sha_prefix, dst_dir: str) -> str:
    path = os.path.join(dst_dir, os.path.basename(url))
    print(f"fetching {url}")
    urllib.request.urlretrieve(url, path)
    if sha_prefix:
        digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
        if not digest.startswith(sha_prefix):
            raise RuntimeError(
                f"checksum mismatch for {url}: sha256 {digest[:8]} != "
                f"expected prefix {sha_prefix}"
            )
        print(f"  sha256 {digest[:8]}... OK")
    return path


def main():
    if len(sys.argv) != 3 or sys.argv[1] not in SOURCES:
        raise SystemExit("usage: fetch_lpips_weights.py {alex|squeeze} out.npz")
    net, out = sys.argv[1:]

    import numpy as np
    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from convert_lpips import convert_lpips

    with tempfile.TemporaryDirectory() as tmp:
        backbone = _fetch(*SOURCES[net]["backbone"], tmp)
        lin = _fetch(*SOURCES[net]["lin"], tmp)
        bsd = {
            k: v.detach().cpu().numpy()
            for k, v in torch.load(
                backbone, map_location="cpu", weights_only=False
            ).items()
            if hasattr(v, "numpy")
        }
        lsd = {
            k: v.detach().cpu().numpy()
            for k, v in torch.load(
                lin, map_location="cpu", weights_only=False
            ).items()
            if hasattr(v, "numpy")
        }
        np.savez(out, **convert_lpips(net, bsd, lsd))

    # structural validation through the real loader
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from synthanatomy_tpu.losses.lpips import load_lpips_npz

    params = load_lpips_npz(out)
    assert params.kind == net
    print(f"wrote {out} (validated: kind={params.kind})")


if __name__ == "__main__":
    main()

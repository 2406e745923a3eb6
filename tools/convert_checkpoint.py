#!/usr/bin/env python
"""Convert released PyTorch checkpoints to synthanatomy_tpu parameter
trees.

The reference releases eight pretrained ``.pt`` checkpoints
(reference README.md:20-27) whose state dicts follow the module naming
of ``BaselineVQVAE`` (reference src/networks/vqvae/baseline.py:213-299)
and ``BaselineDiscriminator`` (src/networks/discriminator/baseline.py:
41-84).  This tool maps those names and memory layouts onto the flax
parameter/variable trees of this framework:

- ``Conv3d``          (O, I, D, H, W) → DHWIO
- ``ConvTranspose3d`` (I, O, D, H, W) → DHWIO (this framework stores
  transposed-conv kernels in forward orientation; the spatial flip
  happens inside ``ops.conv3d.conv_transpose3d``)
- ``Linear``          (out, in)       → (in, out)
- EMA codebook buffers ``impl.embedding.weight`` / ``impl.N`` /
  ``impl.embed_avg`` → ``VQState(codebook, cluster_size, embed_avg)``
- BatchNorm weight/bias/running stats → scale/bias + batch_stats

Usage:
  python tools/convert_checkpoint.py vqvae  checkpoint_epoch=0.pt out.npz
  python tools/convert_checkpoint.py to_vqvae_variables  # (library use)
"""

from __future__ import annotations

import sys
from typing import Any, Dict, Tuple

import numpy as np

__all__ = [
    "convert_vqvae_state_dict",
    "convert_discriminator_state_dict",
    "load_torch_state_dict",
]


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch Conv3d (O, I, D, H, W) → DHWIO."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def _convT_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d (I, O, D, H, W) → DHWIO."""
    return np.transpose(w, (2, 3, 4, 0, 1))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pt`` checkpoint to numpy without CUDA.  Handles both
    raw state dicts and the MONAI CheckpointSaver dict layout
    ({'network': ..., 'optimizer': ...}, reference run_vqvae.py:312-326)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "network" in obj:
        obj = obj["network"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def convert_vqvae_state_dict(
    sd: Dict[str, np.ndarray],
    *,
    n_levels: int,
    n_res_layers: int,
    use_subpixel_conv: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference BaselineVQVAE state dict → (params, vq_variables).

    Reference module indices (baseline.py:213-299):
      encoder.0: [Conv, ReLU, Seq(res…)] × levels + final Conv
      decoder.0: [Conv_in] + per level [Seq(res…), Upsample(, ReLU)]
      quantizer.0.impl: embedding.weight / N / embed_avg
    ResidualLayer Sequential indices: 0 = 3³ conv, 3 = 1³ conv.
    """
    from synthanatomy_tpu.ops.vq import VQState

    params: Dict[str, Any] = {}

    def conv_entry(prefix: str) -> Dict[str, np.ndarray]:
        entry = {"kernel": _conv_w(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            entry["bias"] = sd[f"{prefix}.bias"]
        return entry

    def res_entry(prefix: str) -> Dict[str, Any]:
        # ResidualLayer submodules map to flax names TorchConv3d_0/_1
        return {
            "TorchConv3d_0": conv_entry(f"{prefix}.0"),
            "TorchConv3d_1": conv_entry(f"{prefix}.3"),
        }

    # ---- encoder
    for i in range(n_levels):
        params[f"encoder_conv_{i}"] = conv_entry(f"encoder.0.{3 * i}")
        for j in range(n_res_layers):
            params[f"encoder_res_{i}_{j}"] = res_entry(f"encoder.0.{3 * i + 2}.{j}")
    params["encoder_out_conv"] = conv_entry(f"encoder.0.{3 * n_levels}")

    # ---- decoder
    params["decoder_in_conv"] = conv_entry("decoder.0.0")
    for i in range(n_levels):
        base = 1 + 3 * i
        for j in range(n_res_layers):
            params[f"decoder_res_{i}_{j}"] = res_entry(f"decoder.0.{base}.{j}")
        up_idx = base + 1
        last = i == n_levels - 1
        if last and use_subpixel_conv:
            params["decoder_subpixel"] = {
                "kernel": _conv_w(sd[f"decoder.0.{up_idx}.conv_block.weight"]),
                "bias": sd[f"decoder.0.{up_idx}.conv_block.bias"],
            }
        else:
            entry = {"kernel": _convT_w(sd[f"decoder.0.{up_idx}.weight"])}
            if f"decoder.0.{up_idx}.bias" in sd:
                entry["bias"] = sd[f"decoder.0.{up_idx}.bias"]
            params[f"decoder_up_{i}"] = entry

    # ---- EMA codebook
    vq = {
        "level_0": VQState(
            codebook=np.asarray(sd["quantizer.0.impl.embedding.weight"], np.float32),
            cluster_size=np.asarray(sd["quantizer.0.impl.N"], np.float32),
            embed_avg=np.asarray(sd["quantizer.0.impl.embed_avg"], np.float32),
        )
    }
    return params, vq


def convert_discriminator_state_dict(
    sd: Dict[str, np.ndarray], *, n_layers: int = 3
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference BaselineDiscriminator state dict → (params,
    batch_stats).  main indices (discriminator/baseline.py:41-84):
    conv, lrelu, then per 1..n_layers-1 [conv, bn, lrelu], then
    [conv, bn, lrelu], final conv."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def conv(prefix, name):
        entry = {"kernel": _conv_w(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            entry["bias"] = sd[f"{prefix}.bias"]
        params[name] = entry

    def bn(prefix, name):
        params[name] = {
            "scale": sd[f"{prefix}.weight"],
            "bias": sd[f"{prefix}.bias"],
        }
        batch_stats[name] = {
            "mean": sd[f"{prefix}.running_mean"],
            "var": sd[f"{prefix}.running_var"],
        }

    conv("main.0", "conv_0")
    idx = 2
    for n in range(1, n_layers):
        conv(f"main.{idx}", f"conv_{n}")
        bn(f"main.{idx + 1}", f"norm_{n}")
        idx += 3
    conv(f"main.{idx}", f"conv_{n_layers}")
    bn(f"main.{idx + 1}", f"norm_{n_layers}")
    idx += 3
    conv(f"main.{idx}", "conv_out")
    return params, batch_stats


def main():
    if len(sys.argv) < 4:
        raise SystemExit(
            "usage: convert_checkpoint.py {vqvae|discriminator} in.pt out.npz "
            "[--n_levels=N --n_res_layers=M]"
        )
    kind, src, dst = sys.argv[1:4]
    kwargs = {}
    for tok in sys.argv[4:]:
        if tok.startswith("--"):
            k, v = tok[2:].split("=")
            kwargs[k] = int(v) if v.isdigit() else v
    sd = load_torch_state_dict(src)
    if kind == "vqvae":
        params, vq = convert_vqvae_state_dict(
            sd,
            n_levels=int(kwargs.get("n_levels", 3)),
            n_res_layers=int(kwargs.get("n_res_layers", 3)),
            use_subpixel_conv=bool(kwargs.get("use_subpixel_conv", False)),
        )
        flat = {}
        import jax

        for path, leaf in jax.tree_util.tree_flatten_with_path(
            {"params": params, "vq": vq}
        )[0]:
            key = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
            flat[key] = np.asarray(leaf)
        np.savez(dst, **flat)
    elif kind == "discriminator":
        params, bs = convert_discriminator_state_dict(sd)
        flat = {}
        import jax

        for path, leaf in jax.tree_util.tree_flatten_with_path(
            {"params": params, "batch_stats": bs}
        )[0]:
            key = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
            flat[key] = np.asarray(leaf)
        np.savez(dst, **flat)
    else:
        raise SystemExit(f"unknown kind {kind}")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()

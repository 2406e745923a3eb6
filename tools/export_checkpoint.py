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

__all__ = [
    "export_vqvae_state_dict",
    "export_discriminator_state_dict",
    "export_performer_state_dict",
]


def _conv_w_inv(w: np.ndarray) -> np.ndarray:
    """DHWIO → torch Conv3d (O, I, D, H, W)."""
    return np.transpose(np.asarray(w), (4, 3, 0, 1, 2))


def _convT_w_inv(w: np.ndarray) -> np.ndarray:
    """DHWIO (forward orientation) → torch ConvTranspose3d (I, O, D, H, W)."""
    return np.transpose(np.asarray(w), (3, 4, 0, 1, 2))


def export_vqvae_state_dict(
    params: Dict[str, Any],
    vq: Dict[str, Any],
    *,
    n_levels: int,
    n_res_layers: int,
    use_subpixel_conv: bool = False,
) -> Dict[str, np.ndarray]:
    """(params, vq variables) → reference BaselineVQVAE state dict."""
    sd: Dict[str, np.ndarray] = {}

    def put_conv(prefix: str, entry: Dict[str, np.ndarray], transposed=False):
        sd[f"{prefix}.weight"] = (
            _convT_w_inv(entry["kernel"]) if transposed
            else _conv_w_inv(entry["kernel"])
        )
        if "bias" in entry:
            sd[f"{prefix}.bias"] = np.asarray(entry["bias"])

    def put_res(prefix: str, entry: Dict[str, Any]):
        put_conv(f"{prefix}.0", entry["TorchConv3d_0"])
        put_conv(f"{prefix}.3", entry["TorchConv3d_1"])

    for i in range(n_levels):
        put_conv(f"encoder.0.{3 * i}", params[f"encoder_conv_{i}"])
        for j in range(n_res_layers):
            put_res(f"encoder.0.{3 * i + 2}.{j}", params[f"encoder_res_{i}_{j}"])
    put_conv(f"encoder.0.{3 * n_levels}", params["encoder_out_conv"])

    put_conv("decoder.0.0", params["decoder_in_conv"])
    for i in range(n_levels):
        base = 1 + 3 * i
        for j in range(n_res_layers):
            put_res(f"decoder.0.{base}.{j}", params[f"decoder_res_{i}_{j}"])
        up_idx = base + 1
        last = i == n_levels - 1
        if last and use_subpixel_conv:
            sp = params["decoder_subpixel"]
            sd[f"decoder.0.{up_idx}.conv_block.weight"] = _conv_w_inv(sp["kernel"])
            sd[f"decoder.0.{up_idx}.conv_block.bias"] = np.asarray(sp["bias"])
        else:
            put_conv(
                f"decoder.0.{up_idx}", params[f"decoder_up_{i}"], transposed=True
            )

    state = vq["level_0"]
    sd["quantizer.0.impl.embedding.weight"] = np.asarray(state.codebook, np.float32)
    sd["quantizer.0.impl.N"] = np.asarray(state.cluster_size, np.float32)
    sd["quantizer.0.impl.embed_avg"] = np.asarray(state.embed_avg, np.float32)
    return sd


def export_discriminator_state_dict(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    *,
    n_layers: int = 3,
) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}

    def put_conv(prefix: str, name: str):
        entry = params[name]
        sd[f"{prefix}.weight"] = _conv_w_inv(entry["kernel"])
        if "bias" in entry:
            sd[f"{prefix}.bias"] = np.asarray(entry["bias"])

    def put_bn(prefix: str, name: str):
        sd[f"{prefix}.weight"] = np.asarray(params[name]["scale"])
        sd[f"{prefix}.bias"] = np.asarray(params[name]["bias"])
        sd[f"{prefix}.running_mean"] = np.asarray(batch_stats[name]["mean"])
        sd[f"{prefix}.running_var"] = np.asarray(batch_stats[name]["var"])

    put_conv("main.0", "conv_0")
    idx = 2
    for n in range(1, n_layers):
        put_conv(f"main.{idx}", f"conv_{n}")
        put_bn(f"main.{idx + 1}", f"norm_{n}")
        idx += 3
    put_conv(f"main.{idx}", f"conv_{n_layers}")
    put_bn(f"main.{idx + 1}", f"norm_{n_layers}")
    idx += 3
    put_conv(f"main.{idx}", "conv_out")
    return sd


def export_performer_state_dict(
    params: Dict[str, Any],
    *,
    depth: int,
    favor: Dict[str, Any] = None,
) -> Dict[str, np.ndarray]:
    """Performer flax params → performer-pytorch-style state dict with
    the reference wrapper nesting (pre-LayerNorm: ``.0.fn.norm`` +
    ``.0.fn.fn.`` attention, ``.1.fn.fn.fn.`` Chunk-wrapped FF) — the
    inverse of ``convert_performer_checkpoint.py``.

    ReZero blocks (the PAPER config and the released checkpoints'
    form, reference README.md:140) export with the wrapper's ``g``
    gain in place of the pre-norm keys at the same nesting position
    (``.0.fn.g`` / ``.1.fn.g``); ScaleNorm raises."""
    sd: Dict[str, np.ndarray] = {}

    def lin(prefix: str, entry: Dict[str, np.ndarray]):
        sd[f"{prefix}.weight"] = np.transpose(np.asarray(entry["kernel"]))
        if "bias" in entry:
            sd[f"{prefix}.bias"] = np.asarray(entry["bias"])

    sd["token_emb.weight"] = np.asarray(params["token_emb"]["embedding"])
    if "abs_pos_emb" in params:
        sd["pos_emb.emb.weight"] = np.asarray(params["abs_pos_emb"]["embedding"])
    for k in sorted(params):
        import re as _re

        m = _re.match(r"spatial_emb_(\d+)$", k)
        if m:
            sd[f"spatial_position_emb.{m.group(1)}.emb.weight"] = np.asarray(
                params[k]["embedding"]
            )
        m = _re.match(r"conditioning_emb_(\d+)$", k)
        if m:
            sd[f"conditioning_emb.{m.group(1)}.weight"] = np.asarray(
                params[k]["embedding"]
            )

    for L in range(depth):
        blk = params[f"block_{L}"]
        rezero = "g_attn" in blk
        if not rezero and "norm_attn" not in blk:
            raise NotImplementedError(
                "export supports pre-LayerNorm and ReZero blocks only "
                "(ScaleNorm has no reference-checkpoint form)"
            )
        p = f"performer.net.layers.{L}"
        if rezero:
            sd[f"{p}.0.fn.g"] = np.asarray(blk["g_attn"]).reshape(())
        else:
            sd[f"{p}.0.fn.norm.weight"] = np.asarray(blk["norm_attn"]["scale"])
            sd[f"{p}.0.fn.norm.bias"] = np.asarray(blk["norm_attn"]["bias"])
        for name in ("to_q", "to_k", "to_v", "to_out"):
            lin(f"{p}.0.fn.fn.{name}", blk["attn"][name])
        if favor and f"block_{L}" in favor:
            # FAVOR random-feature projection buffer — performer-pytorch
            # registers it persistently, so a strict reference load
            # expects it (same (m, dh) orientation both sides)
            sd[f"{p}.0.fn.fn.fast_attention.projection_matrix"] = np.asarray(
                favor[f"block_{L}"]["attn"]["projection"]
            )
        if rezero:
            sd[f"{p}.1.fn.g"] = np.asarray(blk["g_ff"]).reshape(())
        else:
            sd[f"{p}.1.fn.norm.weight"] = np.asarray(blk["norm_ff"]["scale"])
            sd[f"{p}.1.fn.norm.bias"] = np.asarray(blk["norm_ff"]["bias"])
        lin(f"{p}.1.fn.fn.fn.w1", blk["ff"]["w1"])
        lin(f"{p}.1.fn.fn.fn.w2", blk["ff"]["w2"])

    sd["norm.weight"] = np.asarray(params["final_norm"]["scale"])
    sd["norm.bias"] = np.asarray(params["final_norm"]["bias"])
    if "to_out" in params:
        lin("to_out", params["to_out"])
    return sd


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

"""Reference-checkpoint interop: export trained parameters back to the
reference's torch state-dict layouts.

These are the library halves of ``tools/export_checkpoint.py`` (the CLI
wrapper), moved into the package so the training runners can emit the
reference's end-of-training raw artifact
``model_state_dict_epoch={N}.pt`` (reference run_vqvae.py:389-392 and
run_transformer.py:290-292) without depending on the repo-root
``tools`` path.

Layout contracts (the exact inverse of ``tools/convert_checkpoint.py``):

- DHWIO conv kernels      → torch Conv3d (O, I, D, H, W)
- DHWIO forward-oriented  → torch ConvTranspose3d (I, O, D, H, W)
- VQState(codebook, cluster_size, embed_avg) → ``impl.embedding.weight``
  / ``impl.N`` / ``impl.embed_avg`` (the reference reads only those
  three buffers)
- BatchNorm scale/bias + batch_stats → weight/bias/running stats
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

__all__ = [
    "export_vqvae_state_dict",
    "export_discriminator_state_dict",
    "export_performer_state_dict",
    "save_raw_state_dict",
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
    """(params, vq variables) → reference BaselineVQVAE state dict
    (module naming of reference src/networks/vqvae/baseline.py:213-299).
    """
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
    if not hasattr(state, "codebook"):  # raw dict form (orbax restore)
        from synthanatomy_tpu.ops.vq import VQState

        state = VQState(
            codebook=state["codebook"],
            cluster_size=state["cluster_size"],
            embed_avg=state["embed_avg"],
        )
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
    """(params, batch_stats) → reference BaselineDiscriminator state
    dict (src/networks/discriminator/baseline.py:41-84)."""
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
        m = re.match(r"spatial_emb_(\d+)$", k)
        if m:
            sd[f"spatial_position_emb.{m.group(1)}.emb.weight"] = np.asarray(
                params[k]["embedding"]
            )
        m = re.match(r"conditioning_emb_(\d+)$", k)
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


def save_raw_state_dict(path: str, sd: Dict[str, np.ndarray]) -> str:
    """Write the reference's one-file release artifact.

    With torch available (it is in this environment; the artifact is a
    torch state dict the reference codebase `torch.load`s directly),
    writes ``{path}.pt``; otherwise falls back to ``{path}.npz`` with
    identical keys so the artifact is never silently skipped."""
    try:
        import torch

        out = f"{path}.pt"
        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
             for k, v in sd.items()},
            out,
        )
    except ImportError:
        out = f"{path}.npz"
        np.savez(out, **{k: np.asarray(v) for k, v in sd.items()})
    return out

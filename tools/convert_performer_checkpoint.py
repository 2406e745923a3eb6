#!/usr/bin/env python
"""Convert released transformer checkpoints (reference README.md:20-27,
``performer-pytorch`` 1.0.11 state dicts wrapped by the reference
Performer, src/networks/transformers/performer.py:70-288) into
synthanatomy_tpu Performer parameter trees.

Key mapping is suffix-regex based so it is robust to the consumed
package's wrapper nesting (PreLayerNorm / PreScaleNorm / ReZero /
Chunk insert ``.fn`` levels):

  token_emb.weight                         → token_emb.embedding
  pos_emb.emb.weight                       → abs_pos_emb.embedding
  spatial_position_emb.{i}.emb.weight      → spatial_emb_{i}.embedding
  conditioning_emb.{i}.weight              → conditioning_emb_{i}.embedding
  ...layers.{L}.0...to_{q,k,v,out}.weight  → block_{L}.attn.to_*  (ᵀ)
  ...layers.{L}.0...norm.{weight,bias}     → block_{L}.norm_attn
  ...layers.{L}.0...g (ReZero)             → block_{L}.g_attn
  ...layers.{L}.1...w1/w2.{weight,bias}    → block_{L}.ff.w1/w2  (ᵀ)
  ...layers.{L}.1...norm.{weight,bias}     → block_{L}.norm_ff
  norm.{weight,bias} (final)               → final_norm
  to_out.{weight,bias} (head)              → to_out  (ᵀ)

Linears transpose (out, in) → (in, out).
"""

from __future__ import annotations

import re
import sys
from typing import Any, Dict

import numpy as np

__all__ = ["convert_performer_state_dict", "convert_performer_favor"]

_LAYER_RE = re.compile(r"\blayers\.(\d+)\.(\d)\.")


def convert_performer_favor(
    sd: Dict[str, np.ndarray], *, depth: int
) -> Dict[str, Any]:
    """Extract the per-layer FAVOR+ random-feature projection buffers
    (``...layers.{L}.0...projection_matrix``, registered torch buffers
    saved with the checkpoint) into this framework's mutable "favor"
    collection ``{block_L: {attn: {projection: (m, dh)}}}``.

    Teacher-forced logit parity with a released checkpoint needs the
    SAME projections on both sides — redraw-at-load would only match in
    distribution.  Returns {} when the checkpoint carries none (e.g.
    ``no_projection`` configs)."""
    favor: Dict[str, Any] = {}
    for key, v in sd.items():
        if not key.endswith("projection_matrix"):
            continue
        lm = _LAYER_RE.search(key)
        if lm is None or int(lm.group(2)) != 0:
            continue
        favor[f"block_{lm.group(1)}"] = {
            "attn": {"projection": np.asarray(v)}
        }
    return favor


def convert_performer_state_dict(
    sd: Dict[str, np.ndarray], *, depth: int
) -> Dict[str, Any]:
    params: Dict[str, Any] = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def linear_w(v):
        return np.transpose(np.asarray(v))  # (out,in) → (in,out)

    for key, v in sd.items():
        if key.endswith("token_emb.weight"):
            put(("token_emb", "embedding"), v)
            continue
        if re.search(r"\bpos_emb\.emb\.weight$", key):
            put(("abs_pos_emb", "embedding"), v)
            continue
        m = re.search(r"spatial_position_emb\.(\d+)\.emb\.weight$", key)
        if m:
            put((f"spatial_emb_{m.group(1)}", "embedding"), v)
            continue
        m = re.search(r"conditioning_emb\.(\d+)\.weight$", key)
        if m:
            put((f"conditioning_emb_{m.group(1)}", "embedding"), v)
            continue

        lm = _LAYER_RE.search(key)
        if lm:
            layer, slot = int(lm.group(1)), int(lm.group(2))
            block = f"block_{layer}"
            if slot == 0:  # attention sub-block
                m = re.search(r"to_(q|k|v|out)\.(weight|bias)$", key)
                if m:
                    name, kind = f"to_{m.group(1)}", m.group(2)
                    put(
                        (block, "attn", name, "kernel" if kind == "weight" else "bias"),
                        linear_w(v) if kind == "weight" else v,
                    )
                    continue
                m = re.search(r"norm\.(weight|bias)$", key)
                if m:
                    put(
                        (block, "norm_attn", "scale" if m.group(1) == "weight" else "bias"),
                        v,
                    )
                    continue
                if key.endswith(".g"):  # ReZero / ScaleNorm gain
                    put((block, "g_attn"), np.reshape(v, (1,)))
                    continue
            else:  # feed-forward sub-block
                m = re.search(r"(w1|w2)\.(weight|bias)$", key)
                if m:
                    put(
                        (block, "ff", m.group(1), "kernel" if m.group(2) == "weight" else "bias"),
                        linear_w(v) if m.group(2) == "weight" else v,
                    )
                    continue
                m = re.search(r"norm\.(weight|bias)$", key)
                if m:
                    put(
                        (block, "norm_ff", "scale" if m.group(1) == "weight" else "bias"),
                        v,
                    )
                    continue
                if key.endswith(".g"):
                    put((block, "g_ff"), np.reshape(v, (1,)))
                    continue
            continue

        if re.search(r"(^|\.)norm\.weight$", key):
            put(("final_norm", "scale"), v)
            continue
        if re.search(r"(^|\.)norm\.bias$", key):
            put(("final_norm", "bias"), v)
            continue
        if re.search(r"(^|\.)to_out\.weight$", key):
            put(("to_out", "kernel"), linear_w(v))
            continue
        if re.search(r"(^|\.)to_out\.bias$", key):
            put(("to_out", "bias"), v)
            continue
    return params


def main():
    if len(sys.argv) < 4:
        raise SystemExit(
            "usage: convert_performer_checkpoint.py in.pt out.npz --depth=N"
        )
    src, dst = sys.argv[1:3]
    depth = 24
    for tok in sys.argv[3:]:
        if tok.startswith("--depth="):
            depth = int(tok.split("=")[1])
    from tools.convert_checkpoint import load_torch_state_dict

    sd = load_torch_state_dict(src)
    tree = {
        "params": convert_performer_state_dict(sd, depth=depth),
        "favor": convert_performer_favor(sd, depth=depth),
    }
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        flat[key] = np.asarray(leaf)
    np.savez(dst, **flat)
    print(f"wrote {dst} ({len(flat)} arrays)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Turn converted reference weights (.npz from convert_checkpoint.py /
convert_performer_checkpoint.py) into a RUNNABLE experiment checkpoint.

The reference ships its released models as ``checkpoint_epoch=0.pt``
inside an experiment tree (reference README.md:28); the converters
produce flat ``.npz`` weight files.  This tool closes the last mile:
it builds the runner's exact restore target (the same
``create_*_train_state`` the CLIs use), overwrites the network leaves
from the npz, and writes ``checkpoint_epoch=0`` with the naming
contract — after which the normal CLIs drive the model:

  # stage 1 weights
  python tools/convert_checkpoint.py vqvae vqvae_ukb.pt /tmp/v.npz \
      --n_levels=4 --n_res_layers=3
  python tools/import_checkpoint.py vqvae /tmp/v.npz \
      --project_directory=/exp --experiment_name=ukb \
      --no_levels=4 --no_channels=256 --num_embeddings='(2048,)' \
      --embedding_dim='(32,)' --input_size='(160,224,160)'
  python run_vqvae.py run --mode=extracting --project_directory=/exp \
      --experiment_name=ukb --evaluation_checkpoint=recent ...

  # stage 2 weights
  python tools/convert_performer_checkpoint.py perf_ukb_young.pt /tmp/t.npz
  python tools/import_checkpoint.py performer /tmp/t.npz \
      --project_directory=/exp --experiment_name=ukb \
      --vocab_size=2048 --n_embd=512 --n_layers=24 --n_head=16 \
      --local_attn_heads=8 --local_window_size=420 \
      --latent_shape='(10,14,10)'
  python run_transformer.py run --mode=inference ... (same flags)

The performer's block/embedding form (ReZero, learned spatial tables,
conditioning vocab sizes, nb_features) is detected from the npz itself
so the flags only need the shape/topology.
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_flat(npz_path: str) -> Dict[str, np.ndarray]:
    with np.load(npz_path) as z:
        return {k: np.asarray(z[k]) for k in z.files}


def _override_leaves(label: str, tree: Any, flat: Dict[str, np.ndarray]):
    """Replace every leaf of ``tree`` whose ``label/path`` exists in the
    flat npz map; returns (new_tree, n_replaced)."""
    import jax

    n = [0]

    def _one(path, leaf):
        key = label + "/" + "/".join(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path
        )
        if key in flat:
            n[0] += 1
            v = flat[key]
            if v.shape != tuple(np.shape(leaf)):
                raise SystemExit(
                    f"{key}: npz shape {v.shape} != model shape "
                    f"{np.shape(leaf)} — check the topology flags"
                )
            return np.asarray(v, np.asarray(leaf).dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(_one, tree), n[0]


def import_vqvae(src: str, **flags) -> str:
    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side import only
    from synthanatomy_tpu.config import VQVAEConfig
    from synthanatomy_tpu.runners.vqvae import build_vqvae
    from synthanatomy_tpu.train import checkpoints as C
    from synthanatomy_tpu.train.vqvae_steps import create_vqvae_train_state

    project = flags.pop("project_directory")
    name = flags.pop("experiment_name")
    input_size = tuple(flags.pop("input_size", (160, 224, 160)))
    cfg_kwargs = {
        k: v for k, v in flags.items() if k in VQVAEConfig.__dataclass_fields__
    }
    cfg = VQVAEConfig(
        mode="decoding", adversarial_component=False, **cfg_kwargs
    )
    model = build_vqvae(cfg)
    state, _, _ = create_vqvae_train_state(model, jax.random.key(0), input_size)

    flat = _load_flat(src)
    g_params, n_p = _override_leaves("params", state.g_params, flat)
    vq, n_v = _override_leaves("vq", state.vq, flat)
    used = n_p + n_v
    if used != len(flat):
        raise SystemExit(
            f"npz has {len(flat)} arrays but only {used} matched the "
            "model tree — check the topology flags"
        )
    state = state.replace(g_params=g_params, vq=vq)

    ckdir = os.path.join(project, name, cfg.network, "checkpoints")
    os.makedirs(ckdir, exist_ok=True)
    path = C.save_checkpoint(ckdir, state, 0)
    print(f"wrote {path} ({used} arrays)")
    return path


def import_performer(src: str, **flags) -> str:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from synthanatomy_tpu.config import TransformerConfig
    from synthanatomy_tpu.runners.transformer import (
        build_ordering,
        build_performer,
    )
    from synthanatomy_tpu.train import checkpoints as C
    from synthanatomy_tpu.train.transformer_steps import (
        create_transformer_train_state,
    )

    project = flags.pop("project_directory")
    name = flags.pop("experiment_name")
    latent_shape = tuple(flags.pop("latent_shape", (10, 14, 10)))

    flat = _load_flat(src)
    # detect the block/embedding form from the converted weights
    use_rezero = any(k.endswith("/g_attn") for k in flat)
    n_spatial = sum(
        1 for k in flat if k.startswith("params/spatial_emb_")
    )
    cond_sizes = {}
    for k, v in flat.items():
        if k.startswith("params/conditioning_emb_"):
            idx = int(k.split("conditioning_emb_")[1].split("/")[0])
            cond_sizes[idx] = int(v.shape[0])
    nb_features = None
    for k, v in flat.items():
        if k.startswith("favor/") and k.endswith("/projection"):
            nb_features = int(v.shape[0])
            break

    cfg_kwargs = {
        k: v
        for k, v in flags.items()
        if k in TransformerConfig.__dataclass_fields__
    }
    cfg_kwargs.setdefault("use_rezero", use_rezero)
    if n_spatial and "spatial_position_emb" not in cfg_kwargs:
        cfg_kwargs["spatial_position_emb"] = "absolute"
    if cond_sizes and "conditioning_num_tokens" not in cfg_kwargs:
        cfg_kwargs["conditioning_num_tokens"] = tuple(
            cond_sizes[i] for i in sorted(cond_sizes)
        )
    if nb_features is not None:
        cfg_kwargs.setdefault("nb_features", nb_features)
    cfg = TransformerConfig(mode="inference", **cfg_kwargs)

    ordering = build_ordering(cfg, latent_shape)
    model = build_performer(cfg, ordering, latent_shape)
    seq_len = int(np.prod(latent_shape))
    conds0 = (
        [jnp.zeros((1,), jnp.int32) for _ in cfg.conditioning_num_tokens]
        if cfg.conditioning_num_tokens
        else None
    )
    state, _ = create_transformer_train_state(
        model, jax.random.key(0), seq_len, conditionings=conds0
    )

    params, n_p = _override_leaves("params", state.params, flat)
    favor, n_f = _override_leaves("favor", state.favor, flat)
    used = n_p + n_f
    if used != len(flat):
        raise SystemExit(
            f"npz has {len(flat)} arrays but only {used} matched the "
            "model tree — check the topology flags"
        )
    state = state.replace(params=params, favor=favor)

    ckdir = os.path.join(project, name, "performer", "checkpoints")
    os.makedirs(ckdir, exist_ok=True)
    path = C.save_checkpoint(ckdir, state, 0)
    print(f"wrote {path} ({used} arrays; "
          f"rezero={use_rezero} spatial={n_spatial} "
          f"cond={tuple(cond_sizes[i] for i in sorted(cond_sizes))} "
          f"nb_features={nb_features})")
    return path


def main():
    if len(sys.argv) < 3:
        raise SystemExit(
            "usage: import_checkpoint.py {vqvae|performer} in.npz "
            "--project_directory=... --experiment_name=... [topology flags]"
        )
    kind, src = sys.argv[1:3]
    from synthanatomy_tpu.cli import parse_value

    flags = {}
    for tok in sys.argv[3:]:
        if not tok.startswith("--"):
            raise SystemExit(f"unknown argument {tok!r}")
        k, _, v = tok[2:].partition("=")
        flags[k] = parse_value(v) if v else True
    if "project_directory" not in flags or "experiment_name" not in flags:
        raise SystemExit("--project_directory and --experiment_name required")
    if kind == "vqvae":
        import_vqvae(src, **flags)
    elif kind == "performer":
        import_performer(src, **flags)
    else:
        raise SystemExit(f"unknown kind {kind!r}")


if __name__ == "__main__":
    main()

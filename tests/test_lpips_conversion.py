import numpy as np
import pytest

import jax

from synthanatomy_tpu.losses.lpips import (
    init_lpips_params,
    load_lpips_npz,
    lpips_distance,
)
from tools.convert_lpips import convert_lpips

torch = pytest.importorskip("torch")


def _alex_backbone_sd(rng):
    specs = {  # torchvision alexnet features indices
        0: (64, 3, 11), 3: (192, 64, 5), 6: (384, 192, 3),
        8: (256, 384, 3), 10: (256, 256, 3),
    }
    sd = {}
    for idx, (o, i, k) in specs.items():
        sd[f"features.{idx}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.05
        sd[f"features.{idx}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.01
    return sd


def _lin_sd(rng, chans):
    return {
        f"lin{i}.model.1.weight": np.abs(
            rng.normal(size=(1, c, 1, 1)).astype(np.float32)
        )
        for i, c in enumerate(chans)
    }


def test_alex_conversion_structure_and_run(tmp_path):
    rng = np.random.default_rng(0)
    flat = convert_lpips("alex", _alex_backbone_sd(rng), _lin_sd(rng, (64, 192, 384, 256, 256)))
    p = str(tmp_path / "alex.npz")
    np.savez(p, **flat)
    params = load_lpips_npz(p)

    # structure must match the random-init tree (so drop-in weights work)
    ref = init_lpips_params(jax.random.key(0), "alex")

    def paths(tree, prefix=""):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, prefix + k + "/")
            else:
                out.add(prefix + k + ":" + str(np.shape(v)))
        return out

    assert params.kind == ref.kind == "alex"
    assert paths({"net": params.net, "lin": params.lin}) == paths(
        {"net": ref.net, "lin": ref.lin}
    )

    x = np.random.default_rng(1).uniform(size=(2, 64, 64, 1)).astype(np.float32)
    d = lpips_distance(params, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    y = np.clip(x + 0.2, 0, 1)
    assert (np.asarray(lpips_distance(params, x, y)) > 0).all()


def test_squeeze_conversion_structure(tmp_path):
    rng = np.random.default_rng(2)
    sd = {"features.0.weight": rng.normal(size=(64, 3, 3, 3)).astype(np.float32),
          "features.0.bias": np.zeros(64, np.float32)}
    fire_specs = [  # (torchvision idx, cin, squeeze, expand)
        (3, 64, 16, 64), (4, 128, 16, 64), (6, 128, 32, 128), (7, 256, 32, 128),
        (9, 256, 48, 192), (10, 384, 48, 192), (11, 384, 64, 256), (12, 512, 64, 256),
    ]
    for fi, cin, sq, ex in fire_specs:
        sd[f"features.{fi}.squeeze.weight"] = rng.normal(size=(sq, cin, 1, 1)).astype(np.float32)
        sd[f"features.{fi}.squeeze.bias"] = np.zeros(sq, np.float32)
        sd[f"features.{fi}.expand1x1.weight"] = rng.normal(size=(ex, sq, 1, 1)).astype(np.float32)
        sd[f"features.{fi}.expand1x1.bias"] = np.zeros(ex, np.float32)
        sd[f"features.{fi}.expand3x3.weight"] = rng.normal(size=(ex, sq, 3, 3)).astype(np.float32)
        sd[f"features.{fi}.expand3x3.bias"] = np.zeros(ex, np.float32)
    flat = convert_lpips(
        "squeeze", sd, _lin_sd(rng, (64, 128, 256, 384, 384, 512, 512))
    )
    p = str(tmp_path / "squeeze.npz")
    np.savez(p, **flat)
    params = load_lpips_npz(p)
    x = np.random.default_rng(3).uniform(size=(1, 64, 64, 3)).astype(np.float32)
    d = lpips_distance(params, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_lpips_weights_flag_wired_through_runner(tmp_path):
    """--lpips_weights must be loaded by the training runner (and a
    net-kind mismatch must raise) — the wiring the paper-default
    jukebox_perceptual loss depends on for exact LPIPS behaviour."""
    import logging

    from synthanatomy_tpu.config import VQVAEConfig
    from synthanatomy_tpu.runners.vqvae import resolve_lpips_params

    logger = logging.getLogger("test-lpips")
    rng = np.random.default_rng(0)
    flat = convert_lpips(
        "alex", _alex_backbone_sd(rng), _lin_sd(rng, (64, 192, 384, 256, 256))
    )
    p = str(tmp_path / "alex.npz")
    np.savez(p, **flat)

    cfg = VQVAEConfig(loss="jukebox_perceptual", lpips_weights=p)
    params = resolve_lpips_params(cfg, logger)
    assert params.kind == "alex"
    # and the loaded weights really are the converted ones
    expect = flat["lin/lin0/w"]
    np.testing.assert_array_equal(np.asarray(params.lin["lin0"]["w"]), expect)

    # net-kind mismatch: baseline loss needs squeeze, weights are alex
    with pytest.raises(ValueError, match="lpips_weights"):
        resolve_lpips_params(
            VQVAEConfig(loss="baseline", lpips_weights=p), logger
        )

    # no weights → random fallback, still a valid params pytree
    params_rand = resolve_lpips_params(
        VQVAEConfig(loss="jukebox_perceptual"), logger
    )
    assert params_rand.kind == "alex"

    # mse needs no LPIPS at all
    assert resolve_lpips_params(VQVAEConfig(loss="mse"), logger) is None

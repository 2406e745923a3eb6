"""First-party JAX LPIPS (Learned Perceptual Image Patch Similarity).

The reference consumes the ``lpips`` pip package with pretrained
AlexNet ('alex', perceptual losses, reference src/losses/vqvae/
vqvae.py:836-869) and SqueezeNet ('squeeze', BaselineLoss,
vqvae.py:1656) backbones.  This module re-implements both feature
extractors and the LPIPS linear heads as pure JAX functions over an
explicit parameter pytree:

- ``init_lpips_params(key, net)`` builds a deterministic parameter
  pytree.  Without pretrained weights (this environment has no network
  egress and no cached torchvision/lpips checkpoints) the features are
  *fixed random* — random-projection perceptual metrics are a known
  usable fallback, and the structure is weight-compatible:
- ``load_lpips_npz(path)`` loads real weights from an ``.npz`` whose
  keys follow this module's parameter tree (a converter from the pip
  package's state dict is provided in ``tools/convert_lpips.py``), so
  dropping the official weights in restores exact LPIPS behaviour.

Everything is NHWC and bf16-friendly (features in compute dtype,
normalization/aggregation in fp32).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "LPIPSParams",
    "init_lpips_params",
    "load_lpips_npz",
    "lpips_distance",
    "ALEX_CHANNELS",
    "SQUEEZE_CHANNELS",
]


class LPIPSParams(struct.PyTreeNode):
    """LPIPS parameter pytree; ``kind`` is static metadata (not a
    leaf) so the whole object passes through ``jax.jit`` arguments."""

    net: Any
    lin: Any
    kind: str = struct.field(pytree_node=False, default="alex")

# per-tap feature channel counts
ALEX_CHANNELS = (64, 192, 384, 256, 256)
SQUEEZE_CHANNELS = (64, 128, 256, 384, 384, 512, 512)

# lpips ScalingLayer constants (package lpips/lpips.py)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv_init(key, kh, kw, cin, cout):
    # torch Conv2d default: kaiming_uniform(a=√5) ≡ U(±√(1/fan_in))
    fan_in = kh * kw * cin
    bound = float(np.sqrt(1.0 / fan_in))
    wk, bk = jax.random.split(key)
    w = jax.random.uniform(wk, (kh, kw, cin, cout), jnp.float32, -bound, bound)
    b = jax.random.uniform(bk, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_lpips_params(key: jax.Array, net: str = "alex") -> "LPIPSParams":
    """Build the LPIPS parameter pytree for ``net`` ∈ {'alex','squeeze'}."""
    keys = iter(jax.random.split(key, 64))
    params: Dict[str, Any] = {"net": {}, "lin": {}}
    if net == "alex":
        specs = [
            ("conv1", 11, 3, 64),
            ("conv2", 5, 64, 192),
            ("conv3", 3, 192, 384),
            ("conv4", 3, 384, 256),
            ("conv5", 3, 256, 256),
        ]
        for name, k, cin, cout in specs:
            params["net"][name] = _conv_init(next(keys), k, k, cin, cout)
        chans = ALEX_CHANNELS
    elif net == "squeeze":
        params["net"]["conv1"] = _conv_init(next(keys), 3, 3, 3, 64)
        fire_specs = [
            # name, cin, squeeze, expand
            ("fire1", 64, 16, 64),
            ("fire2", 128, 16, 64),
            ("fire3", 128, 32, 128),
            ("fire4", 256, 32, 128),
            ("fire5", 256, 48, 192),
            ("fire6", 384, 48, 192),
            ("fire7", 384, 64, 256),
            ("fire8", 512, 64, 256),
        ]
        for name, cin, sq, ex in fire_specs:
            params["net"][name] = {
                "squeeze": _conv_init(next(keys), 1, 1, cin, sq),
                "expand1": _conv_init(next(keys), 1, 1, sq, ex),
                "expand3": _conv_init(next(keys), 3, 3, sq, ex),
            }
        chans = SQUEEZE_CHANNELS
    else:
        raise ValueError(f"unknown lpips net {net!r}")

    for i, c in enumerate(chans):
        # LPIPS lin heads: 1×1 conv, no bias, non-negative in the
        # shipped weights; random-|U| here
        w = jnp.abs(
            jax.random.uniform(next(keys), (1, 1, c, 1), jnp.float32, -0.1, 0.1)
        )
        params["lin"][f"lin{i}"] = {"w": w}
    return LPIPSParams(net=params["net"], lin=params["lin"], kind=net)


def load_lpips_npz(path: str) -> "LPIPSParams":
    """Load parameters saved as flat 'a/b/c' keys in an npz."""
    flat = dict(np.load(path))
    params: Dict[str, Any] = {}
    kind = "alex"
    for k, v in flat.items():
        if k == "kind":
            kind = str(v)
            continue
        node = params
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return LPIPSParams(net=params["net"], lin=params["lin"], kind=kind)


def _conv2d(x, p, *, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x,
        -jnp.inf if x.dtype == jnp.float32 else jnp.finfo(x.dtype).min,
        jax.lax.max,
        (1, k, k, 1),
        (1, s, s, 1),
        "VALID",
    )


def _alex_features(params, x) -> List[jax.Array]:
    taps = []
    h = jax.nn.relu(_conv2d(x, params["conv1"], stride=4, padding=2))
    taps.append(h)
    h = _maxpool(h)
    h = jax.nn.relu(_conv2d(h, params["conv2"], padding=2))
    taps.append(h)
    h = _maxpool(h)
    h = jax.nn.relu(_conv2d(h, params["conv3"], padding=1))
    taps.append(h)
    h = jax.nn.relu(_conv2d(h, params["conv4"], padding=1))
    taps.append(h)
    h = jax.nn.relu(_conv2d(h, params["conv5"], padding=1))
    taps.append(h)
    return taps


def _fire(p, x):
    s = jax.nn.relu(_conv2d(x, p["squeeze"]))
    e1 = jax.nn.relu(_conv2d(s, p["expand1"]))
    e3 = jax.nn.relu(_conv2d(s, p["expand3"], padding=1))
    return jnp.concatenate([e1, e3], axis=-1)


def _squeeze_features(params, x) -> List[jax.Array]:
    taps = []
    h = jax.nn.relu(_conv2d(x, params["conv1"], stride=2))
    taps.append(h)  # 64
    h = _maxpool(h)
    h = _fire(params["fire1"], h)
    h = _fire(params["fire2"], h)
    taps.append(h)  # 128
    h = _maxpool(h)
    h = _fire(params["fire3"], h)
    h = _fire(params["fire4"], h)
    taps.append(h)  # 256
    h = _maxpool(h)
    h = _fire(params["fire5"], h)
    taps.append(h)  # 384
    h = _fire(params["fire6"], h)
    taps.append(h)  # 384
    h = _fire(params["fire7"], h)
    taps.append(h)  # 512
    h = _fire(params["fire8"], h)
    taps.append(h)  # 512
    return taps


def _normalize_tensor(feat, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(feat.astype(jnp.float32)), axis=-1, keepdims=True))
    return feat.astype(jnp.float32) / (norm + eps)


def lpips_distance(
    params: Dict[str, Any],
    x: jax.Array,
    y: jax.Array,
    *,
    normalize: bool = True,
) -> jax.Array:
    """LPIPS distance per batch element.

    x, y: (N, H, W, C) with C ∈ {1, 3}; values in [0,1] when
    ``normalize`` (matching the reference's ``normalize=True`` calls),
    else in [-1,1].  Returns (N,) fp32.
    """
    kind = (
        params.kind if isinstance(params, LPIPSParams) else params.get("kind", "alex")
    )
    if x.shape[1] < 16 or x.shape[2] < 16:
        raise ValueError(
            f"LPIPS needs spatial dims ≥ 16, got {x.shape[1:3]} — the "
            "backbone pooling would produce empty feature maps (NaN)."
        )
    if normalize:
        x = 2.0 * x - 1.0
        y = 2.0 * y - 1.0
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
        y = jnp.repeat(y, 3, axis=-1)
    shift = jnp.asarray(_SHIFT, x.dtype)
    scale = jnp.asarray(_SCALE, x.dtype)
    x = (x - shift) / scale
    y = (y - shift) / scale

    net = params.net if isinstance(params, LPIPSParams) else params["net"]
    lin = params.lin if isinstance(params, LPIPSParams) else params["lin"]
    feats = _alex_features if kind == "alex" else _squeeze_features
    fx = feats(net, x)
    fy = feats(net, y)

    total = jnp.zeros((x.shape[0],), jnp.float32)
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = jnp.square(_normalize_tensor(a) - _normalize_tensor(b))  # (N,H,W,C)
        w = lin[f"lin{i}"]["w"].astype(jnp.float32)  # (1,1,C,1)
        proj = jnp.einsum("nhwc,c->nhw", d, w[0, 0, :, 0])
        total = total + jnp.mean(proj, axis=(1, 2))
    return total

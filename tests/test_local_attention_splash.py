"""Splash-attention local heads (ops/local_attention_splash.py):

the stock-JAX splash kernel wrapped to our window/rotary/scale
conventions must match ops.local_attention.local_attention exactly
(values and gradients) — it is the external yardstick for the
first-party banded Pallas kernels (cross-benchmarked on-chip via
tools/bench_transformer.py --splash-local)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthanatomy_tpu.ops.local_attention import local_attention
from synthanatomy_tpu.ops.local_attention_splash import local_attention_splash


def _qkv(b=2, h=3, n=300, d=64, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
        for _ in range(3)
    )


@pytest.mark.parametrize("window,n", [(37, 300), (64, 128), (420, 700)])
def test_splash_matches_xla_forward(window, n):
    q, k, v = _qkv(n=n)
    want = local_attention(q, k, v, window=window, compute_dtype=jnp.float32)
    got = local_attention_splash(
        q, k, v, window=window, compute_dtype=jnp.float32,
        block_q=128, block_kv=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_splash_matches_xla_gradients():
    q, k, v = _qkv(n=200)

    def loss(fn, *xs):
        return jnp.sum(fn(*xs) ** 2)

    ref = jax.grad(
        lambda *xs: loss(
            lambda q, k, v: local_attention(
                q, k, v, window=37, compute_dtype=jnp.float32
            ),
            *xs,
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    got = jax.grad(
        lambda *xs: loss(
            lambda q, k, v: local_attention_splash(
                q, k, v, window=37, compute_dtype=jnp.float32,
                block_q=128, block_kv=128, interpret=True,
            ),
            *xs,
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(ref, got):
        scale = float(jnp.max(jnp.abs(a)))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5 * max(scale, 1.0)
        )


def test_splash_no_rotary_and_padding_boundary():
    """Padded tail (n not a multiple of the block) must not leak into
    real rows, with rotary off (isolates the mask/scale mapping)."""
    q, k, v = _qkv(n=130, h=2)
    want = local_attention(
        q, k, v, window=17, use_rotary=False, compute_dtype=jnp.float32
    )
    got = local_attention_splash(
        q, k, v, window=17, use_rotary=False, compute_dtype=jnp.float32,
        block_q=128, block_kv=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_splash_off_tpu_fallback_is_xla():
    """Without interpret, the wrapper must fall back to the XLA path on
    CPU (same policy as local_attention_flash)."""
    q, k, v = _qkv(n=96, h=1)
    want = local_attention(q, k, v, window=9, compute_dtype=jnp.float32)
    got = local_attention_splash(
        q, k, v, window=9, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

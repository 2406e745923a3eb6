import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthanatomy_tpu.ops.favor import (
    default_nb_features,
    favor_attention,
    favor_attention_step,
    gaussian_orthogonal_random_matrix,
    softmax_kernel_features,
)
from synthanatomy_tpu.ops.local_attention import (
    local_attention,
    local_attention_step,
)


def _naive_causal_linear(q_p, k_p, v):
    """O(L²) oracle for causal linear attention on fp32 features."""
    b, h, n, m = q_p.shape
    out = np.zeros(v.shape, np.float64)
    S = np.zeros((b, h, m, v.shape[-1]), np.float64)
    z = np.zeros((b, h, m), np.float64)
    for i in range(n):
        S += np.einsum("bhm,bhd->bhmd", k_p[:, :, i], v[:, :, i])
        z += k_p[:, :, i]
        num = np.einsum("bhm,bhmd->bhd", q_p[:, :, i], S)
        den = np.einsum("bhm,bhm->bh", q_p[:, :, i], z)
        out[:, :, i] = num / den[..., None]
    return out


def test_orf_matrix_orthogonal_blocks():
    w = np.asarray(gaussian_orthogonal_random_matrix(jax.random.key(0), 128, 64))
    assert w.shape == (128, 64)
    # rows within each 64-block are orthogonal after norm removal
    b0 = w[:64] / np.linalg.norm(w[:64], axis=1, keepdims=True)
    gram = b0 @ b0.T
    np.testing.assert_allclose(gram, np.eye(64), atol=1e-5)


def test_favor_causal_chunked_matches_naive():
    key = jax.random.key(0)
    b, h, n, d, m = 2, 3, 37, 16, 32
    q, k, v = jax.random.normal(key, (3, b, h, n, d))
    proj = gaussian_orthogonal_random_matrix(jax.random.key(1), m, d)

    out = favor_attention(q, k, v, proj, causal=True, chunk=8)

    # oracle on the exact same features → chunked scan must be exact
    # (batch mode defaults to the zero key stabilizer)
    q_p = np.asarray(softmax_kernel_features(q, proj, is_query=True))
    k_p = np.asarray(
        softmax_kernel_features(k, proj, is_query=False, stabilizer=jnp.zeros(()))
    )
    oracle = _naive_causal_linear(q_p, k_p, np.asarray(v, np.float64))
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-5)


def test_favor_approximates_softmax_attention():
    """With many features, FAVOR+ must approximate exact softmax
    attention (the defining property)."""
    key = jax.random.key(2)
    b, h, n, d = 1, 2, 24, 16
    m = 1024
    q, k, v = 0.5 * jax.random.normal(key, (3, b, h, n, d))
    proj = gaussian_orthogonal_random_matrix(jax.random.key(3), m, d)
    out = np.asarray(favor_attention(q, k, v, proj, causal=False))

    scores = np.einsum("bhid,bhjd->bhij", np.asarray(q), np.asarray(k)) / np.sqrt(d)
    probs = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    exact = np.einsum("bhij,bhjd->bhid", np.asarray(probs), np.asarray(v))
    err = np.abs(out - exact).mean() / (np.abs(exact).mean() + 1e-8)
    assert err < 0.2, f"relative error {err}"


def test_favor_step_matches_batch():
    """Incremental prefix-state decoding must reproduce batch-mode
    causal attention (the KV-cache-correctness property)."""
    key = jax.random.key(4)
    b, h, n, d, m = 1, 2, 20, 8, 64
    q, k, v = jax.random.normal(key, (3, b, h, n, d)) * 0.5
    proj = gaussian_orthogonal_random_matrix(jax.random.key(5), m, d)

    batch = np.asarray(favor_attention(q, k, v, proj, causal=True, chunk=4))

    S = jnp.zeros((b, h, m, d))
    z = jnp.zeros((b, h, m))
    outs = []
    for t in range(n):
        o, (S, z) = favor_attention_step(
            q[:, :, t], k[:, :, t], v[:, :, t], (S, z), proj
        )
        outs.append(np.asarray(o))
    inc = np.stack(outs, axis=2)
    np.testing.assert_allclose(inc, batch, rtol=2e-2, atol=2e-2)


def test_favor_generalized_kernel():
    key = jax.random.key(6)
    q, k, v = jax.random.normal(key, (3, 1, 2, 16, 8))
    proj = gaussian_orthogonal_random_matrix(jax.random.key(7), 32, 8)
    out = favor_attention(q, k, v, proj, causal=True, generalized=True)
    assert np.isfinite(np.asarray(out)).all()
    # no-projection variant
    out2 = favor_attention(q, k, v, None, causal=True, generalized=True)
    assert np.isfinite(np.asarray(out2)).all()


def _naive_local(q, k, v, window, use_rotary=False):
    from synthanatomy_tpu.ops.local_attention import apply_rotary, rotary_sin_cos

    b, h, n, d = q.shape
    if use_rotary:
        sin, cos = rotary_sin_cos(d, jnp.arange(n))
        q = np.asarray(apply_rotary(jnp.asarray(q), sin, cos))
        k = np.asarray(apply_rotary(jnp.asarray(k), sin, cos))
    scores = np.einsum("bhid,bhjd->bhij", q, k) / np.sqrt(d)
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    mask = (j <= i) & (j > i - window)
    scores = np.where(mask, scores, -np.inf)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    return np.einsum("bhij,bhjd->bhid", probs, v)


@pytest.mark.parametrize("n,window", [(16, 4), (17, 4), (8, 8), (30, 7)])
def test_local_attention_matches_naive(n, window):
    key = jax.random.key(8)
    q, k, v = jax.random.normal(key, (3, 2, 2, n, 8))
    out = local_attention(q, k, v, window=window, use_rotary=False)
    oracle = _naive_local(np.asarray(q), np.asarray(k), np.asarray(v), window)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-5)


def test_local_attention_rotary_matches_naive():
    key = jax.random.key(9)
    q, k, v = jax.random.normal(key, (3, 1, 2, 20, 8))
    out = local_attention(q, k, v, window=5, use_rotary=True)
    oracle = _naive_local(np.asarray(q), np.asarray(k), np.asarray(v), 5, use_rotary=True)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-5)


def test_local_attention_step_matches_batch():
    key = jax.random.key(10)
    b, h, n, d, w = 1, 2, 19, 8, 5
    q, k, v = jax.random.normal(key, (3, b, h, n, d))
    batch = np.asarray(local_attention(q, k, v, window=w, use_rotary=True))

    ck = jnp.zeros((b, h, w, d))
    cv = jnp.zeros((b, h, w, d))
    outs = []
    for t in range(n):
        o, ck, cv = local_attention_step(
            q[:, :, t], k[:, :, t], v[:, :, t], ck, cv, jnp.asarray(t), window=w
        )
        outs.append(np.asarray(o))
    inc = np.stack(outs, axis=2)
    np.testing.assert_allclose(inc, batch, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n,window", [(16, 4), (20, 4), (24, 8)])
def test_local_attention_flash_interpret_matches_xla(n, window):
    from synthanatomy_tpu.ops.local_attention_pallas import local_attention_flash

    key = jax.random.key(11)
    q, k, v = jax.random.normal(key, (3, 2, 2, n, 8))
    ref = np.asarray(
        local_attention(q, k, v, window=window, use_rotary=True)
    )
    out = np.asarray(
        local_attention_flash(
            q, k, v, window=window, use_rotary=True, interpret=True,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_local_attention_flash_grad_matches_xla():
    from synthanatomy_tpu.ops.local_attention_pallas import local_attention_flash

    key = jax.random.key(12)
    q, k, v = jax.random.normal(key, (3, 1, 2, 16, 8))

    def f_ref(q, k, v):
        return jnp.sum(local_attention(q, k, v, window=4, use_rotary=True) ** 2)

    def f_flash(q, k, v):
        return jnp.sum(
            local_attention_flash(
                q, k, v, window=4, use_rotary=True, interpret=True,
                compute_dtype=jnp.float32,
            ) ** 2
        )

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_favor_bf16_compute_close_to_fp32():
    """attn_compute_dtype=bfloat16 keeps fp32 accumulation — outputs
    must track the fp32 path to bf16 operand-rounding tolerance."""
    key = jax.random.key(7)
    b, h, n, d, m = 2, 2, 37, 16, 32
    q, k, v = jax.random.normal(key, (3, b, h, n, d))
    proj = gaussian_orthogonal_random_matrix(jax.random.key(1), m, d)

    ref = np.asarray(favor_attention(q, k, v, proj, causal=True, chunk=8))
    fast = np.asarray(
        favor_attention(
            q, k, v, proj, causal=True, chunk=8, compute_dtype=jnp.bfloat16
        )
    )
    np.testing.assert_allclose(fast, ref, rtol=3e-2, atol=3e-2)


def test_local_attention_bf16_compute_close_to_fp32():
    key = jax.random.key(8)
    b, h, n, d = 2, 2, 50, 16
    q, k, v = jax.random.normal(key, (3, b, h, n, d))
    ref = np.asarray(local_attention(q, k, v, window=16))
    fast = np.asarray(
        local_attention(q, k, v, window=16, compute_dtype=jnp.bfloat16)
    )
    np.testing.assert_allclose(fast, ref, rtol=3e-2, atol=3e-2)


def test_compute_dtype_fp32_default_bit_identical():
    """Threading compute_dtype must not change the fp32 default path at
    all — the incremental-decode exactness story depends on it."""
    key = jax.random.key(9)
    b, h, n, d, m = 1, 2, 33, 16, 32
    q, k, v = jax.random.normal(key, (3, b, h, n, d))
    proj = gaussian_orthogonal_random_matrix(jax.random.key(2), m, d)
    a = np.asarray(favor_attention(q, k, v, proj, causal=True, chunk=8))
    b_ = np.asarray(
        favor_attention(
            q, k, v, proj, causal=True, chunk=8, compute_dtype=jnp.float32
        )
    )
    np.testing.assert_array_equal(a, b_)
    la = np.asarray(local_attention(q, k, v, window=16))
    lb = np.asarray(
        local_attention(q, k, v, window=16, compute_dtype=jnp.float32)
    )
    np.testing.assert_array_equal(la, lb)


def test_local_attention_flash_bf16_close(monkeypatch):
    """Kernel with bf16 operands (the training default) tracks the fp32
    XLA path to operand-rounding tolerance; unaligned window exercises
    the padded-bucket masks."""
    from synthanatomy_tpu.ops.local_attention_pallas import local_attention_flash

    key = jax.random.key(13)
    q, k, v = jax.random.normal(key, (3, 1, 2, 22, 8))
    ref = np.asarray(local_attention(q, k, v, window=6, use_rotary=True))
    out = np.asarray(
        local_attention_flash(
            q, k, v, window=6, use_rotary=True, interpret=True,
            compute_dtype=jnp.bfloat16,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=4e-2, atol=4e-2)


def test_favor_fused_kernel_matches_xla():
    """Fused Pallas FAVOR+ (features + scan, interpret) vs the XLA path
    on the same inputs — identical math, fp-tight."""
    from synthanatomy_tpu.ops.favor_pallas import favor_attention_fused

    key = jax.random.key(21)
    b, h, n, d, m = 2, 2, 37, 8, 16
    q, k, v = jax.random.normal(key, (3, b, h, n, d))
    proj = gaussian_orthogonal_random_matrix(jax.random.key(26), m, d)

    ref = np.asarray(favor_attention(q, k, v, proj, causal=True, chunk=8))
    out = np.asarray(favor_attention_fused(q, k, v, proj, 16, True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_favor_fused_kernel_grads_match_autodiff():
    """The in-kernel backward (two sweeps + feature-map chain incl.
    rowmax-stabilizer tie routing) vs JAX autodiff of the XLA path."""
    from synthanatomy_tpu.ops.favor_pallas import favor_attention_fused

    key = jax.random.key(23)
    b, h, n, d, m = 1, 2, 21, 8, 16
    q, k, v = jax.random.normal(key, (3, b, h, n, d))
    proj = gaussian_orthogonal_random_matrix(jax.random.key(24), m, d)

    def f_ref(q, k, v):
        return jnp.sum(favor_attention(q, k, v, proj, causal=True, chunk=8) ** 2)

    def f_pal(q, k, v):
        return jnp.sum(favor_attention_fused(q, k, v, proj, 16, True) ** 2)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4
        )


def test_favor_attention_pallas_route_end_to_end():
    """favor_attention(use_pallas_scan=True) routes to the fused kernel
    and matches the default path (interpret mode via mock)."""
    from synthanatomy_tpu.ops import favor_pallas

    key = jax.random.key(25)
    b, h, n, d, m = 1, 2, 19, 8, 16
    q, k, v = jax.random.normal(key, (3, b, h, n, d))
    proj = gaussian_orthogonal_random_matrix(jax.random.key(26), m, d)

    import unittest.mock as mock

    real = favor_pallas.favor_attention_fused

    def interp(q, k, vv, p, chunk=256, interpret=False):
        return real(q, k, vv, p, chunk, True)

    with mock.patch.object(favor_pallas, "favor_attention_fused", interp):
        out_p = np.asarray(
            favor_attention(
                q, k, v, proj, causal=True, chunk=8, use_pallas_scan=True
            )
        )

    out_r = np.asarray(favor_attention(q, k, v, proj, causal=True, chunk=8))
    np.testing.assert_allclose(out_p, out_r, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,chunk", [(5, 16), (32, 16), (21, 32)])
def test_favor_fused_kernel_edge_lengths(n, chunk):
    """Sequence shorter than / equal to / padded into the kernel chunk."""
    from synthanatomy_tpu.ops.favor_pallas import favor_attention_fused

    key = jax.random.key(31)
    b, h, d, m = 1, 2, 8, 16
    q, k, v = jax.random.normal(key, (3, b, h, n, d))
    proj = gaussian_orthogonal_random_matrix(jax.random.key(32), m, d)
    ref = np.asarray(favor_attention(q, k, v, proj, causal=True, chunk=8))
    out = np.asarray(favor_attention_fused(q, k, v, proj, chunk, True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_favor_fused_kernel_full_bh_tile():
    """bh=16 → the full bt=8 batch·head tile with TWO grid rows — the
    production regime of the round-3 BH-tiled kernels (the paper shape
    runs bh=48, bt=6/8; the smaller parity tests above only reach
    bt≤4).  Locks the batched state-scratch reset (`program_id(1)==0`
    per bh-row) and tile indexing, fwd + both backward sweeps."""
    from synthanatomy_tpu.ops.favor_pallas import _bh_tile, favor_attention_fused

    b, h, n, d, m, chunk = 2, 8, 37, 8, 16, 16
    assert _bh_tile(b * h, chunk, m) == 8
    key = jax.random.key(33)
    q, k, v = jax.random.normal(key, (3, b, h, n, d))
    proj = gaussian_orthogonal_random_matrix(jax.random.key(34), m, d)

    ref = np.asarray(favor_attention(q, k, v, proj, causal=True, chunk=8))
    out = np.asarray(favor_attention_fused(q, k, v, proj, chunk, True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def f_ref(q, k, v):
        return jnp.sum(favor_attention(q, k, v, proj, causal=True, chunk=8) ** 2)

    def f_pal(q, k, v):
        return jnp.sum(favor_attention_fused(q, k, v, proj, chunk, True) ** 2)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4
        )


def test_local_attention_flash_window_longer_than_sequence():
    from synthanatomy_tpu.ops.local_attention_pallas import local_attention_flash

    key = jax.random.key(33)
    q, k, v = jax.random.normal(key, (3, 1, 2, 5, 8))
    ref = np.asarray(local_attention(q, k, v, window=8))
    out = np.asarray(
        local_attention_flash(
            q, k, v, window=8, interpret=True, compute_dtype=jnp.float32
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

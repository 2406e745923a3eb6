import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthanatomy_tpu.ops.vq import (
    VQState,
    embed_indices,
    init_vq_state,
    nearest_codeword,
    nearest_codeword_pallas,
    perplexity,
    quantize_ema,
)


def _np_nearest(x, w):
    dist = (x**2).sum(1, keepdims=True) - 2 * x @ w.T + (w**2).sum(1)[None, :]
    return dist.argmin(1)


def test_nearest_codeword_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(257, 32)).astype(np.float32)
    w = rng.normal(size=(96, 32)).astype(np.float32)
    got = np.asarray(nearest_codeword(jnp.array(x), jnp.array(w), use_pallas=False))
    np.testing.assert_array_equal(got, _np_nearest(x, w))


def test_pallas_kernel_interpret_matches_oracle():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(300, 32)).astype(np.float32)
    w = rng.normal(size=(200, 32)).astype(np.float32)
    got = np.asarray(
        nearest_codeword_pallas(jnp.array(x), jnp.array(w), tile_n=128, interpret=True)
    )
    np.testing.assert_array_equal(got, _np_nearest(x, w))


def test_ema_update_matches_reference_math():
    """EMA codebook update vs. a NumPy transcription of the reference
    formulas (baseline.py:66-80)."""
    rng = np.random.default_rng(2)
    k, d = 16, 8
    decay, eps = 0.5, 1e-5
    w0 = rng.normal(size=(k, d)).astype(np.float32)
    state = VQState(jnp.array(w0), jnp.zeros(k), jnp.array(w0))
    x = rng.normal(size=(2, 4, 4, 4, d)).astype(np.float32)

    _, _, idx, new_state = quantize_ema(
        state, jnp.array(x), decay=decay, commitment_cost=0.25, training=True,
        use_pallas=False,
    )

    flat = x.reshape(-1, d)
    idx_np = _np_nearest(flat, w0)
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), idx_np)
    onehot = np.eye(k, dtype=np.float32)[idx_np]
    counts = onehot.sum(0)
    dw = onehot.T @ flat
    N = 0 * decay + counts * (1 - decay)
    avg = w0 * decay + dw * (1 - decay)
    n = N.sum()
    smoothed = (N + eps) / (n + k * eps) * n
    expect_cb = avg / smoothed[:, None]
    np.testing.assert_allclose(np.asarray(new_state.codebook), expect_cb, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.cluster_size), N, rtol=1e-5)


def test_straight_through_gradient():
    """d(quantized_st)/dx must be identity; commitment loss gradient
    must equal 2c/N*(x - q)."""
    state = init_vq_state(jax.random.key(0), 8, 4)
    x = jax.random.normal(jax.random.key(1), (2, 2, 2, 2, 4))

    def f(x):
        q, loss, _, _ = quantize_ema(
            state, x, decay=0.99, commitment_cost=0.25, training=False,
            use_pallas=False,
        )
        return jnp.sum(q * 3.0) + loss

    g = jax.grad(f)(x)
    q, _, _, _ = quantize_ema(
        state, x, decay=0.99, commitment_cost=0.25, training=False, use_pallas=False
    )
    expect = 3.0 + 2 * 0.25 / x.size * (x - q)  # note q==quantized_st stops grad
    np.testing.assert_allclose(np.asarray(g), np.asarray(expect), rtol=1e-4, atol=1e-5)


def test_codebook_receives_no_gradient_path():
    """The codebook is EMA-learned only; no gradient flows to it."""
    state = init_vq_state(jax.random.key(0), 8, 4)
    x = jax.random.normal(jax.random.key(1), (16, 4))

    def f(cb):
        q, loss, _, _ = quantize_ema(
            state._replace(codebook=cb), x, decay=0.99, commitment_cost=0.25,
            training=False, use_pallas=False,
        )
        return jnp.sum(q) + loss

    g = jax.grad(f)(state.codebook)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_embed_roundtrip_and_perplexity():
    state = init_vq_state(jax.random.key(0), 32, 8)
    idx = jnp.arange(32)
    np.testing.assert_allclose(
        np.asarray(embed_indices(state, idx)), np.asarray(state.codebook)
    )
    # uniform usage → perplexity == K
    p = perplexity(idx, 32)
    assert abs(float(p) - 32.0) < 1e-2
    # single-code usage → perplexity == 1
    p1 = perplexity(jnp.zeros(100, jnp.int32), 32)
    assert abs(float(p1) - 1.0) < 1e-3


def test_quantize_preserves_dtype_fp32_island():
    state = init_vq_state(jax.random.key(0), 16, 8)
    x = jax.random.normal(jax.random.key(1), (4, 2, 2, 2, 8), jnp.bfloat16)
    q, loss, idx, _ = quantize_ema(
        state, x, decay=0.99, commitment_cost=0.25, training=True, use_pallas=False
    )
    assert q.dtype == jnp.bfloat16
    assert loss.dtype == jnp.float32
    assert idx.shape == (4, 2, 2, 2)


def test_ema_psum_invariance_under_sharding():
    """Sharded-batch EMA must equal single-device EMA: the implicit
    GSPMD reduction preserves the reference's reduce-before-update
    invariant (SURVEY.md §5.2)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 CPU devices"
    mesh = Mesh(np.array(devs[:8]), ("data",))
    state = init_vq_state(jax.random.key(0), 16, 8)
    x = jax.random.normal(jax.random.key(1), (16, 2, 2, 2, 8))

    def step(state, x):
        return quantize_ema(
            state, x, decay=0.9, commitment_cost=0.25, training=True,
            use_pallas=False,
        )[3]

    ref_state = step(state, x)

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with jax.set_mesh(mesh):
        sharded_state = jax.jit(step)(state, xs)

    np.testing.assert_allclose(
        np.asarray(sharded_state.codebook), np.asarray(ref_state.codebook),
        rtol=2e-5, atol=2e-6,
    )


def test_pallas_fused_stats_kernel_matches_oracle():
    """The fused distance+argmin+EMA-stats kernel (interpret mode) must
    match the one-hot matmul oracle incl. padded-row masking."""
    from synthanatomy_tpu.ops.vq import nearest_codeword_stats_pallas

    rng = np.random.default_rng(5)
    x = rng.normal(size=(300, 32)).astype(np.float32)  # non-multiple of tile
    w = rng.normal(size=(200, 32)).astype(np.float32)
    idx, counts, dw = nearest_codeword_stats_pallas(
        jnp.asarray(x), jnp.asarray(w), tile_n=128, interpret=True
    )
    exp_idx = _np_nearest(x, w)
    np.testing.assert_array_equal(np.asarray(idx), exp_idx)
    onehot = np.eye(200, dtype=np.float32)[exp_idx]
    np.testing.assert_allclose(np.asarray(counts), onehot.sum(0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dw), onehot.T @ x, rtol=1e-4, atol=1e-4)

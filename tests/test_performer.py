import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthanatomy_tpu.models.ordering import Ordering
from synthanatomy_tpu.models.performer import Performer, redraw_projections
from synthanatomy_tpu.models.sampling import sample, sample_naive, top_k_logits


def _tiny_model(**kw):
    defaults = dict(
        num_tokens=17,  # vocab 16 + BOS
        max_seq_len=28,  # 3*3*3 grid + BOS
        dim=32,
        depth=2,
        heads=4,
        dim_head=8,
        local_attn_heads=2,
        local_window_size=8,
        nb_features=16,
        dtype=jnp.float32,
        scan_chunk=8,
    )
    defaults.update(kw)
    return Performer(**defaults)


@pytest.fixture(scope="module")
def ordering():
    return Ordering("raster_scan", 3, (3, 3, 3))


def test_forward_shapes(ordering):
    model = _tiny_model()
    x = jnp.zeros((2, 28), jnp.int32)
    variables = model.init(jax.random.key(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 28, 17)
    assert np.isfinite(np.asarray(logits)).all()


def test_incremental_decode_matches_batch(ordering):
    """decode_step over a sequence must reproduce batch logits — the
    KV/prefix-cache correctness property that makes fast sampling
    valid."""
    model = _tiny_model()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 16, (2, 12)), jnp.int32)
    variables = model.init(jax.random.key(0), x)

    batch_logits = np.asarray(model.apply(variables, x))

    cache = model.apply(variables, 2, method=model.init_cache)
    inc = []
    for t in range(12):
        logits, cache = model.apply(
            variables, x[:, t], cache, jnp.asarray(t, jnp.int32), None,
            method=model.decode_step,
        )
        inc.append(np.asarray(logits))
    inc = np.stack(inc, axis=1)
    np.testing.assert_allclose(inc, batch_logits, rtol=8e-2, atol=8e-2)


@pytest.mark.parametrize("kw", [
    dict(rotary_position_emb=True),
    dict(fixed_position_emb=True),
    dict(axial_position_emb=True),
    dict(use_rezero=True),
    dict(use_scalenorm=True),
    dict(ff_glu=True),
    dict(tie_embed=True),
    dict(generalized_attention=True),
    dict(local_attn_heads=0),
    dict(local_attn_heads=4),
])
def test_variants_forward_and_decode_agree(kw):
    model = _tiny_model(**kw)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 16, (1, 10)), jnp.int32)
    variables = model.init(jax.random.key(0), x)
    batch_logits = np.asarray(model.apply(variables, x))
    assert np.isfinite(batch_logits).all()

    cache = model.apply(variables, 1, method=model.init_cache)
    inc = []
    for t in range(10):
        logits, cache = model.apply(
            variables, x[:, t], cache, jnp.asarray(t, jnp.int32), None,
            method=model.decode_step,
        )
        inc.append(np.asarray(logits))
    inc = np.stack(inc, axis=1)
    np.testing.assert_allclose(inc, batch_logits, rtol=8e-2, atol=8e-2)


def test_spatial_position_embeddings(ordering):
    for kind in ("absolute", "fixed"):
        model = _tiny_model(
            spatial_position_emb=kind,
            spatial_shape=(3, 3, 3),
            ordering=ordering,
        )
        x = jnp.zeros((1, 28), jnp.int32)
        variables = model.init(jax.random.key(0), x)
        logits = model.apply(variables, x)
        assert np.isfinite(np.asarray(logits)).all()


def test_conditioning_bos_replacement():
    model = _tiny_model(
        conditioning_num_tokens=(3, 5), conditioning_type="bos_replacement"
    )
    x = jnp.zeros((2, 10), jnp.int32)
    conds = [jnp.asarray([0, 1]), jnp.asarray([2, 4])]
    variables = model.init(jax.random.key(0), x, conds)
    logits = model.apply(variables, x, conds)
    assert logits.shape == (2, 10, 17)
    # different conditioning must change the logits
    conds2 = [jnp.asarray([1, 1]), jnp.asarray([2, 4])]
    logits2 = model.apply(variables, x, conds2)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_conditioning_prepending_strips_outputs():
    model = _tiny_model(
        conditioning_num_tokens=(3,), conditioning_type="prepending"
    )
    x = jnp.zeros((2, 10), jnp.int32)
    conds = [jnp.asarray([0, 2])]
    variables = model.init(jax.random.key(0), x, conds)
    logits = model.apply(variables, x, conds)
    assert logits.shape == (2, 10, 17)


def test_prepending_incremental_matches_batch():
    model = _tiny_model(
        conditioning_num_tokens=(3,), conditioning_type="prepending",
        local_attn_heads=0,
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 16, (1, 8)), jnp.int32)
    conds = [jnp.asarray([1])]
    variables = model.init(jax.random.key(0), x, conds)
    batch_logits = np.asarray(model.apply(variables, x, conds))

    cache = model.apply(variables, 1, method=model.init_cache)
    cache = model.apply(variables, cache, conds, method=model.prime_cache)
    inc = []
    for t in range(8):
        logits, cache = model.apply(
            variables, x[:, t], cache, jnp.asarray(t, jnp.int32), conds,
            method=model.decode_step,
        )
        inc.append(np.asarray(logits))
    inc = np.stack(inc, axis=1)
    np.testing.assert_allclose(inc, batch_logits, rtol=8e-2, atol=8e-2)


def test_incremental_decode_matches_batch_fp32_tight():
    """fp32 tier: the zero-key-stabilizer design makes incremental and
    batch paths the SAME math, so in fp32 they must agree to fp rounding
    (~1e-5), not just bf16 tolerance — this is what pins the sampling
    speedup's correctness story."""
    model = _tiny_model()  # fp32 everywhere (dtype + caches)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, 16, (2, 20)), jnp.int32)
    variables = model.init(jax.random.key(0), x)

    batch_logits = np.asarray(model.apply(variables, x))
    cache = model.apply(variables, 2, method=model.init_cache)
    inc = []
    for t in range(20):
        logits, cache = model.apply(
            variables, x[:, t], cache, jnp.asarray(t, jnp.int32), None,
            method=model.decode_step,
        )
        inc.append(np.asarray(logits))
    inc = np.stack(inc, axis=1)
    np.testing.assert_allclose(inc, batch_logits, rtol=2e-5, atol=2e-5)


def test_fast_greedy_sampling_exact_fp32(ordering):
    """fp32 tier: greedy fast sampling must equal the naive reference
    sampler token-for-token (no tolerance)."""
    model = _tiny_model()
    x = jnp.zeros((1, 28), jnp.int32)
    variables = model.init(jax.random.key(3), x)
    fast = np.asarray(
        sample(model, variables, ordering, batch=2, do_sample=False,
               rng=jax.random.key(1))
    )
    naive = np.asarray(
        sample_naive(model, variables, ordering, batch=2, do_sample=False,
                     rng=jax.random.key(1))
    )
    np.testing.assert_array_equal(fast, naive)


def test_top_k_logits():
    logits = jnp.asarray([[1.0, 3.0, 2.0, 0.5]])
    out = np.asarray(top_k_logits(logits, 2))
    assert np.isneginf(out[0, 0]) and np.isneginf(out[0, 3])
    assert out[0, 1] == 3.0 and out[0, 2] == 2.0


def test_fast_greedy_sampling_matches_naive(ordering):
    """Greedy (argmax) fast cached sampling must produce the same grid
    as the reference-shaped full-recompute sampler."""
    model = _tiny_model()
    x = jnp.zeros((1, 28), jnp.int32)
    variables = model.init(jax.random.key(0), x)

    fast = sample(
        model, variables, ordering, batch=2, do_sample=False,
        rng=jax.random.key(1),
    )
    naive = sample_naive(
        model, variables, ordering, batch=2, do_sample=False,
        rng=jax.random.key(1),
    )
    assert fast.shape == (2, 3, 3, 3)
    assert naive.shape == (2, 3, 3, 3)
    match = (np.asarray(fast) == np.asarray(naive)).mean()
    assert match > 0.9, f"greedy fast/naive agreement only {match}"
    # tokens are valid codebook indices (BOS=16 never emitted)
    assert int(jnp.max(fast)) < 16


def test_sampling_stochastic_varies_with_rng(ordering):
    model = _tiny_model()
    x = jnp.zeros((1, 28), jnp.int32)
    variables = model.init(jax.random.key(0), x)
    a = sample(model, variables, ordering, batch=1, rng=jax.random.key(1), temperature=2.0)
    b = sample(model, variables, ordering, batch=1, rng=jax.random.key(2), temperature=2.0)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_redraw_projections_changes_favor_only():
    model = _tiny_model()
    x = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(jax.random.key(0), x)
    new_vars = redraw_projections(variables, jax.random.key(9))
    p0 = jax.tree.leaves(variables["favor"])[0]
    p1 = jax.tree.leaves(new_vars["favor"])[0]
    assert p0.shape == p1.shape
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    assert variables["params"] is new_vars["params"]


def test_seq_len_guard():
    model = _tiny_model(max_seq_len=8)
    x = jnp.zeros((1, 9), jnp.int32)
    with pytest.raises(ValueError):
        model.init(jax.random.key(0), x)


def test_no_projection_mode():
    model = _tiny_model(no_projection=True, local_attn_heads=0)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(0, 16, (1, 10)), jnp.int32)
    variables = model.init(jax.random.key(0), x)
    assert "favor" not in variables or not variables["favor"]
    batch_logits = np.asarray(model.apply(variables, x))
    assert np.isfinite(batch_logits).all()
    cache = model.apply(variables, 1, method=model.init_cache)
    inc = []
    for t in range(10):
        logits, cache = model.apply(
            variables, x[:, t], cache, jnp.asarray(t, jnp.int32), None,
            method=model.decode_step,
        )
        inc.append(np.asarray(logits))
    inc = np.stack(inc, axis=1)
    np.testing.assert_allclose(inc, batch_logits, rtol=8e-2, atol=8e-2)


def test_cross_attend_raises():
    model = _tiny_model(cross_attend=True)
    with pytest.raises(NotImplementedError):
        model.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))


def test_vq_layer_api():
    from synthanatomy_tpu.models.vq_layer import VectorQuantizerEMA

    layer = VectorQuantizerEMA(num_embeddings=16, embedding_dim=4,
                               embedding_init="kaiming_uniform", use_pallas=False)
    x = jax.random.normal(jax.random.key(0), (2, 5, 5, 4))  # 2D spatial
    variables = layer.init(jax.random.key(1), x)
    (q, loss), muts = layer.apply(variables, x, training=True, mutable=["vq"])
    assert q.shape == x.shape and np.isfinite(float(loss))
    flat_q, one_hot, idx = layer.apply(variables, x, method=layer.quantize)
    assert flat_q.shape == (50, 4)
    assert one_hot.shape == (50, 16)
    assert idx.shape == (2, 5, 5)
    emb = layer.apply(variables, idx, method=layer.embed)
    np.testing.assert_allclose(np.asarray(emb).reshape(-1, 4), np.asarray(flat_q))


def test_redraw_projections_stable_across_hash_seeds():
    """Regression: key folding used Python's per-process-salted hash(),
    so two hosts of a multi-process DP job drew DIFFERENT projection
    matrices at every redraw (feature_redraw_interval) and silently
    diverged the replicas.  The stable-hash fold must give identical
    draws under different PYTHONHASHSEED."""
    import os
    import subprocess
    import sys

    probe = (
        "import sys; sys.path.insert(0, {!r})\n"
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from synthanatomy_tpu.models.performer import Performer, "
        "redraw_projections\n"
        "m = Performer(num_tokens=17, max_seq_len=16, dim=32, depth=2, "
        "heads=4, dim_head=8, nb_features=8, dtype=jnp.float32, "
        "scan_chunk=8)\n"
        "v = m.init({{'params': jax.random.key(0), 'favor': "
        "jax.random.key(1)}}, jnp.zeros((1, 12), jnp.int32))\n"
        "out = redraw_projections({{'favor': v['favor']}}, "
        "jax.random.key(3))['favor']\n"
        "print(sum(float(jnp.sum(x)) for x in jax.tree.leaves(out)))\n"
    ).format(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def run(seed):
        env = dict(os.environ, PYTHONHASHSEED=seed, JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, "-c", probe], env=env,
            capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return out.stdout.strip().splitlines()[-1]

    assert run("1") == run("2")

"""GSPMD partitioning of the Pallas attention kernels.

The flash local-attention and fused FAVOR+ kernels are registered with
``jax.experimental.custom_partitioning`` (ops/partitioning.py): meshes
may shard the (batch, head) dims — DP batch sharding, Megatron TP head
sharding, DP×TP — and each device lowers its own kernel instance on
the shard.  These tests run the kernels in interpret mode on the
8-virtual-device CPU mesh with sharded operands and pin exact parity
against the unsharded result, forward and backward, plus a full GSPMD
DP×TP train step with the kernels active (the round-2 framework gated
the kernels off any multi-device mesh; this removes that gap).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from synthanatomy_tpu.ops.local_attention_pallas import local_attention_flash


def _mesh22():
    return Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("data", "model"))


def _qkv(key, b=4, h=4, n=32, d=8):
    ks = jax.random.split(key, 3)
    return [jax.random.normal(k, (b, h, n, d), jnp.float32) for k in ks]


def test_local_attention_flash_partitioned_matches_unsharded():
    q, k, v = _qkv(jax.random.key(0))
    fn = functools.partial(
        local_attention_flash, window=8, causal=True, use_rotary=False,
        compute_dtype=jnp.float32, interpret=True,
    )
    ref = jax.jit(fn)(q, k, v)

    mesh = _mesh22()
    sh = NamedSharding(mesh, P("data", "model"))
    qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))
    with jax.set_mesh(mesh):
        out = jax.jit(fn)(qs, ks_, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_local_attention_flash_partitioned_grads_match():
    q, k, v = _qkv(jax.random.key(1))

    def loss(q, k, v):
        o = local_attention_flash(
            q, k, v, window=8, causal=True, use_rotary=False,
            compute_dtype=jnp.float32, interpret=True,
        )
        return jnp.sum(o * o)

    ref_grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)

    mesh = _mesh22()
    sh = NamedSharding(mesh, P("data", "model"))
    qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))
    with jax.set_mesh(mesh):
        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks_, vs)
    for g, r in zip(grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-5
        )


def test_favor_fused_partitioned_matches_unsharded():
    from synthanatomy_tpu.ops.favor import gaussian_orthogonal_random_matrix
    from synthanatomy_tpu.ops.favor_pallas import favor_attention_fused

    q, k, v = _qkv(jax.random.key(2), n=16)
    proj = gaussian_orthogonal_random_matrix(jax.random.key(3), 16, 8)

    def loss(q, k, v):
        o = favor_attention_fused(q, k, v, proj, 8, True)
        return jnp.sum(o * o)

    fn = functools.partial(favor_attention_fused, chunk=8, interpret=True)
    ref = jax.jit(lambda a, b, c: fn(a, b, c, proj))(q, k, v)
    ref_grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)

    mesh = _mesh22()
    sh = NamedSharding(mesh, P("data", "model"))
    qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))
    with jax.set_mesh(mesh):
        out = jax.jit(lambda a, b, c: fn(a, b, c, proj))(qs, ks_, vs)
        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks_, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    for g, r in zip(grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-5
        )


def test_gspmd_dp_tp_step_with_pallas_kernels(monkeypatch):
    """Full GSPMD DP×TP train step with BOTH kernel families active
    (interpret mode): loss parity vs the XLA-attention step on the same
    sharded state."""
    import synthanatomy_tpu.models.performer as MP
    import synthanatomy_tpu.ops.favor_pallas as FP
    from synthanatomy_tpu.models.performer import Performer
    from synthanatomy_tpu.parallel.mesh import shard_batch
    from synthanatomy_tpu.parallel.sharding_rules import shard_transformer_state
    from synthanatomy_tpu.train.transformer_steps import (
        create_transformer_train_state,
        make_transformer_train_step,
    )

    orig_flash = MP.local_attention_flash
    monkeypatch.setattr(
        MP, "local_attention_flash",
        lambda *a, **kw: orig_flash(*a, **{**kw, "interpret": True}),
    )
    monkeypatch.setattr(MP, "_on_tpu_default_device", lambda: True)
    orig_fused = FP.favor_attention_fused
    monkeypatch.setattr(
        FP, "favor_attention_fused",
        lambda q, k, v, p, chunk=256, interpret=False: orig_fused(
            q, k, v, p, chunk, True
        ),
    )

    def build(use_pallas):
        return Performer(
            num_tokens=17, max_seq_len=32, dim=32, depth=2, heads=4,
            dim_head=8, local_attn_heads=2, local_window_size=8,
            nb_features=8, dtype=jnp.float32, scan_chunk=8,
            attn_compute_dtype=jnp.float32,
            use_pallas_local=use_pallas, use_pallas_favor=use_pallas,
        )

    model_k = build(True)
    model_x = build(False)
    state, tx = create_transformer_train_state(
        model_k, jax.random.key(0), 32, learning_rate=1e-3
    )
    rng = np.random.default_rng(5)
    inputs = rng.integers(0, 16, (4, 32)).astype(np.int32)
    targets = rng.integers(0, 16, (4, 32)).astype(np.int32)

    mesh = _mesh22()
    sstate = shard_transformer_state(mesh, tx, state)
    with jax.set_mesh(mesh):
        xi = shard_batch(mesh, inputs)
        xt = shard_batch(mesh, targets)
        _, mk = jax.jit(make_transformer_train_step(model_k, tx))(
            sstate, xi, xt, None, {"lr": 1e-3}
        )
        _, mx = jax.jit(make_transformer_train_step(model_x, tx))(
            sstate, xi, xt, None, {"lr": 1e-3}
        )
    np.testing.assert_allclose(
        float(mk["Loss"]), float(mx["Loss"]), rtol=1e-5
    )


# ---------------------------------------------------------------------
# fused residual layer (ops/res_stack_pallas.py): batch-only sharding,
# weight/bias grads psum'd by the lowering (summed_resnums)
# ---------------------------------------------------------------------

from synthanatomy_tpu.ops.res_stack_pallas import (
    fused_residual_layer,
    supports_fused_residual,
)


def _res_args(seed=0, b=8):
    rng = np.random.default_rng(seed)
    c = r = 128
    x = jnp.asarray(rng.normal(size=(b, 8, 8, 16, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, c, r)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(r,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(r, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    assert supports_fused_residual(x.shape, r)
    return x, w1, b1, w2, b2


def test_fused_residual_partitioned_matches_unsharded():
    args = _res_args()
    fn = lambda *a: fused_residual_layer(*a, True)
    ref = jax.jit(fn)(*args)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    xs = jax.device_put(args[0], NamedSharding(mesh, P("data")))
    ws = [jax.device_put(a, NamedSharding(mesh, P())) for a in args[1:]]
    with jax.set_mesh(mesh):
        out = jax.jit(fn)(xs, *ws)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
    )


def test_fused_residual_partitioned_grads_match():
    args = _res_args(seed=1)

    def loss(*a):
        o = fused_residual_layer(*a, True)
        return jnp.sum(o * o)

    ref_grads = jax.jit(jax.grad(loss, argnums=tuple(range(5))))(*args)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    xs = jax.device_put(args[0], NamedSharding(mesh, P("data")))
    ws = [jax.device_put(a, NamedSharding(mesh, P())) for a in args[1:]]
    with jax.set_mesh(mesh):
        grads = jax.jit(jax.grad(loss, argnums=tuple(range(5))))(xs, *ws)
    for g_ref, g in zip(ref_grads, grads):
        g_ref, g = np.asarray(g_ref), np.asarray(g)
        scale = np.abs(g_ref).max() + 1e-6
        # weight grads cross a psum: per-shard partial-sum order differs
        # from the unsharded accumulation order (f32 ulp-scale)
        assert np.abs(g - g_ref).max() <= 1e-4 * scale

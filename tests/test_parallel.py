import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from synthanatomy_tpu.models.performer import Performer
from synthanatomy_tpu.models.vqvae import BaselineVQVAE
from synthanatomy_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from synthanatomy_tpu.parallel.sharding_rules import param_shardings, shard_params
from synthanatomy_tpu.train.transformer_steps import (
    create_transformer_train_state,
    make_transformer_train_step,
)
from synthanatomy_tpu.train.vqvae_steps import (
    create_vqvae_train_state,
    make_vqvae_train_step,
)


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    mesh2 = make_mesh((2, 4))
    assert mesh2.shape == {"data": 2, "model": 4}
    # a smaller explicit mesh uses the leading devices (debug meshes)
    mesh3 = make_mesh((3, 2))
    assert mesh3.shape == {"data": 3, "model": 2}
    # over-subscription still raises
    with pytest.raises(ValueError):
        make_mesh((3, 3))


def test_vqvae_dp_train_step_sharded_equals_single_device():
    """The full adversarial-free VQVAE train step under an 8-way data
    mesh must match the unsharded result (gradient + EMA psum
    correctness)."""
    model = BaselineVQVAE(
        n_levels=1,
        downsample_parameters=((4, 2, 1, 1),),
        upsample_parameters=((4, 2, 1, 0, 1),),
        n_embed=8, embed_dim=4, n_channels=4, n_res_channels=4,
        n_res_layers=1, dtype=jnp.float32, use_pallas_vq=False,
    )
    state, g_tx, _ = create_vqvae_train_state(model, jax.random.key(0), (8, 8, 8))
    step = make_vqvae_train_step(model, g_tx, loss_name="mse")
    sched = {"lr": 1e-3, "d_lr": 0, "decay": 0.5, "commitment_cost": 0.25,
             "gdl_factor": 0.0, "epoch": 0}
    x = jax.random.uniform(jax.random.key(1), (8, 8, 8, 8, 1))

    ref_state, ref_metrics = jax.jit(step)(state, x, sched)

    mesh = make_mesh()
    xs = jax.device_put(x, data_sharding(mesh, x.ndim))
    state_s = jax.device_put(state, replicated(mesh))
    with jax.set_mesh(mesh):
        out_state, out_metrics = jax.jit(step)(state_s, xs, sched)

    np.testing.assert_allclose(
        float(out_metrics["Loss-MSE-Reconstruction"]),
        float(ref_metrics["Loss-MSE-Reconstruction"]),
        rtol=1e-5,
    )
    ref_cb = np.asarray(ref_state.vq["level_0"].codebook)
    out_cb = np.asarray(out_state.vq["level_0"].codebook)
    np.testing.assert_allclose(out_cb, ref_cb, rtol=1e-4, atol=1e-5)


def test_performer_tp_dp_train_step():
    """Transformer train step over a 2(data)×4(model) mesh with real
    Megatron-style parameter shardings compiles, runs and matches the
    single-device step."""
    model = Performer(
        num_tokens=9, max_seq_len=16, dim=16, depth=2, heads=4, dim_head=4,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    state, tx = create_transformer_train_state(
        model, jax.random.key(0), 16, learning_rate=1e-3
    )
    step = make_transformer_train_step(model, tx)
    inputs = jax.random.randint(jax.random.key(1), (8, 16), 0, 8)
    targets = jax.random.randint(jax.random.key(2), (8, 16), 0, 8)

    ref_state, ref_metrics = jax.jit(step)(state, inputs, targets, None, {"lr": 1e-3})

    mesh = make_mesh((2, 4))
    shardings = param_shardings(mesh, state.params)
    # at least the attention/ff kernels must actually be sharded
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    sharded_paths = [
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, s in flat
        if s.spec != P()
    ]
    assert any("to_q/kernel" in p for p in sharded_paths)
    assert any("ff/w1/kernel" in p for p in sharded_paths)

    state_s = state.replace(
        params=shard_params(mesh, state.params),
        favor=jax.device_put(state.favor, replicated(mesh)),
        opt_state=jax.device_put(state.opt_state, replicated(mesh)),
        step=jax.device_put(state.step, replicated(mesh)),
        rng=jax.device_put(state.rng, replicated(mesh)),
    )
    xi = jax.device_put(inputs, data_sharding(mesh, 2))
    xt = jax.device_put(targets, data_sharding(mesh, 2))
    with jax.set_mesh(mesh):
        out_state, out_metrics = jax.jit(step)(state_s, xi, xt, None, {"lr": 1e-3})

    np.testing.assert_allclose(
        float(out_metrics["Loss"]), float(ref_metrics["Loss"]), rtol=1e-4
    )
    # updated params equal the single-device update
    a = np.asarray(jax.device_get(out_state.params["block_0"]["attn"]["to_q"]["kernel"]))
    b = np.asarray(ref_state.params["block_0"]["attn"]["to_q"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    batch = {"MRI": np.zeros((8, 4, 4, 4, 1), np.float32)}
    out = shard_batch(mesh, batch)
    assert out["MRI"].sharding.spec == P("data", None, None, None, None)


def test_favor_sequence_parallel_matches_single_device():
    """Sequence-sharded FAVOR+ (context parallelism over the prefix
    state) must equal single-device causal attention."""
    from jax.sharding import NamedSharding
    from jax.experimental.shard_map import shard_map

    from synthanatomy_tpu.ops.favor import (
        favor_attention,
        favor_attention_sequence_parallel,
        gaussian_orthogonal_random_matrix,
    )

    b, h, n, d, m = 2, 2, 64, 8, 16
    q, k, v = jax.random.normal(jax.random.key(0), (3, b, h, n, d))
    proj = gaussian_orthogonal_random_matrix(jax.random.key(1), m, d)

    ref = np.asarray(favor_attention(q, k, v, proj, causal=True, chunk=8))

    mesh = make_mesh((4,), ("seq",), devices=jax.devices()[:4])
    spec = P(None, None, "seq", None)

    sp_fn = shard_map(
        lambda q, k, v, proj: favor_attention_sequence_parallel(
            q, k, v, proj, axis_name="seq", chunk=8
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None, None)),
        out_specs=spec,
    )
    out = np.asarray(jax.jit(sp_fn)(q, k, v, proj))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_favor_sequence_parallel_no_projection_matches_single_device():
    """no_projection mode must use the same feature maps (softmax-q /
    exp-k) in the sequence-parallel path as in the batch path."""
    from jax.experimental.shard_map import shard_map

    from synthanatomy_tpu.ops.favor import (
        favor_attention,
        favor_attention_sequence_parallel,
    )

    b, h, n, d = 2, 2, 64, 8
    q, k, v = jax.random.normal(jax.random.key(2), (3, b, h, n, d))

    ref = np.asarray(favor_attention(q, k, v, None, causal=True, chunk=8))

    mesh = make_mesh((4,), ("seq",), devices=jax.devices()[:4])
    spec = P(None, None, "seq", None)
    sp_fn = shard_map(
        lambda q, k, v: favor_attention_sequence_parallel(
            q, k, v, None, axis_name="seq", chunk=8
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    out = np.asarray(jax.jit(sp_fn)(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_zero1_optimizer_sharding_matches_replicated():
    """ZeRO-1 sharded optimizer state must produce the same update as
    fully replicated state."""
    from synthanatomy_tpu.parallel.sharding_rules import shard_opt_state_zero1

    model = Performer(
        num_tokens=9, max_seq_len=16, dim=16, depth=1, heads=2, dim_head=8,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    state, tx = create_transformer_train_state(
        model, jax.random.key(0), 16, learning_rate=1e-3
    )
    step = make_transformer_train_step(model, tx)
    inputs = jax.random.randint(jax.random.key(1), (8, 16), 0, 8)
    targets = jax.random.randint(jax.random.key(2), (8, 16), 0, 8)

    ref_state, _ = jax.jit(step)(state, inputs, targets, None, {"lr": 1e-3})

    mesh = make_mesh((8,), ("data",))
    sharded = state.replace(
        params=jax.device_put(state.params, replicated(mesh)),
        favor=jax.device_put(state.favor, replicated(mesh)),
        opt_state=shard_opt_state_zero1(mesh, state.opt_state),
        step=jax.device_put(state.step, replicated(mesh)),
        rng=jax.device_put(state.rng, replicated(mesh)),
    )
    xi = jax.device_put(inputs, data_sharding(mesh, 2))
    xt = jax.device_put(targets, data_sharding(mesh, 2))
    with jax.set_mesh(mesh):
        out_state, _ = jax.jit(step)(sharded, xi, xt, None, {"lr": 1e-3})

    a = np.asarray(jax.device_get(out_state.params["token_emb"]["embedding"]))
    b = np.asarray(ref_state.params["token_emb"]["embedding"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    # the updated moments must STAY sharded (ZeRO-1's whole point is
    # the per-device memory saving); a step that gathers them back to
    # replicated would silently defeat the feature
    moment_leaves = [
        leaf for leaf in jax.tree.leaves(out_state.opt_state)
        if hasattr(leaf, "sharding") and leaf.ndim >= 1 and leaf.size > 8
    ]
    assert moment_leaves
    assert any(not leaf.sharding.is_fully_replicated for leaf in moment_leaves)


def test_local_attention_sequence_parallel_matches_single_device():
    """Halo-exchange context parallelism for the local heads must equal
    single-device blocked local attention."""
    from jax.experimental.shard_map import shard_map

    from synthanatomy_tpu.ops.local_attention import (
        local_attention,
        local_attention_sequence_parallel,
    )

    b, h, n, d, w = 2, 2, 64, 8, 8
    q, k, v = jax.random.normal(jax.random.key(0), (3, b, h, n, d))
    ref = np.asarray(local_attention(q, k, v, window=w, use_rotary=True))

    mesh = make_mesh((4,), ("seq",), devices=jax.devices()[:4])
    spec = P(None, None, "seq", None)
    sp_fn = shard_map(
        lambda q, k, v: local_attention_sequence_parallel(
            q, k, v, window=w, axis_name="seq"
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    out = np.asarray(jax.jit(sp_fn)(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# pipeline parallelism (GPipe fill-drain under shard_map)
# ---------------------------------------------------------------------------


def _pp_setup():
    from jax.sharding import Mesh

    model = Performer(
        num_tokens=17, max_seq_len=24, dim=32, depth=4, heads=2,
        dim_head=8, local_attn_heads=1, local_window_size=6,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 16, (8, 20)), jnp.int32
    )
    variables = model.init(
        {"params": jax.random.key(0), "favor": jax.random.key(1)}, x
    )
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("pipe",))
    return model, variables, x, mesh


def test_pipeline_parallel_forward_matches_sequential():
    from synthanatomy_tpu.parallel.pipeline_parallel import (
        make_pipelined_apply,
        stack_block_params,
    )

    model, variables, x, mesh = _pp_setup()
    ref = np.asarray(model.apply(variables, x))

    stacked_p, stacked_f = stack_block_params(model, variables)
    pp_apply = jax.jit(make_pipelined_apply(model, mesh, n_microbatches=4))
    out = np.asarray(pp_apply(variables, stacked_p, stacked_f, x))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_pipeline_parallel_grads_match_sequential():
    from synthanatomy_tpu.parallel.pipeline_parallel import (
        make_pipelined_apply,
        stack_block_params,
    )

    model, variables, x, mesh = _pp_setup()
    stacked_p, stacked_f = stack_block_params(model, variables)
    pp_apply = make_pipelined_apply(model, mesh, n_microbatches=4)

    def loss_pp(sp):
        return jnp.mean(
            pp_apply(variables, sp, stacked_f, x).astype(jnp.float32) ** 2
        )

    def loss_seq(sp):
        # rebuild per-block variables from the stacked tree
        v = {"params": dict(variables["params"]), "favor": dict(variables["favor"])}
        for i in range(model.depth):
            v["params"][f"block_{i}"] = jax.tree.map(lambda a: a[i], sp)
        return jnp.mean(model.apply(v, x).astype(jnp.float32) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(stacked_p)
    g_seq = jax.jit(jax.grad(loss_seq))(stacked_p)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_pp_train_step_matches_single_device():
    """Full PP TRAINING step (packed stacked-block state, GPipe apply,
    optimizer): loss and unpacked params must match the standard
    single-device step; pack/unpack must round-trip exactly."""
    import optax

    from synthanatomy_tpu.parallel.pipeline_parallel import (
        make_pp_train_step,
        pack_pp_state,
        unpack_pp_state,
    )

    model, variables, x, mesh = _pp_setup()
    state, _ = create_transformer_train_state(
        model, jax.random.key(3), 24, learning_rate=1e-3
    )
    # SGD pins gradient parity tightly (see the SP tests' rationale)
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    targets = jnp.asarray(
        np.random.default_rng(1).integers(0, 16, x.shape), jnp.int32
    )

    ref_step = make_transformer_train_step(model, tx)
    ref_state, ref_metrics = jax.jit(ref_step)(
        state, x, targets, None, {"lr": 1e-3}
    )

    packed = pack_pp_state(model, state)
    # round trip is exact
    rt = unpack_pp_state(model, packed)
    for field in ("params", "favor", "opt_state"):
        for a, b in zip(
            jax.tree.leaves(getattr(rt, field)),
            jax.tree.leaves(getattr(state, field)),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    pp_step = make_pp_train_step(model, tx, mesh, n_microbatches=4)
    pp_state, pp_metrics = jax.jit(pp_step)(packed, x, targets, {"lr": 1e-3})
    np.testing.assert_allclose(
        float(pp_metrics["Loss"]), float(ref_metrics["Loss"]), rtol=1e-5
    )
    unpacked = unpack_pp_state(model, pp_state)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(unpacked.params),
        jax.tree_util.tree_leaves_with_path(ref_state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=str(pa),
        )


def test_pp_x_dp_train_step_matches_single_device():
    """PP×DP: depth over 'pipe', batch over 'data' — one jitted SPMD
    program; loss parity vs the single-device step."""
    import optax
    from jax.sharding import Mesh

    from synthanatomy_tpu.parallel.pipeline_parallel import (
        make_pp_train_step,
        pack_pp_state,
    )

    model, variables, x, mesh1d = _pp_setup()
    state, _ = create_transformer_train_state(
        model, jax.random.key(3), 24, learning_rate=1e-3
    )
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    targets = jnp.asarray(
        np.random.default_rng(2).integers(0, 16, x.shape), jnp.int32
    )
    ref_step = make_transformer_train_step(model, tx)
    _, ref_metrics = jax.jit(ref_step)(state, x, targets, None, {"lr": 1e-3})

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("pipe", "data"))
    pp_step = make_pp_train_step(
        model, tx, mesh, n_microbatches=4, data_axis="data"
    )
    packed = pack_pp_state(model, state)
    _, pp_metrics = jax.jit(pp_step)(packed, x, targets, {"lr": 1e-3})
    np.testing.assert_allclose(
        float(pp_metrics["Loss"]), float(ref_metrics["Loss"]), rtol=1e-5
    )


def test_pipeline_parallel_bad_shapes_raise():
    from synthanatomy_tpu.parallel.pipeline_parallel import (
        make_pipelined_apply,
        stack_block_params,
    )

    model, variables, x, mesh = _pp_setup()
    stacked_p, stacked_f = stack_block_params(model, variables)
    with pytest.raises(ValueError, match="microbatches"):
        make_pipelined_apply(model, mesh, n_microbatches=3)(
            variables, stacked_p, stacked_f, x
        )
    model5 = Performer(
        num_tokens=17, max_seq_len=24, dim=32, depth=5, heads=2,
        dim_head=8, nb_features=8, dtype=jnp.float32,
    )
    with pytest.raises(ValueError, match="stages"):
        make_pipelined_apply(model5, mesh)


def test_transformer_shard_map_dp_step_matches_gspmd():
    """The shard_map DP train step (explicit pmean; the path that keeps
    Pallas kernels usable multi-chip) must match the single-device /
    GSPMD step exactly up to fp tolerance."""
    from synthanatomy_tpu.train.transformer_steps import (
        make_transformer_train_step_dp,
    )

    model = Performer(
        num_tokens=9, max_seq_len=16, dim=16, depth=2, heads=4, dim_head=4,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    state, tx = create_transformer_train_state(
        model, jax.random.key(0), 16, learning_rate=1e-3
    )
    inputs = jax.random.randint(jax.random.key(1), (8, 16), 0, 8)
    targets = jax.random.randint(jax.random.key(2), (8, 16), 0, 8)

    step = make_transformer_train_step(model, tx)
    ref_state, ref_metrics = jax.jit(step)(
        state, inputs, targets, None, {"lr": 1e-3}
    )

    mesh = make_mesh((8,), ("data",))
    dp_step = make_transformer_train_step_dp(model, tx, mesh)
    state_r = jax.device_put(state, replicated(mesh))
    xi = jax.device_put(inputs, data_sharding(mesh, 2))
    xt = jax.device_put(targets, data_sharding(mesh, 2))
    out_state, out_metrics = jax.jit(dp_step)(
        state_r, xi, xt, None, {"lr": 1e-3}
    )

    np.testing.assert_allclose(
        float(out_metrics["Loss"]), float(ref_metrics["Loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(out_state.params), jax.tree.leaves(ref_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_sequence_parallel_train_step_matches_single_device():
    """Full SP train step (sequence sharded over 4 devices, FAVOR
    prefix-state all_gather + local halo exchange + psum grads) must
    match the standard single-device step: loss and updated params."""
    from jax.sharding import Mesh

    from synthanatomy_tpu.parallel.sequence_parallel import make_sp_train_step

    seq = 32  # 4 shards × window 8
    model = Performer(
        num_tokens=17, max_seq_len=seq, dim=32, depth=2, heads=4,
        dim_head=8, local_attn_heads=2, local_window_size=8,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    state, _ = create_transformer_train_state(
        model, jax.random.key(0), seq, learning_rate=1e-3
    )
    # SGD instead of Adam: the params delta then IS the gradient
    # (times lr), so the comparison pins gradient parity tightly
    # without Adam's rsqrt amplifying fp reduction-order noise
    import optax

    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    rng = np.random.default_rng(3)
    inputs = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)

    ref_step = make_transformer_train_step(model, tx)
    ref_state, ref_metrics = jax.jit(ref_step)(
        state, inputs, targets, None, {"lr": 1e-3}
    )

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("seq",))
    sp_step = make_sp_train_step(model, tx, mesh, seq)
    sp_state, sp_metrics = jax.jit(sp_step)(
        state, inputs, targets, {"lr": 1e-3}
    )

    np.testing.assert_allclose(
        float(sp_metrics["Loss"]), float(ref_metrics["Loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(sp_state.params), jax.tree.leaves(ref_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_sequence_parallel_train_step_with_padding():
    """Unaligned sequence length: right-padding + CE mask must leave
    the loss identical to the unpadded single-device step."""
    from jax.sharding import Mesh

    from synthanatomy_tpu.parallel.sequence_parallel import make_sp_train_step

    seq = 27  # pads to 32 over 4 shards × window 8
    model = Performer(
        num_tokens=17, max_seq_len=40, dim=32, depth=2, heads=4,
        dim_head=8, local_attn_heads=2, local_window_size=8,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    state, tx = create_transformer_train_state(
        model, jax.random.key(0), 40, learning_rate=1e-3
    )
    rng = np.random.default_rng(5)
    inputs = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)

    ref_step = make_transformer_train_step(model, tx)
    _, ref_metrics = jax.jit(ref_step)(
        state, inputs, targets, None, {"lr": 1e-3}
    )

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("seq",))
    sp_step = make_sp_train_step(model, tx, mesh, seq)
    _, sp_metrics = jax.jit(sp_step)(state, inputs, targets, {"lr": 1e-3})
    np.testing.assert_allclose(
        float(sp_metrics["Loss"]), float(ref_metrics["Loss"]), rtol=1e-5
    )


@pytest.mark.parametrize("pos_mode", ["absolute", "fixed"])
def test_sequence_parallel_canonical_seq_len(pos_mode):
    """Alignment padding beyond the model's canonical max_seq_len: the
    positional tables are zero-extended on the fly (pad positions are
    loss-masked and causally invisible), so the CANONICAL model — same
    checkpoint shapes as single-device training — trains under SP.
    Pins loss AND gradient parity (SGD) vs the single-device step.

    This is the paper geometry in miniature: L=1400/window 420 aligns
    to 1680 > max_seq_len 1401 at 2 shards."""
    from jax.sharding import Mesh

    from synthanatomy_tpu.parallel.sequence_parallel import make_sp_train_step

    seq = 27  # aligns to 32 over 4 shards × window 8 > max_seq_len 28
    model = Performer(
        num_tokens=17, max_seq_len=seq + 1, dim=32, depth=2, heads=4,
        dim_head=8, local_attn_heads=2, local_window_size=8,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
        fixed_position_emb=(pos_mode == "fixed"),
    )
    state, _ = create_transformer_train_state(
        model, jax.random.key(0), seq + 1, learning_rate=1e-3
    )
    import optax

    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    rng = np.random.default_rng(11)
    inputs = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)

    ref_step = make_transformer_train_step(model, tx)
    ref_state, ref_metrics = jax.jit(ref_step)(
        state, inputs, targets, None, {"lr": 1e-3}
    )

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("seq",))
    sp_step = make_sp_train_step(model, tx, mesh, seq)
    sp_state, sp_metrics = jax.jit(sp_step)(state, inputs, targets, {"lr": 1e-3})
    np.testing.assert_allclose(
        float(sp_metrics["Loss"]), float(ref_metrics["Loss"]), rtol=1e-5
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(sp_state.params),
        jax.tree_util.tree_leaves_with_path(ref_state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
            err_msg=str(pa),
        )


def test_sequence_parallel_paper_config_features():
    """The PAPER transformer config (reference README.md:140-141) uses
    use_rezero=True and spatial_position_emb='absolute'.  The absolute
    spatial tables are PARAMS — the SP step looks them up inside the
    loss from static per-shard coordinate indices, so the exact paper
    feature set trains under SP: pin loss AND gradient parity (SGD)
    vs the single-device step."""
    from jax.sharding import Mesh

    from synthanatomy_tpu.models.ordering import Ordering
    from synthanatomy_tpu.parallel.sequence_parallel import make_sp_train_step

    shape = (2, 4, 4)  # 32 tokens = 4 shards × window 8
    seq = int(np.prod(shape))
    ordering = Ordering("raster_scan", 3, shape)
    model = Performer(
        num_tokens=17, max_seq_len=seq + 1, dim=32, depth=2, heads=4,
        dim_head=8, local_attn_heads=2, local_window_size=8,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
        use_rezero=True,
        spatial_position_emb="absolute", spatial_shape=shape,
        ordering=ordering,
    )
    state, _ = create_transformer_train_state(
        model, jax.random.key(0), seq + 1, learning_rate=1e-3
    )
    import optax

    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    rng = np.random.default_rng(13)
    inputs = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)

    ref_step = make_transformer_train_step(model, tx)
    ref_state, ref_metrics = jax.jit(ref_step)(
        state, inputs, targets, None, {"lr": 1e-3}
    )

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("seq",))
    sp_step = make_sp_train_step(model, tx, mesh, seq)
    sp_state, sp_metrics = jax.jit(sp_step)(state, inputs, targets, {"lr": 1e-3})
    np.testing.assert_allclose(
        float(sp_metrics["Loss"]), float(ref_metrics["Loss"]), rtol=1e-5
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(sp_state.params),
        jax.tree_util.tree_leaves_with_path(ref_state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
            err_msg=str(pa),
        )


def test_sequence_parallel_full_max_seq_len_spatial_rows():
    """Regression: with seq_len = L_grid + 1 (the model's full
    max_seq_len — reachable through the direct API), the LAST input
    position must get the zero spatial row like _spatial_pos_sum
    (which embeds seq[:-1]), not the last grid cell's embedding."""
    from jax.sharding import Mesh

    from synthanatomy_tpu.models.ordering import Ordering
    from synthanatomy_tpu.parallel.sequence_parallel import make_sp_train_step

    shape = (2, 4, 4)
    seq = int(np.prod(shape))
    ordering = Ordering("raster_scan", 3, shape)
    model = Performer(
        num_tokens=17, max_seq_len=seq + 1, dim=32, depth=2, heads=4,
        dim_head=8, local_attn_heads=2, local_window_size=8,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
        use_rezero=True,
        spatial_position_emb="absolute", spatial_shape=shape,
        ordering=ordering,
    )
    state, _ = create_transformer_train_state(
        model, jax.random.key(0), seq + 1, learning_rate=1e-3
    )
    import optax

    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    rng = np.random.default_rng(29)
    inputs = jnp.asarray(rng.integers(0, 16, (2, seq + 1)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 16, (2, seq + 1)), jnp.int32)

    ref_step = make_transformer_train_step(model, tx)
    ref_state, ref_metrics = jax.jit(ref_step)(
        state, inputs, targets, None, {"lr": 1e-3}
    )

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("seq",))
    sp_step = make_sp_train_step(model, tx, mesh, seq + 1)
    sp_state, sp_metrics = jax.jit(sp_step)(state, inputs, targets, {"lr": 1e-3})
    np.testing.assert_allclose(
        float(sp_metrics["Loss"]), float(ref_metrics["Loss"]), rtol=1e-5
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(sp_state.params),
        jax.tree_util.tree_leaves_with_path(ref_state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
            err_msg=str(pa),
        )


def test_dp_x_sp_train_step_matches_single_device():
    """2-D DP×SP mesh (batch AND sequence sharded): gradients reduce
    over both axes and must match the single-device step."""
    from jax.sharding import Mesh

    from synthanatomy_tpu.parallel.sequence_parallel import make_sp_train_step

    seq = 16  # 2 seq-shards × window 8
    model = Performer(
        num_tokens=17, max_seq_len=seq, dim=32, depth=2, heads=4,
        dim_head=8, local_attn_heads=2, local_window_size=8,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    state, _ = create_transformer_train_state(
        model, jax.random.key(0), seq, learning_rate=1e-3
    )
    import optax

    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    rng = np.random.default_rng(7)
    inputs = jnp.asarray(rng.integers(0, 16, (4, seq)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 16, (4, seq)), jnp.int32)

    ref_step = make_transformer_train_step(model, tx)
    ref_state, ref_metrics = jax.jit(ref_step)(
        state, inputs, targets, None, {"lr": 1e-3}
    )

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("data", "seq"))
    sp_step = make_sp_train_step(model, tx, mesh, seq, data_axis="data")
    sp_state, sp_metrics = jax.jit(sp_step)(
        state, inputs, targets, {"lr": 1e-3}
    )
    np.testing.assert_allclose(
        float(sp_metrics["Loss"]), float(ref_metrics["Loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(sp_state.params), jax.tree.leaves(ref_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


@pytest.mark.parametrize("cond_type", ["bos_replacement", "prepending"])
def test_sequence_parallel_conditioning_matches_single_device(cond_type):
    """SP train step WITH conditioning (both reference injection modes,
    performer.py:252-264): loss and gradient parity vs the
    single-device step.  bos_replacement touches only shard 0's global
    position 0; prepending extends the global sequence by k prefix
    rows owned by shard 0."""
    import optax
    from jax.sharding import Mesh

    from synthanatomy_tpu.parallel.sequence_parallel import make_sp_train_step

    seq = 27 if cond_type == "prepending" else 32  # prepending: 27+2 → pads to 32
    model = Performer(
        num_tokens=17, max_seq_len=40, dim=32, depth=2, heads=4,
        dim_head=8, local_attn_heads=2, local_window_size=8,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
        conditioning_num_tokens=(5, 3), conditioning_type=cond_type,
    )
    conds = [
        jnp.asarray([1, 4], jnp.int32),
        jnp.asarray([2, 0], jnp.int32),
    ]
    state, _ = create_transformer_train_state(
        model, jax.random.key(0), 40, learning_rate=1e-3,
        conditionings=[c[:1] for c in conds],
    )
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    rng = np.random.default_rng(11)
    inputs = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)

    ref_step = make_transformer_train_step(model, tx)
    ref_state, ref_metrics = jax.jit(ref_step)(
        state, inputs, targets, conds, {"lr": 1e-3}
    )

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("seq",))
    sp_step = make_sp_train_step(model, tx, mesh, seq)
    sp_state, sp_metrics = jax.jit(sp_step)(
        state, inputs, targets, {"lr": 1e-3}, conds
    )

    np.testing.assert_allclose(
        float(sp_metrics["Loss"]), float(ref_metrics["Loss"]), rtol=1e-5
    )
    ref_leaves = jax.tree.leaves_with_path(ref_state.params)
    sp_leaves = dict(jax.tree.leaves_with_path(sp_state.params))
    for path, ref_leaf in ref_leaves:
        np.testing.assert_allclose(
            np.asarray(sp_leaves[path]), np.asarray(ref_leaf),
            rtol=1e-5, atol=1e-7, err_msg=jax.tree_util.keystr(path),
        )


def test_sequence_parallel_missing_conds_raises():
    from jax.sharding import Mesh

    from synthanatomy_tpu.parallel.sequence_parallel import make_sp_train_step

    model = Performer(
        num_tokens=17, max_seq_len=32, dim=32, depth=1, heads=2,
        dim_head=8, nb_features=8, dtype=jnp.float32, scan_chunk=8,
        conditioning_num_tokens=(5,), conditioning_type="bos_replacement",
    )
    state, tx = create_transformer_train_state(
        model, jax.random.key(0), 32,
        conditionings=[jnp.asarray([1], jnp.int32)],
    )
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("seq",))
    step = make_sp_train_step(model, tx, mesh, 32)
    inputs = jnp.zeros((2, 32), jnp.int32)
    with pytest.raises(ValueError, match="conds missing"):
        step(state, inputs, inputs, {"lr": 1e-3})


def test_sequence_parallel_dropout_raises():
    """Dropout would be silently deterministic under the SP step —
    guard with an explicit error instead."""
    from jax.sharding import Mesh

    from synthanatomy_tpu.parallel.sequence_parallel import make_sp_train_step

    model = Performer(
        num_tokens=17, max_seq_len=32, dim=32, depth=1, heads=2,
        dim_head=8, nb_features=8, dtype=jnp.float32, scan_chunk=8,
        ff_dropout=0.1,
    )
    state, tx = create_transformer_train_state(model, jax.random.key(0), 32)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("seq",))
    with pytest.raises(NotImplementedError, match="dropout"):
        make_sp_train_step(model, tx, mesh, 32)


def test_pipeline_parallel_with_data_axis():
    """PP×DP: 2×2 (pipe, data) mesh — microbatch rows shard over the
    data axis while the fill-drain schedule runs over the pipe axis."""
    from jax.sharding import Mesh

    from synthanatomy_tpu.parallel.pipeline_parallel import (
        make_pipelined_apply,
        stack_block_params,
    )

    model = Performer(
        num_tokens=17, max_seq_len=24, dim=32, depth=2, heads=2,
        dim_head=8, local_attn_heads=1, local_window_size=6,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 16, (8, 20)), jnp.int32
    )
    variables = model.init(
        {"params": jax.random.key(0), "favor": jax.random.key(1)}, x
    )
    ref = np.asarray(model.apply(variables, x))

    stacked_p, stacked_f = stack_block_params(model, variables)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("pipe", "data"))
    pp_apply = jax.jit(
        make_pipelined_apply(
            model, mesh, n_microbatches=2, data_axis="data"
        )
    )
    out = np.asarray(pp_apply(variables, stacked_p, stacked_f, x))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_tensor_parallel_train_step_matches_single_device():
    """Manual Megatron TP step (head-packed params, f/g conjugate
    collectives, sharded Adam) vs the single-device step: loss and
    updated params (round-tripped through unpack) must match."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P2

    from synthanatomy_tpu.parallel.tensor_parallel import (
        make_tp_train_step,
        pack_tp_params,
        tp_param_specs,
        unpack_tp_params,
    )

    seq = 24
    model = Performer(
        num_tokens=17, max_seq_len=seq, dim=32, depth=2, heads=4,
        dim_head=8, local_attn_heads=2, local_window_size=8,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    state, _ = create_transformer_train_state(
        model, jax.random.key(0), seq, learning_rate=1e-3
    )
    import optax

    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    rng = np.random.default_rng(11)
    inputs = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)

    ref_step = make_transformer_train_step(model, tx)
    ref_state, ref_metrics = jax.jit(ref_step)(
        state, inputs, targets, None, {"lr": 1e-3}
    )

    n_sh = 2
    mesh = Mesh(np.asarray(jax.devices()[:n_sh]).reshape(n_sh), ("model",))
    packed = pack_tp_params(model, state.params, n_sh)
    specs = tp_param_specs(packed)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    packed = jax.device_put(packed, shardings)
    tp_state = state.replace(
        params=packed,
        opt_state=jax.tree.map(lambda x: x, tx.init(packed)),
    )
    tp_step = make_tp_train_step(model, tx, mesh)
    tp_state2, tp_metrics = jax.jit(tp_step)(
        tp_state, inputs, targets, {"lr": 1e-3}
    )

    np.testing.assert_allclose(
        float(tp_metrics["Loss"]), float(ref_metrics["Loss"]), rtol=1e-5
    )
    unpacked = unpack_tp_params(
        model, jax.device_get(tp_state2.params), n_sh
    )
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_state.params)
    got_leaves = jax.tree_util.tree_leaves_with_path(unpacked)
    for (pa, a), (pb, b) in zip(got_leaves, ref_leaves):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_tensor_parallel_paper_config_features():
    """The PAPER transformer config under the manual Megatron TP step:
    ReZero blocks + learned 'absolute' spatial coordinate tables +
    'bos_replacement' conditioning (reference README.md:140-141,
    performer.py:252-261) — loss and unpacked-param parity (SGD) vs the
    single-device step.  Gains are set nontrivial so gradients reach
    the sharded attention/FF weights."""
    from jax.sharding import Mesh, NamedSharding

    from synthanatomy_tpu.models.ordering import Ordering
    from synthanatomy_tpu.parallel.tensor_parallel import (
        make_tp_train_step,
        pack_tp_params,
        tp_param_specs,
        unpack_tp_params,
    )

    shape = (2, 3, 4)
    seq = int(np.prod(shape))
    ordering = Ordering("raster_scan", 3, shape)
    model = Performer(
        num_tokens=17, max_seq_len=seq + 1, dim=32, depth=2, heads=4,
        dim_head=8, local_attn_heads=2, local_window_size=8,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
        use_rezero=True, spatial_position_emb="absolute",
        spatial_shape=shape, ordering=ordering,
        conditioning_num_tokens=(5,), conditioning_type="bos_replacement",
    )
    conds = [jnp.asarray([1, 3], jnp.int32)]
    state, _ = create_transformer_train_state(
        model, jax.random.key(0), seq, learning_rate=1e-3,
        conditionings=[jnp.zeros((1,), jnp.int32)],
    )
    p = dict(state.params)
    for i in range(2):
        blk = dict(p[f"block_{i}"])
        blk["g_attn"] = jnp.asarray([0.7], jnp.float32)
        blk["g_ff"] = jnp.asarray([0.5], jnp.float32)
        p[f"block_{i}"] = blk
    state = state.replace(params=p)
    import optax

    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    rng = np.random.default_rng(17)
    inputs = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)

    ref_step = make_transformer_train_step(model, tx)
    ref_state, ref_metrics = jax.jit(ref_step)(
        state, inputs, targets, conds, {"lr": 1e-3}
    )

    n_sh = 2
    mesh = Mesh(np.asarray(jax.devices()[:n_sh]).reshape(n_sh), ("model",))
    packed = pack_tp_params(model, state.params, n_sh)
    specs = tp_param_specs(packed)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    packed = jax.device_put(packed, shardings)
    tp_state = state.replace(
        params=packed,
        opt_state=jax.tree.map(lambda x: x, tx.init(packed)),
    )
    tp_step = make_tp_train_step(model, tx, mesh)
    tp_state2, tp_metrics = jax.jit(tp_step)(
        tp_state, inputs, targets, {"lr": 1e-3}, conds
    )

    np.testing.assert_allclose(
        float(tp_metrics["Loss"]), float(ref_metrics["Loss"]), rtol=1e-5
    )
    unpacked = unpack_tp_params(
        model, jax.device_get(tp_state2.params), n_sh
    )
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_state.params)
    got_leaves = jax.tree_util.tree_leaves_with_path(unpacked)
    for (pa, a), (pb, b) in zip(got_leaves, ref_leaves):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa),
        )

    # a conditioned model without conds is a loud error
    with pytest.raises(ValueError, match="conditioning"):
        jax.jit(tp_step)(tp_state, inputs, targets, {"lr": 1e-3})


def test_tp_pack_unpack_roundtrip():
    from synthanatomy_tpu.parallel.tensor_parallel import (
        pack_tp_params,
        unpack_tp_params,
    )

    model = Performer(
        num_tokens=9, max_seq_len=12, dim=16, depth=2, heads=4,
        dim_head=4, local_attn_heads=2, local_window_size=4,
        nb_features=8, dtype=jnp.float32,
    )
    variables = model.init(
        {"params": jax.random.key(0), "favor": jax.random.key(1)},
        jnp.zeros((1, 8), jnp.int32),
    )
    packed = pack_tp_params(model, variables["params"], 2)
    back = unpack_tp_params(model, packed, 2)
    for a, b in zip(
        jax.tree.leaves(back), jax.tree.leaves(variables["params"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_tensor_parallel_step_use_pallas_flag_traces():
    """use_pallas=True must build and run (kernels auto-fall back off
    TPU, so CPU results equal the XLA path)."""
    from jax.sharding import Mesh, NamedSharding

    from synthanatomy_tpu.parallel.tensor_parallel import (
        make_tp_train_step,
        pack_tp_params,
        tp_param_specs,
    )

    seq = 16
    model = Performer(
        num_tokens=17, max_seq_len=seq, dim=32, depth=2, heads=4,
        dim_head=8, local_attn_heads=2, local_window_size=8,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    state, tx = create_transformer_train_state(
        model, jax.random.key(0), seq, learning_rate=1e-3
    )
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("model",))
    packed = pack_tp_params(model, state.params, 2)
    packed = jax.device_put(
        packed,
        jax.tree.map(lambda s: NamedSharding(mesh, s), tp_param_specs(packed)),
    )
    state = state.replace(params=packed, opt_state=tx.init(packed))
    step = jax.jit(make_tp_train_step(model, tx, mesh, use_pallas=True))
    x = jnp.zeros((2, seq), jnp.int32)
    _, metrics = step(state, x, x, {"lr": 1e-3})
    assert np.isfinite(float(metrics["Loss"]))


def test_pp_train_step_paper_config_features():
    """PP trains the exact paper block/embedding form (ReZero +
    'absolute' spatial coordinate tables, reference README.md:140-141):
    the stacked (L, 1) ReZero gains scan per stage and the spatial
    lookups run in the replicated embed prefix — loss parity vs the
    single-device step."""
    import optax
    from jax.sharding import Mesh

    from synthanatomy_tpu.models.ordering import Ordering
    from synthanatomy_tpu.parallel.pipeline_parallel import (
        make_pp_train_step,
        pack_pp_state,
    )

    shape = (2, 2, 5)
    seq = 20
    ordering = Ordering("raster_scan", 3, shape)
    model = Performer(
        num_tokens=17, max_seq_len=seq + 1, dim=32, depth=4, heads=2,
        dim_head=8, local_attn_heads=1, local_window_size=6,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
        use_rezero=True, spatial_position_emb="absolute",
        spatial_shape=shape, ordering=ordering,
    )
    state, _ = create_transformer_train_state(
        model, jax.random.key(0), seq + 1, learning_rate=1e-3
    )
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 16, (8, seq)), jnp.int32)
    y = jnp.asarray(rng.integers(0, 16, (8, seq)), jnp.int32)
    ref_step = make_transformer_train_step(model, tx)
    _, ref = jax.jit(ref_step)(state, x, y, None, {"lr": 1e-3})

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("pipe",))
    pp_step = make_pp_train_step(model, tx, mesh, n_microbatches=4)
    _, m = jax.jit(pp_step)(pack_pp_state(model, state), x, y, {"lr": 1e-3})
    np.testing.assert_allclose(
        float(m["Loss"]), float(ref["Loss"]), rtol=1e-5
    )

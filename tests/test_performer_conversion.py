"""Golden parity for the Performer converter: a torch mini-transformer
with the consumed package's structure (PreLayerNorm-wrapped attention
projections + w1/w2 FF, tied norms, learned absolute positions) →
converted weights → our flax Performer must reproduce its layer math.

We verify the deterministic sub-paths exactly (embeddings, layernorms,
q/k/v/out and FF projections, final head); the FAVOR random-feature
attention itself is stochastic by construction (redrawable projections)
so full-logit equality is not defined — instead we check the converted
tree is structurally complete for the flax model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from synthanatomy_tpu.models.performer import Performer  # noqa: E402
from tools.convert_performer_checkpoint import (  # noqa: E402
    convert_performer_state_dict,
)

DIM, DEPTH, HEADS, DIM_HEAD, VOCAB, SEQ = 16, 2, 2, 8, 9, 12


def _torch_sd():
    torch.manual_seed(0)
    sd = {}

    def lin(prefix, i, o, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(o, i) * 0.05
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(o) * 0.01

    sd["token_emb.weight"] = torch.randn(VOCAB, DIM) * 0.1
    sd["pos_emb.emb.weight"] = torch.randn(SEQ, DIM) * 0.1
    inner = HEADS * DIM_HEAD
    for L in range(DEPTH):
        p = f"performer.net.layers.{L}"
        # attention sub-block (PreLayerNorm wrapper adds .fn nesting)
        sd[f"{p}.0.fn.norm.weight"] = torch.ones(DIM)
        sd[f"{p}.0.fn.norm.bias"] = torch.zeros(DIM)
        lin(f"{p}.0.fn.fn.to_q", DIM, inner, bias=False)
        lin(f"{p}.0.fn.fn.to_k", DIM, inner, bias=False)
        lin(f"{p}.0.fn.fn.to_v", DIM, inner, bias=False)
        lin(f"{p}.0.fn.fn.to_out", inner, DIM, bias=False)
        # ff sub-block
        sd[f"{p}.1.fn.norm.weight"] = torch.ones(DIM)
        sd[f"{p}.1.fn.norm.bias"] = torch.zeros(DIM)
        lin(f"{p}.1.fn.fn.fn.w1", DIM, DIM * 4)
        lin(f"{p}.1.fn.fn.fn.w2", DIM * 4, DIM)
    sd["norm.weight"] = torch.ones(DIM)
    sd["norm.bias"] = torch.zeros(DIM)
    lin("to_out", DIM, VOCAB)
    return {k: v.numpy() for k, v in sd.items()}


def test_conversion_covers_flax_param_tree():
    sd = _torch_sd()
    params = convert_performer_state_dict(sd, depth=DEPTH)

    model = Performer(
        num_tokens=VOCAB, max_seq_len=SEQ, dim=DIM, depth=DEPTH, heads=HEADS,
        dim_head=DIM_HEAD, nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    ref_vars = model.init(
        {"params": jax.random.key(0), "favor": jax.random.key(1)},
        jnp.zeros((1, SEQ), jnp.int32),
    )

    def paths(tree):
        return {
            "/".join(str(getattr(k, "key", k)) for k in p) + ":" + str(l.shape)
            for p, l in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    ref, got = paths(ref_vars["params"]), paths(params)
    assert got == ref, f"missing: {sorted(ref - got)[:5]}; extra: {sorted(got - ref)[:5]}"

    # numeric spot checks: projections transposed, embeddings direct
    np.testing.assert_allclose(
        params["token_emb"]["embedding"], sd["token_emb.weight"]
    )
    np.testing.assert_allclose(
        params["block_0"]["attn"]["to_q"]["kernel"],
        sd["performer.net.layers.0.0.fn.fn.to_q.weight"].T,
    )
    np.testing.assert_allclose(
        params["block_1"]["ff"]["w2"]["kernel"],
        sd["performer.net.layers.1.1.fn.fn.fn.w2.weight"].T,
    )

    # converted params actually run in the model
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "favor": ref_vars["favor"],
    }
    logits = model.apply(variables, jnp.zeros((1, SEQ), jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_conversion_with_conditioning_and_spatial():
    sd = _torch_sd()
    sd["spatial_position_emb.0.emb.weight"] = np.random.default_rng(0).normal(
        size=(8, DIM)
    ).astype(np.float32)
    sd["conditioning_emb.0.weight"] = np.random.default_rng(1).normal(
        size=(3, DIM)
    ).astype(np.float32)
    params = convert_performer_state_dict(sd, depth=DEPTH)
    assert "spatial_emb_0" in params and "conditioning_emb_0" in params


def test_performer_export_roundtrip():
    """flax → reference state dict (export_checkpoint) → flax is the
    identity; the exported key set matches the reference naming."""
    from tools.export_checkpoint import export_performer_state_dict

    sd = _torch_sd()
    params = convert_performer_state_dict(sd, depth=DEPTH)
    sd_back = export_performer_state_dict(params, depth=DEPTH)
    assert set(sd_back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd_back[k], sd[k])


def test_performer_export_roundtrip_rezero():
    """ReZero blocks (the released checkpoints' form): the wrapper's
    scalar ``g`` gain replaces the pre-norm keys at the same nesting
    position; torch → flax → torch must be the identity and the flax
    tree must carry g_attn/g_ff instead of norms."""
    from tools.export_checkpoint import export_performer_state_dict

    sd = _torch_sd()
    # rewrite the wrapper keys into the ReZero form
    rz = {}
    for k, v in sd.items():
        if ".fn.norm." in k:
            continue
        rz[k] = v
    for L in range(DEPTH):
        p = f"performer.net.layers.{L}"
        rz[f"{p}.0.fn.g"] = np.float32(0.7)
        rz[f"{p}.1.fn.g"] = np.float32(0.5)

    params = convert_performer_state_dict(rz, depth=DEPTH)
    for L in range(DEPTH):
        blk = params[f"block_{L}"]
        assert "g_attn" in blk and "g_ff" in blk
        assert "norm_attn" not in blk and "norm_ff" not in blk
        np.testing.assert_allclose(blk["g_attn"], [0.7])

    sd_back = export_performer_state_dict(params, depth=DEPTH)
    assert set(sd_back) == set(rz)
    for k in rz:
        np.testing.assert_array_equal(
            np.asarray(sd_back[k]).reshape(-1), np.asarray(rz[k]).reshape(-1),
            err_msg=k,
        )

    # the converted ReZero tree runs in the flax model
    model = Performer(
        num_tokens=VOCAB, max_seq_len=SEQ, dim=DIM, depth=DEPTH, heads=HEADS,
        dim_head=DIM_HEAD, nb_features=8, dtype=jnp.float32, scan_chunk=8,
        use_rezero=True,
    )
    ref_vars = model.init(
        {"params": jax.random.key(0), "favor": jax.random.key(1)},
        jnp.zeros((1, SEQ), jnp.int32),
    )
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "favor": ref_vars["favor"],
    }
    logits = model.apply(variables, jnp.zeros((1, SEQ), jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_performer_export_from_orbax_dir_with_projections(tmp_path):
    """The export CLI reads a real orbax checkpoint dir (a trained
    experiment) and emits the reference-layout state dict INCLUDING
    the FAVOR projection buffers, which convert back to the identical
    favor collection — the full both-ways loop a user needs to move a
    TPU-trained prior into the reference codebase."""
    import os

    from synthanatomy_tpu.train import checkpoints as C
    from synthanatomy_tpu.train.transformer_steps import (
        create_transformer_train_state,
    )
    from tools.convert_performer_checkpoint import (
        convert_performer_favor,
        convert_performer_state_dict,
    )
    from tools.export_checkpoint import _load_source, export_performer_state_dict

    model = Performer(
        num_tokens=VOCAB, max_seq_len=SEQ, dim=DIM, depth=DEPTH, heads=HEADS,
        dim_head=DIM_HEAD, nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    state, _ = create_transformer_train_state(model, jax.random.key(5), SEQ)
    ckdir = str(tmp_path / "checkpoints")
    os.makedirs(ckdir)
    path = C.save_checkpoint(ckdir, state, 3)

    params, aux, favor = _load_source(path, "performer")
    sd = export_performer_state_dict(params, depth=DEPTH, favor=favor)
    assert any(k.endswith("projection_matrix") for k in sd)

    back = convert_performer_state_dict(sd, depth=DEPTH)
    favor_back = convert_performer_favor(sd, depth=DEPTH)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(back)[0],
        jax.tree_util.tree_flatten_with_path(
            jax.device_get(state.params)
        )[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7,
            err_msg=jax.tree_util.keystr(pa),
        )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(favor_back)[0],
        jax.tree_util.tree_flatten_with_path(
            jax.device_get(state.favor)
        )[0],
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(pa)
        )

"""Manual Megatron-style tensor-parallel Performer training.

GSPMD already tensor-shards the XLA attention paths
(`sharding_rules.py`), but it cannot partition the opaque Pallas
custom calls — so TP meshes previously fell back to the (slower) XLA
attention.  This module runs the Megatron decomposition explicitly
under ``shard_map``: every device owns H/P attention heads and 1/P of
the FF hidden dim, applies its slice with the SAME modules (Pallas
kernels included — each device's heads are an ordinary
``PerformerAttention`` call), and one ``psum`` after the attention
out-projection and one after the FF down-projection restore the
replicated residual stream.  The optimizer state is sharded like the
params (Megatron-style sharded Adam — 1/P of the moments per device).

Head packing: the per-head qkv/out layout is [global..., local...], so
a contiguous P-way column shard would give one device all-FAVOR heads
and another all-local ones (config-dependent module structure — not
SPMD-expressible).  :func:`pack_tp_params` permutes the head blocks to
[g₀ l₀ | g₁ l₁ | ...] so every shard is a homogeneous gh/P + lh/P
hybrid; :func:`unpack_tp_params` is the exact inverse (checkpoints
stay in canonical layout).

Gradient flow uses Megatron's conjugate ``f``/``g`` operators rather
than raw psums (a raw ``psum``'s shard_map transpose is another psum,
which would scale sharded-parameter gradients by P): ``f`` =
psum-forward / identity-backward closes each column→row-parallel pair;
``g`` = identity-forward / psum-backward opens it, so the cotangent
entering the replicated region (LayerNorms, embeddings, residual
stream) is the full cross-shard sum.  Pinned by gradient-parity tests
against the single-device step.

FF biases: w1's bias is hidden-sharded (exact); w2's replicated bias
is added ONCE after the psum, in the replicated region, so its
gradient is an ordinary replicated gradient.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "pack_tp_params",
    "unpack_tp_params",
    "pack_tp_state",
    "unpack_tp_state",
    "make_tp_train_step",
    "tp_param_specs",
    "tp_step_compatible",
]


def _head_perm(gh: int, lh: int, dh: int, n_shards: int) -> np.ndarray:
    """Column permutation (size (gh+lh)·dh) mapping canonical
    [g₀..g_gh, l₀..l_lh] head order to per-shard-interleaved
    [g-chunk₀ l-chunk₀ | g-chunk₁ l-chunk₁ | ...]."""
    gpp, lpp = gh // n_shards, lh // n_shards
    order = []
    for p in range(n_shards):
        order += list(range(p * gpp, (p + 1) * gpp))
        order += list(range(gh + p * lpp, gh + (p + 1) * lpp))
    idx = np.asarray(order)
    return (idx[:, None] * dh + np.arange(dh)[None, :]).reshape(-1)


def pack_tp_params(model, params, n_shards: int):
    """Permute attention head blocks for homogeneous TP shards (the
    FF down-projection bias stays canonical — it is added once in the
    replicated region, outside the psum)."""
    gh = model.heads - model.local_attn_heads
    lh = model.local_attn_heads
    if gh % n_shards or (lh and lh % n_shards):
        raise ValueError(
            f"global heads {gh} and local heads {lh} must both divide "
            f"into {n_shards} TP shards"
        )
    perm = _head_perm(gh, lh, model.dim_head, n_shards)
    out = jax.tree.map(lambda x: x, params)  # shallow copy tree
    new = dict(out)
    for i in range(model.depth):
        blk = dict(new[f"block_{i}"])
        attn = dict(blk["attn"])
        for name in ("to_q", "to_k", "to_v"):
            e = dict(attn[name])
            e["kernel"] = jnp.asarray(e["kernel"])[:, perm]
            if "bias" in e:
                e["bias"] = jnp.asarray(e["bias"])[perm]
            attn[name] = e
        o = dict(attn["to_out"])
        o["kernel"] = jnp.asarray(o["kernel"])[perm, :]
        attn["to_out"] = o
        blk["attn"] = attn
        new[f"block_{i}"] = blk
    return new


def unpack_tp_params(model, params, n_shards: int):
    """Exact inverse of :func:`pack_tp_params`."""
    gh = model.heads - model.local_attn_heads
    lh = model.local_attn_heads
    perm = _head_perm(gh, lh, model.dim_head, n_shards)
    inv = np.argsort(perm)
    new = dict(params)
    for i in range(model.depth):
        blk = dict(new[f"block_{i}"])
        attn = dict(blk["attn"])
        for name in ("to_q", "to_k", "to_v"):
            e = dict(attn[name])
            e["kernel"] = jnp.asarray(e["kernel"])[:, inv]
            if "bias" in e:
                e["bias"] = jnp.asarray(e["bias"])[inv]
            attn[name] = e
        o = dict(attn["to_out"])
        o["kernel"] = jnp.asarray(o["kernel"])[inv, :]
        attn["to_out"] = o
        blk["attn"] = attn
        new[f"block_{i}"] = blk
    return new


def tp_step_compatible(model, n_shards: int):
    """``(ok, reason)`` — whether :func:`make_tp_train_step` can train
    this model config (the runner auto-selects it only when true and
    falls back to the GSPMD path otherwise)."""
    gh = model.heads - model.local_attn_heads
    lh = model.local_attn_heads
    if gh % n_shards or (lh and lh % n_shards):
        return False, f"heads ({gh} global / {lh} local) not divisible by {n_shards}"
    if model.use_scalenorm:
        return False, "ScaleNorm blocks"
    if model.rotary_position_emb or model.fixed_position_emb or model.axial_position_emb:
        return False, "non-learned positional embedding"
    if model.spatial_position_emb not in (None, "absolute"):
        return False, "'fixed' spatial positional embeddings"
    if model.conditioning_num_tokens and model.conditioning_type != "bos_replacement":
        return False, "'prepending' conditioning"
    if model.attn_out_bias:
        return False, "attn_out_bias"
    if model.emb_dropout or model.ff_dropout or model.attn_dropout:
        return False, "dropout"
    if model.ff_glu:
        return False, "ff_glu"
    if model.reversible:
        return False, "reversible blocks"
    return True, ""


def pack_tp_state(model, state, n_shards: int):
    """Pack a canonical TransformerTrainState for the manual TP step:
    params AND optimizer moments get the head-block permutation
    (moments are params-shaped, so the same permutation applies —
    Adam's update is elementwise).  Checkpoints are written canonical;
    this runs after restore, :func:`unpack_tp_state` before save."""
    return state.replace(
        params=pack_tp_params(model, state.params, n_shards),
        opt_state=_permute_opt_state(model, state.opt_state, n_shards, pack=True),
    )


def unpack_tp_state(model, state, n_shards: int):
    """Exact inverse of :func:`pack_tp_state` — checkpoints stay in
    the canonical (reference-convertible) head layout."""
    return state.replace(
        params=unpack_tp_params(model, state.params, n_shards),
        opt_state=_permute_opt_state(model, state.opt_state, n_shards, pack=False),
    )


def _permute_opt_state(model, opt_state, n_shards: int, *, pack: bool):
    """Apply the head-block permutation to every params-shaped subtree
    of an optax state (Adam mu/nu) — recognised as dicts carrying the
    ``block_i`` keys — leaving counts/hyperparams untouched."""
    fn = pack_tp_params if pack else unpack_tp_params

    def _rec(node):
        if isinstance(node, dict):
            if any(str(k).startswith("block_") for k in node):
                return fn(model, node, n_shards)
            return {k: _rec(v) for k, v in node.items()}
        if isinstance(node, tuple):
            out = [_rec(v) for v in node]
            return type(node)(*out) if hasattr(node, "_fields") else tuple(out)
        if isinstance(node, list):
            return [_rec(v) for v in node]
        return node

    return _rec(opt_state)


def tp_param_specs(params):
    """PartitionSpec tree for the PACKED params: head/hidden dims over
    'model', everything else replicated (matches sharding_rules.py)."""

    def _one(path_tuple, leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in path_tuple)
        if path.endswith(("to_q/kernel", "to_k/kernel", "to_v/kernel")):
            return P(None, "model")
        if path.endswith(("to_q/bias", "to_k/bias", "to_v/bias")):
            return P("model")
        if "attn/to_out/kernel" in path:
            return P("model", None)
        if path.endswith("ff/w1/kernel"):
            return P(None, "model")
        if path.endswith("ff/w1/bias"):
            return P("model")
        if path.endswith("ff/w2/kernel"):
            return P("model", None)
        return P()

    return jax.tree_util.tree_map_with_path(_one, params)


def _make_f_g(axis: str):
    """Megatron's conjugate collectives. ``f``: psum forward, identity
    backward (the downstream cotangent is already replicated — the
    true VJP of each shard's additive contribution is identity).
    ``g``: identity forward, psum backward (the upstream cotangent is
    the sum of every shard's partial)."""

    @jax.custom_vjp
    def f(x):
        return jax.lax.psum(x, axis)

    f.defvjp(lambda x: (jax.lax.psum(x, axis), None), lambda _, ct: (ct,))

    @jax.custom_vjp
    def g(x):
        return x

    g.defvjp(
        lambda x: (x, None), lambda _, ct: (jax.lax.psum(ct, axis),)
    )
    return f, g


def make_tp_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    axis: str = "model",
    use_pallas: bool = False,
    use_pallas_local: bool = None,
    use_pallas_favor: bool = None,
) -> Callable:
    """Build ``step(state, inputs, targets, sched) -> (state, metrics)``
    with the Performer tensor-sharded over ``mesh[axis]``.

    ``state.params`` must be the PACKED tree (:func:`pack_tp_params`)
    placed with :func:`tp_param_specs` shardings (the optimizer state
    follows the same specs — sharded Adam).  ``use_pallas=True`` runs
    the per-device attention through the Pallas kernels (TPU only);
    ``use_pallas_local``/``use_pallas_favor`` override per kernel
    family (the CLI's two flags are independent).
    Supported block/embedding forms: pre-LayerNorm or ReZero blocks
    (the paper config, reference README.md:140), learned 'absolute'
    spatial coordinate tables, 'bos_replacement' conditioning — all
    replicated math outside the sharded attention/FF pairs.
    Restrictions: no ScaleNorm, no dropout RNG (deterministic), no
    'prepending' conditioning, no per-layer rotary/fixed/axial.
    """
    from synthanatomy_tpu.models.performer import PerformerAttention

    n_sh = mesh.shape[axis]
    lh = model.local_attn_heads
    ok, why = tp_step_compatible(model, n_sh)
    if not ok:
        raise NotImplementedError(f"TP step: {why}")
    attn_local = PerformerAttention(
        dim=model.dim,
        heads=model.heads // n_sh,
        dim_head=model.dim_head,
        local_heads=lh // n_sh,
        local_window=model.local_window_size,
        nb_features=model.nb_features,
        causal=model.causal,
        generalized=model.generalized_attention,
        qkv_bias=model.qkv_bias,
        out_bias=False,  # replicated out-bias would psum P times
        scan_chunk=model.scan_chunk,
        no_projection=model.no_projection,
        use_pallas_local=(
            use_pallas if use_pallas_local is None else use_pallas_local
        ),
        use_pallas_favor=(
            use_pallas if use_pallas_favor is None else use_pallas_favor
        ),
        attn_compute_dtype=model.attn_compute_dtype,
        dtype=model.dtype,
    )
    depth = model.depth
    eps = 1e-6
    rezero = model.use_rezero
    n_cond = len(model.conditioning_num_tokens or ())
    # 'absolute' spatial tables: static per-position lookup indices,
    # mirroring Performer._spatial_pos_sum (embeds seq[:-1]; position 0
    # is the BOS zero row) — same scheme as the SP step
    sp_seqs = None
    if model.spatial_position_emb == "absolute":
        from synthanatomy_tpu.models.performer import (
            spatial_coordinate_sequences,
            spatial_lookup_layout,
        )

        sp_seqs = spatial_coordinate_sequences(
            model.spatial_shape, model.ordering
        )

    def _ln(x, p):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, -1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
        return (
            (x32 - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
        ).astype(x.dtype)

    f_op, g_op = _make_f_g(axis)

    def inner(params, favor, inputs, targets, sched, conds):
        def loss_fn(p):
            emb = jnp.asarray(p["token_emb"]["embedding"], model.dtype)
            h = emb[inputs]
            n = h.shape[1]
            if sp_seqs is not None:
                # Σ per-axis coordinate embeddings, BOS-right-shifted
                # (shared layout helper — same shift math as the model
                # and the SP step)
                sp_idx, sp_mask = spatial_lookup_layout(sp_seqs, n)
                m = jnp.asarray(sp_mask)
                for i in range(len(sp_seqs)):
                    tbl = jnp.asarray(
                        p[f"spatial_emb_{i}"]["embedding"], model.dtype
                    )
                    rows = tbl[jnp.asarray(sp_idx[:, i])] * m
                    h = h + rows[None].astype(h.dtype)
            if n_cond:
                # bos_replacement: the conditioning-embedding sum
                # overwrites position 0 (its spatial row is the zero
                # row), before the sequence positional addition —
                # reference performer.py:252-261
                c0 = jnp.zeros((h.shape[0], 1, model.dim), h.dtype)
                for idx in range(n_cond):
                    ct = jnp.asarray(
                        p[f"conditioning_emb_{idx}"]["embedding"],
                        model.dtype,
                    )
                    c0 = c0 + ct[conds[idx]].reshape(h.shape[0], 1, model.dim)
                h = jnp.concatenate([c0, h[:, 1:]], axis=1)
            table = p["abs_pos_emb"]["embedding"]
            h = h + jnp.asarray(table, model.dtype)[None, :n]
            for i in range(depth):
                blk = p[f"block_{i}"]
                a = attn_local.apply(
                    {
                        "params": blk["attn"],
                        "favor": favor[f"block_{i}"]["attn"],
                    },
                    g_op(
                        h.astype(model.dtype)
                        if rezero
                        else _ln(h, blk["norm_attn"])
                    ),
                )
                # ReZero: the scalar gain distributes over the psum
                # (g·Σaₚ = Σ g·aₚ), so applying it after f_op is the
                # block's a·g_attn exactly; its gradient is an ordinary
                # replicated gradient like w2's bias
                h = h + (f_op(a) * blk["g_attn"] if rezero else f_op(a))
                f = g_op(
                    h.astype(model.dtype)
                    if rezero
                    else _ln(h, blk["norm_ff"])
                )
                w1 = blk["ff"]["w1"]
                w2 = blk["ff"]["w2"]
                hid = jax.nn.gelu(
                    jnp.dot(
                        f, jnp.asarray(w1["kernel"], model.dtype),
                        preferred_element_type=jnp.float32,
                    )
                    + w1["bias"]
                )
                down = jnp.dot(
                    hid.astype(model.dtype),
                    jnp.asarray(w2["kernel"], model.dtype),
                    preferred_element_type=jnp.float32,
                )
                # w2 bias is replicated: add it ONCE, after the psum
                ffout = (f_op(down) + w2["bias"]).astype(
                    model.dtype if rezero else h.dtype
                )
                h = h + (ffout * blk["g_ff"] if rezero else ffout)
            hn = _ln(h, p["final_norm"]).astype(jnp.float32)
            if model.tie_embed:
                logits = hn @ jnp.asarray(
                    p["token_emb"]["embedding"], jnp.float32
                ).T
            else:
                logits = (
                    hn @ jnp.asarray(p["to_out"]["kernel"], jnp.float32)
                    + p["to_out"]["bias"]
                )
            lse = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(lse, targets[..., None], axis=-1)[..., 0]
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return grads, loss

    pspecs = None  # resolved lazily from the state's tree

    def step(state, inputs, targets, sched, conds=None):
        nonlocal pspecs
        if pspecs is None:
            pspecs = tp_param_specs(state.params)
        if n_cond and conds is None:
            raise ValueError(
                "model was built with conditioning_num_tokens; the TP "
                "step needs the conditioning values"
            )
        conds = tuple(conds) if n_cond else ()
        sharded = jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(
                pspecs, P(), P(), P(), P(),
                tuple(P() for _ in conds),
            ),
            out_specs=(pspecs, P()),
            check_vma=False,
        )
        grads, loss = sharded(
            state.params, state.favor, inputs, targets, sched, conds
        )
        state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            sched["lr"], jnp.float32
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            rng=state.rng,
        )
        return new_state, {"Loss": loss}

    return step

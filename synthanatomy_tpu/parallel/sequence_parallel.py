"""Sequence-parallel (context-parallel) Performer training.

Full train step with the SEQUENCE axis sharded over an ICI mesh axis —
the hardware form of the long-context story (SURVEY.md §5.7): every
device holds the whole (replicated) parameter set but only L/P of the
tokens.  The attention ops do the only cross-device communication:

- FAVOR+ heads: each shard reduces its (K·Vᵀ, ΣK) totals, one
  ``all_gather`` of the O(m·d) states rides ICI, an exclusive prefix
  sum seeds the local chunked scan (``favor_attention_sequence_parallel``);
- local-window heads: one ``ppermute`` halo of the previous ``window``
  keys/values (``local_attention_sequence_parallel``).

Everything else (embeddings, LayerNorms, projections, FF, CE) is
per-token and runs shard-locally; parameter gradients are ``psum``-ed.
Exact: matches the single-device train step to fp tolerance
(tests/test_parallel.py).

Sequences are right-padded so the shard length divides the local
window (the halo-exchange alignment requirement); padded positions are
masked out of the loss.  Positional (+spatial) embeddings are
precomputed as a full (L, D) table outside ``shard_map`` and sharded
in, so every positional mode except per-layer rotary works unchanged.

The reference has no equivalent — its long-context story is purely
algorithmic (linear attention); DDP shards only the batch.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["make_sp_train_step"]


def _block_template(model, axis: str):
    from synthanatomy_tpu.models.performer import PerformerBlock

    return PerformerBlock(
        model.dim, model.heads, model.dim_head, model.local_attn_heads,
        model.local_window_size, model.nb_features, model.causal,
        model.generalized_attention, model.ff_mult, model.ff_glu,
        model.ff_dropout, model.attn_dropout, model.use_scalenorm,
        model.use_rezero, model.qkv_bias, model.attn_out_bias,
        model.scan_chunk, model.no_projection,
        False,  # use_pallas_local (SP uses the XLA halo path)
        False,  # use_pallas_favor
        model.remat_attention,
        model.favor_cache_dtype, model.attn_compute_dtype, model.dtype,
        sp_axis=axis,
    )


def _const_pos_method(m, n, k_pre=0):
    """Constant (non-parameter) positional rows (n, D): the fixed
    sinusoidal table and/or 'fixed' spatial coordinate embeddings.
    Parameterized tables (absolute) are looked up INSIDE the loss so
    their gradients flow.

    ``k_pre`` > 0 ('prepending' conditioning): the sinusoidal table
    indexes the full prepended sequence (the model adds pos_emb AFTER
    the concat, performer.py __call__), while the spatial rows belong
    to the token positions only and are therefore shifted right by the
    prefix length."""
    total = jnp.zeros((n, m.dim), jnp.float32)
    if m.fixed_position_emb:
        fp = m._fixed_pos[:n]
        # alignment padding may exceed the canonical table (the pad
        # positions are loss-masked and causally invisible, so their
        # rows can be anything — use zeros)
        if fp.shape[0] < n:
            fp = jnp.pad(fp, ((0, n - fp.shape[0]), (0, 0)))
        total = total + fp
    if m.spatial_position_emb == "fixed":
        sp = m._spatial_pos_sum(n - k_pre)[0].astype(jnp.float32)
        total = total + jnp.pad(sp, ((k_pre, 0), (0, 0)))
    return total


def make_sp_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    seq_len: int,
    *,
    axis: str = "seq",
    data_axis: str = None,
) -> Callable:
    """Build ``step(state, inputs, targets, sched[, conds]) ->
    (state, metrics)`` training ``model`` with inputs (B, seq_len)
    sharded along the sequence over ``mesh[axis]`` — and, when
    ``data_axis`` names a second mesh axis, along the batch too (DP×SP:
    gradients reduce over both axes).

    Conditioning (reference performer.py:252-264) is supported in both
    modes — the conditioning values are replicated (they are O(B·k)
    ints) and only the shards owning the affected global positions act:

    - ``bos_replacement``: the Σ-of-embeddings row replaces global
      position 0, owned by shard 0;
    - ``prepending``: the global sequence becomes [k conditioning
      rows] + [L token rows]; the k prefix rows live at the head of
      shard 0's segment, their logits are masked out of the CE.

    Constraints: causal attention, no per-layer rotary, no dropout
    (raise below).  Both spatial_position_emb modes work: 'fixed' rows
    ride the precomputed constant table; 'absolute' tables (the PAPER
    transformer config, reference README.md:141) are params, looked up
    INSIDE the loss from static per-shard coordinate indices so their
    gradients flow.  ``seq_len`` is padded up so the shard length
    divides the local window.
    """
    if model.rotary_position_emb or model.axial_position_emb:
        raise NotImplementedError(
            "SP training supports absolute/fixed positional embeddings"
        )
    if model.emb_dropout or model.ff_dropout or model.attn_dropout:
        raise NotImplementedError(
            "SP training runs the blocks deterministically; dropout "
            "(emb/ff/attn) is unsupported — use DP or single-device"
        )
    cond_type = (
        model.conditioning_type if model.conditioning_num_tokens else "none"
    )
    n_cond = len(model.conditioning_num_tokens or ())
    # number of prefix rows physically prepended to the sharded sequence
    k_pre = n_cond if cond_type == "prepending" else 0
    n_sh = mesh.shape[axis]
    align = n_sh * (model.local_window_size if model.local_attn_heads else 1)
    l_pad = -(-(seq_len + k_pre) // align) * align
    # l_pad may exceed the model's canonical max_seq_len: the extra
    # positions are pure alignment padding (right-padded, loss-masked,
    # and — causal attention — invisible to every real token), so the
    # positional tables are zero-extended on the fly instead of
    # requiring a bigger (checkpoint-incompatible) model.
    block = _block_template(model, axis)
    depth = model.depth
    eps = 1e-6

    # 'absolute' spatial coordinate embeddings: static (l_pad, n_axes)
    # coordinate-index + (l_pad, 1) validity-mask arrays, sharded over
    # the sequence axis; the (parameter) tables are looked up inside
    # the loss so gradients flow — each global position is owned by
    # exactly one shard, so the grad psum counts every row once.
    # Layout mirrors _spatial_pos_sum: token position 0 (BOS) gets the
    # zero row, position q >= 1 the coords of grid cell q-1; prefix
    # (k_pre) and alignment-pad positions are masked.
    abs_spatial = model.spatial_position_emb == "absolute"
    n_sp_axes = 0
    sp_idx_g = sp_mask_g = None
    if abs_spatial:
        from synthanatomy_tpu.models.performer import (
            spatial_coordinate_sequences,
            spatial_lookup_layout,
        )

        seqs = spatial_coordinate_sequences(model.spatial_shape, model.ordering)
        n_sp_axes = len(seqs)
        sp_idx, sp_mask = spatial_lookup_layout(
            seqs, seq_len, k_pre=k_pre, total=l_pad
        )
        sp_idx_g = jnp.asarray(sp_idx)
        sp_mask_g = jnp.asarray(sp_mask)

    def inner(
        params, favor, inputs, targets, mask, pos_rows, sp_idx, sp_mask,
        conds, sched, rng,
    ):
        """Under shard_map: inputs/targets/mask (B, Ls); pos_rows
        (Ls, D); sp_idx/sp_mask (Ls, ·) spatial lookup indices; conds a
        (possibly empty) tuple of (B,) int arrays.  Returns
        (grads, loss) — both psum-ed."""

        ls = inputs.shape[1]

        def loss_fn(p):
            emb = p["token_emb"]["embedding"]
            h = jnp.asarray(emb, model.dtype)[inputs]
            # --- conditioning injection (reference performer.py:252-264)
            # before any positional addition.  bos_replacement replaces
            # [token+spatial] at global position 0 — the spatial row at
            # 0 is the BOS zero row, so replacing the token row here is
            # the same math.  All shards compute the (tiny) embedding
            # sum; only the owning shard's rows change, so the psum over
            # parameter grads counts each table exactly once.
            if cond_type == "bos_replacement":
                c = jnp.zeros((h.shape[0], model.dim), jnp.float32)
                for i in range(n_cond):
                    tbl = p[f"conditioning_emb_{i}"]["embedding"]
                    c = c + jnp.asarray(tbl, jnp.float32)[conds[i]]
                own = jax.lax.axis_index(axis) == 0
                row0 = jnp.where(own, c.astype(h.dtype), h[:, 0])
                h = h.at[:, 0, :].set(row0)
            elif cond_type == "prepending":
                g0 = jax.lax.axis_index(axis) * ls
                for j in range(n_cond):
                    tbl = p[f"conditioning_emb_{j}"]["embedding"]
                    row = jnp.asarray(tbl, model.dtype)[conds[j]]  # (B, D)
                    local = jnp.clip(j - g0, 0, ls - 1)
                    own = (j >= g0) & (j - g0 < ls)
                    cur = jax.lax.dynamic_slice_in_dim(h, local, 1, 1)
                    new = jnp.where(own, row[:, None], cur)
                    h = jax.lax.dynamic_update_slice_in_dim(h, new, local, 1)
            if not model.fixed_position_emb:
                table = p["abs_pos_emb"]["embedding"]
                if table.shape[0] < l_pad:
                    # zero rows for the alignment pad (grad of pad is
                    # slice, so table gradients stay exact)
                    table = jnp.pad(
                        table, ((0, l_pad - table.shape[0]), (0, 0))
                    )
                start = jax.lax.axis_index(axis) * ls
                h = h + jax.lax.dynamic_slice_in_dim(
                    table, start, ls, 0
                ).astype(h.dtype)
            h = h + pos_rows.astype(h.dtype)
            if abs_spatial:
                srow = jnp.zeros((ls, model.dim), jnp.float32)
                for j in range(n_sp_axes):
                    tbl = p[f"spatial_emb_{j}"]["embedding"]
                    srow = srow + jnp.asarray(tbl, jnp.float32)[
                        sp_idx[:, j]
                    ]
                h = h + (srow * sp_mask).astype(h.dtype)[None]
            for i in range(depth):
                h = block.apply(
                    {"params": p[f"block_{i}"], "favor": favor[f"block_{i}"]},
                    h,
                )
            # final LayerNorm (same formula as nn.LayerNorm, eps 1e-6)
            h32 = h.astype(jnp.float32)
            mu = jnp.mean(h32, -1, keepdims=True)
            var = jnp.mean(jnp.square(h32 - mu), -1, keepdims=True)
            ln = p["final_norm"]
            hn = (h32 - mu) * jax.lax.rsqrt(var + eps) * ln["scale"] + ln["bias"]
            if model.tie_embed:
                logits = hn.astype(model.dtype) @ jnp.asarray(
                    emb, model.dtype
                ).T
            else:
                logits = (
                    hn.astype(model.dtype) @ jnp.asarray(
                        p["to_out"]["kernel"], model.dtype
                    )
                    + p["to_out"]["bias"]
                )
            logits = logits.astype(jnp.float32)
            lse = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(lse, targets[..., None], axis=-1)[..., 0]
            local_sum = jnp.sum(nll * mask)
            total = jax.lax.psum(
                jnp.sum(mask),
                (axis,) if data_axis is None else (axis, data_axis),
            )
            # LOCAL partial of the global mean — no forward psum over
            # the numerator: under shard_map the transpose of psum is
            # psum (not identity), so psum-ing the loss AND the grads
            # would double-count by a factor of the axis size
            return local_sum / total

        red = (axis,) if data_axis is None else (axis, data_axis)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.psum(grads, red)
        loss = jax.lax.psum(loss, red)
        return grads, loss

    bspec = P(data_axis, axis)
    inner_sharded = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            P(), P(), bspec, bspec, bspec, P(axis, None), P(axis, None),
            P(axis, None), P(data_axis), P(), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step(state, inputs, targets, sched, conds=None):
        rng, drop_rng = jax.random.split(state.rng)
        b, n = inputs.shape
        if n + k_pre > l_pad:
            raise ValueError(f"sequence {n} exceeds padded capacity {l_pad}")
        if (conds is None) != (cond_type == "none"):
            raise ValueError(
                f"model conditioning_type={cond_type!r} but conds "
                f"{'missing' if conds is None else 'given'}"
            )
        pad = l_pad - n - k_pre
        # 'prepending': k_pre placeholder columns head the global
        # sequence (overwritten by conditioning rows inside the shards);
        # their logits are masked out of the CE, matching the
        # reference's strip of the first k output positions
        mask = jnp.pad(
            jnp.ones((b, n), jnp.float32), ((0, 0), (k_pre, pad))
        )
        inputs_p = jnp.pad(inputs, ((0, 0), (k_pre, pad)))
        targets_p = jnp.pad(targets, ((0, 0), (k_pre, pad)))
        pos_rows = model.apply(
            {"params": state.params, "favor": state.favor},
            l_pad,
            k_pre,
            method=_const_pos_method,
        )
        grads, loss = inner_sharded(
            state.params, state.favor, inputs_p, targets_p, mask, pos_rows,
            sp_idx_g if abs_spatial else jnp.zeros((l_pad, 1), jnp.int32),
            sp_mask_g if abs_spatial else jnp.zeros((l_pad, 1), jnp.float32),
            tuple(conds) if conds is not None else (),
            sched, drop_rng,
        )
        state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            sched["lr"], jnp.float32
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, {"Loss": loss}

    return step

"""Fused Performer decode step — one Pallas kernel per generated token.

The incremental AR decode step (models/performer.py ``decode_step``) is
the serving hot loop: per token it streams every layer's weights, FAVOR
prefix state and local-attention ring buffers from HBM while the actual
math is a handful of (B, K)x(K, N) GEMVs.  Run as ~500 separate XLA ops
per step it pays per-op overhead and a pathological ring-buffer layout
tax (the (B, H, W, d) ring pads d=64 to 128 lanes — 2x read
amplification).  This module implements the whole depth-L step as ONE
``pallas_call`` with ``grid=(L,)``:

- per-layer weights are stacked (L, ...) arrays, int8-quantized per
  output channel (ops/quant.py) and dequantised **in-register** — int8
  is what crosses the HBM bus (an XLA-level dequant would be hoisted
  out of the sampling scan and materialised as bf16 copies in HBM);
- FAVOR (S, z) state is carried as (L, m, B*gh*dh) bf16-or-f32 /
  (L, B*gh, m) f32 blocks, aliased in/out (updated in place in HBM);
- local-head rings use a flat (L, RING, B*lh*dh) layout: reads are
  dense (zero lane-padding waste), scores/out become MXU matmuls
  against block-diagonal masks built from iota, and the *write* of the
  current token's (k, v) happens OUTSIDE the kernel as one contiguous
  in-place ``dynamic_update_slice`` on the scan carry;
- all elementwise glue (LayerNorm, FAVOR softmax-kernel features,
  rotary, masked softmax, GELU) runs on the VPU inside the same kernel.

Replaces (performance path of) the reference's token-by-token
full-forward sampling loop (src/networks/transformers/transformer.py:
84-93) — same math as models/performer.py ``decode_step``, which stays
as the general/fallback path.

Mosaic layout notes (probed on TPU v5e): reshapes that create tensors
with minor dim < 128 (e.g. (8,512)->(64,64)) crash the compiler, so
every intermediate is routed through (B, X), (1, B*X) or
(B*pair, 128)-style shapes; per-head reductions/broadcasts are MXU
matmuls against block masks instead of reshape/transpose shuffles.

Flattening convention everywhere: ``bh = b*nh + h``, flat lane
``j = bh*dh + d``; a (B, nh*dh) row-major tensor and its (1, B*nh*dh)
flat form agree with this convention, which is what makes the
iota-mask matmuls line up.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from synthanatomy_tpu.ops.quant import (
    quantize_int4_packed,
    quantize_int8,
    unpack_int4,
)


def _on_tpu_default_device() -> bool:
    """True when traced computation will execute on TPU (honours the
    `with jax.default_device(cpu)` host-init pattern)."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform == "tpu"
    return jax.default_backend() == "tpu"

__all__ = [
    "FusedDecodeConfig",
    "pack_fused_params",
    "init_fused_state",
    "update_rings",
    "fused_decode_step_ref",
    "make_fused_decode_step",
    "supports_fused_decode",
]


@dataclass(frozen=True)
class FusedDecodeConfig:
    depth: int
    batch: int
    dim: int
    heads: int
    dim_head: int
    local_heads: int
    local_window: int
    nb_features: int
    ff_mult: int = 4
    ring: int = 0  # 0 → round window up to a multiple of 64
    quantize: bool = True
    # weight stream format when quantize: "int8" (per-out-channel
    # scales) or "int4" — two nibbles per int8 byte split along the
    # contraction dim with per-(half, out-channel) scales
    # (ops/quant.py quantize_int4_packed), halving the dominant
    # weight-byte term of the decode roofline
    weight_quant: str = "int8"
    state_dtype: Any = jnp.bfloat16  # FAVOR S accumulator storage
    # int8 ring buffers with per-(slot, batch·head) scales: the rings
    # are the largest per-step HBM stream (~176 MB at the paper shape);
    # the scales fold into the score/probability tiles post-compaction
    # (zero extra bandwidth)
    ring_quant: bool = False
    # ReZero blocks (the PAPER config, reference README.md:140): no
    # pre-norms; the per-layer g_attn/g_ff scalars are folded into the
    # out-projection / FF-down weights at pack time (exact scalar
    # algebra), so the kernel only needs to SKIP the LayerNorms —
    # a trace-time branch, zero runtime cost
    use_rezero: bool = False

    @property
    def gh(self) -> int:
        return self.heads - self.local_heads

    @property
    def ring_size(self) -> int:
        if self.ring:
            return self.ring
        return max(128, ((self.local_window + 63) // 64) * 64)

    @property
    def ff_inner(self) -> int:
        return self.dim * self.ff_mult

    @property
    def bg(self) -> int:  # FAVOR flat width (B*gh*dh)
        return self.batch * self.gh * self.dim_head

    @property
    def bl(self) -> int:  # ring flat width (B*lh*dh)
        return self.batch * self.local_heads * self.dim_head

    @property
    def pair(self) -> int:
        """heads packed per 128-lane row in the feature projection."""
        return _feature_pair(self.dim_head, self.gh)


def _feature_pair(dim_head: int, gh: int) -> int:
    """Heads packed per 128-lane row of the FAVOR feature matmul.

    Capped to a divisor of the global-head count: pairing beyond it
    would make the (B, gh*dh) → (B*gh/pair, pair*dh) reshape MERGE
    rows across the lane dimension (e.g. (4, 64) → (2, 128) when
    gh=1, dh=64), which Mosaic's layout inference rejects; capped, the
    reshape only ever splits rows (or is the identity)."""
    p = max(1, 128 // dim_head)
    while gh % p:
        p //= 2
    return max(1, p)


def supports_fused_decode(model) -> bool:
    """The fused kernel covers the reference's paper configuration
    (softmax-kernel FAVOR + optional local hybrid heads, pre-LayerNorm
    OR ReZero blocks — the paper config uses ReZero, README.md:140 —
    non-GLU FF, no qkv/out biases, no per-layer rotary).  Anything else
    uses the general ``decode_step`` path."""
    gh = model.heads - model.local_attn_heads
    lh = model.local_attn_heads
    # Each head group's lane width must be whole 128-lane vregs on TPU:
    # the kernel's row-merging reshapes ((B, gh·dh) → (1, B·gh·dh) etc.)
    # are pure vreg reindexing then; sub-vreg rows (e.g. gh=1, dh=64)
    # would need lane shuffles Mosaic rejects ("infer-vector-layout:
    # unsupported shape cast").  The constraint is a Mosaic *lowering*
    # restriction — CPU interpret mode (tests) executes any shape.
    lanes_ok = (
        (gh * model.dim_head) % 128 == 0
        and (lh * model.dim_head) % 128 == 0
    ) or not _on_tpu_default_device()
    return (
        model.causal
        and not model.generalized_attention
        and not model.no_projection
        and not model.use_scalenorm
        and not model.ff_glu
        and not model.qkv_bias
        and not model.attn_out_bias
        and not model.rotary_position_emb
        and gh > 0
        and model.dim_head in (64, 128)
        and (model.dim * model.ff_mult) % 128 == 0
        and model.dim % 128 == 0
        and lanes_ok
    )


# ---------------------------------------------------------------------------
# parameter packing
# ---------------------------------------------------------------------------


def _stack(arrs):
    return jnp.stack([jnp.asarray(a, jnp.float32) for a in arrs])


def pack_fused_params(
    model, variables, *, weight_quant: str = "int8"
) -> Dict[str, jax.Array]:
    """Stack per-layer flax params into the kernel's (L, ...) arrays.

    ``proj2`` is the FAVOR projection pre-transposed and block-
    diagonally tiled ``pair`` times so the feature matmul consumes
    (B*gh/pair, pair*dh) rows directly (see module docstring).
    """
    params = variables["params"]
    favor = variables["favor"]
    L = model.depth
    dh = model.dim_head
    pair = _feature_pair(dh, model.heads - model.local_attn_heads)
    qkv_w, out_w, w1, b1, w2, b2 = [], [], [], [], [], []
    ln1_s, ln1_b, ln2_s, ln2_b, projs = [], [], [], [], []
    for i in range(L):
        blk = params[f"block_{i}"]
        attn = blk["attn"]
        qkv_w.append(
            jnp.concatenate(
                [
                    jnp.asarray(attn["to_q"]["kernel"], jnp.float32),
                    jnp.asarray(attn["to_k"]["kernel"], jnp.float32),
                    jnp.asarray(attn["to_v"]["kernel"], jnp.float32),
                ],
                axis=1,
            )
        )
        out_w.append(attn["to_out"]["kernel"])
        w1.append(blk["ff"]["w1"]["kernel"])
        b1.append(blk["ff"]["w1"]["bias"])
        if model.use_rezero:
            # fold the ReZero gains into the weights the outputs flow
            # through: g·(o@W_out) == o@(g·W_out); g·(x@W2 + b2) ==
            # x@(g·W2) + g·b2 — exact, and the kernel then just skips
            # the (nonexistent) pre-norms
            g_a = jnp.asarray(blk["g_attn"], jnp.float32)[0]
            g_f = jnp.asarray(blk["g_ff"], jnp.float32)[0]
            out_w[-1] = jnp.asarray(out_w[-1], jnp.float32) * g_a
            w2.append(jnp.asarray(blk["ff"]["w2"]["kernel"], jnp.float32) * g_f)
            b2.append(jnp.asarray(blk["ff"]["w2"]["bias"], jnp.float32) * g_f)
            zeros_d = jnp.zeros((model.dim,), jnp.float32)
            ln1_s.append(zeros_d)
            ln1_b.append(zeros_d)
            ln2_s.append(zeros_d)
            ln2_b.append(zeros_d)
        else:
            w2.append(blk["ff"]["w2"]["kernel"])
            b2.append(blk["ff"]["w2"]["bias"])
            ln1_s.append(blk["norm_attn"]["scale"])
            ln1_b.append(blk["norm_attn"]["bias"])
            ln2_s.append(blk["norm_ff"]["scale"])
            ln2_b.append(blk["norm_ff"]["bias"])
        p = jnp.asarray(favor[f"block_{i}"]["attn"]["projection"], jnp.float32)
        m = p.shape[0]
        pt = p.T  # (dh, m)
        if pair > 1:
            z = jnp.zeros_like(pt)
            pt = jnp.block([[pt, z], [z, pt]])  # (2dh, 2m)
        projs.append(pt)

    quant_one = (
        quantize_int4_packed if weight_quant == "int4" else quantize_int8
    )

    def quant_stack(ws):
        qs, ss = [], []
        for w in ws:
            q, s = quant_one(jnp.asarray(w, jnp.float32))
            qs.append(q)
            ss.append(s)
        return jnp.stack(qs), jnp.stack(ss)

    wqkv_q, wqkv_s = quant_stack(qkv_w)
    wout_q, wout_s = quant_stack(out_w)
    w1_q, w1_s = quant_stack(w1)
    w2_q, w2_s = quant_stack(w2)
    return {
        "wqkv_q": wqkv_q, "wqkv_s": wqkv_s,
        "wout_q": wout_q, "wout_s": wout_s,
        "w1_q": w1_q, "w1_s": w1_s, "b1": _stack(b1)[:, None, :],
        "w2_q": w2_q, "w2_s": w2_s, "b2": _stack(b2)[:, None, :],
        "ln1_s": _stack(ln1_s)[:, None, :], "ln1_b": _stack(ln1_b)[:, None, :],
        "ln2_s": _stack(ln2_s)[:, None, :], "ln2_b": _stack(ln2_b)[:, None, :],
        "proj2": _stack(projs),
        # f32 (unquantized) copies for the reference path / tests
        "_wqkv_f": _stack(qkv_w), "_wout_f": _stack(out_w),
        "_w1_f": _stack(w1), "_w2_f": _stack(w2),
    }


def strip_reference_weights(params: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Drop the f32 copies kept for the reference path (the production
    sampler only ships the int8 weights to the device)."""
    return {k: v for k, v in params.items() if not k.startswith("_")}


def init_fused_state(cfg: FusedDecodeConfig) -> Dict[str, jax.Array]:
    L = cfg.depth
    state = {
        "S": jnp.zeros((L, cfg.nb_features, cfg.bg), cfg.state_dtype),
        "z": jnp.zeros((L, cfg.batch * cfg.gh, cfg.nb_features), jnp.float32),
    }
    if cfg.local_heads:
        if cfg.ring_quant:
            blh = cfg.batch * cfg.local_heads
            state["ck"] = jnp.zeros((L, cfg.ring_size, cfg.bl), jnp.int8)
            state["cv"] = jnp.zeros((L, cfg.ring_size, cfg.bl), jnp.int8)
            state["ck_s"] = jnp.zeros((L, cfg.ring_size, blh), jnp.float32)
            state["cv_s"] = jnp.zeros((L, cfg.ring_size, blh), jnp.float32)
        else:
            state["ck"] = jnp.zeros((L, cfg.ring_size, cfg.bl), jnp.bfloat16)
            state["cv"] = jnp.zeros((L, cfg.ring_size, cfg.bl), jnp.bfloat16)
    return state


def update_rings(state, k_all, v_all, t, cfg: FusedDecodeConfig):
    """In-place (scan-carry) insertion of the current token's rotated
    keys/values: one contiguous dynamic_update_slice per ring (plus the
    per-(layer, batch·head) scale rows in int8 mode)."""
    if not cfg.local_heads:
        return state
    slot = jnp.mod(jnp.asarray(t, jnp.int32), cfg.ring_size)
    state = dict(state)
    if cfg.ring_quant:
        L = cfg.depth
        blh = cfg.batch * cfg.local_heads
        dh = cfg.dim_head

        def quant_row(x):
            xh = x.reshape(L, blh, dh)
            s = jnp.max(jnp.abs(xh), axis=-1) / 127.0  # (L, blh)
            s = jnp.maximum(s, 1e-8)
            q = jnp.clip(
                jnp.round(xh / s[..., None]), -127, 127
            ).astype(jnp.int8)
            return q.reshape(L, cfg.bl), s

        kq, ks = quant_row(k_all)
        vq, vs = quant_row(v_all)
        state["ck"] = jax.lax.dynamic_update_slice(
            state["ck"], kq[:, None, :], (0, slot, 0)
        )
        state["cv"] = jax.lax.dynamic_update_slice(
            state["cv"], vq[:, None, :], (0, slot, 0)
        )
        state["ck_s"] = jax.lax.dynamic_update_slice(
            state["ck_s"], ks[:, None, :], (0, slot, 0)
        )
        state["cv_s"] = jax.lax.dynamic_update_slice(
            state["cv_s"], vs[:, None, :], (0, slot, 0)
        )
        return state
    state["ck"] = jax.lax.dynamic_update_slice(
        state["ck"], k_all[:, None, :].astype(jnp.bfloat16), (0, slot, 0)
    )
    state["cv"] = jax.lax.dynamic_update_slice(
        state["cv"], v_all[:, None, :].astype(jnp.bfloat16), (0, slot, 0)
    )
    return state


# ---------------------------------------------------------------------------
# pure-JAX reference (same math/layout; runs anywhere, used in tests)
# ---------------------------------------------------------------------------


def _rotary_vecs(t, dh):
    half = dh // 2
    inv = 1.0 / (10000.0 ** (jnp.arange(half, dtype=jnp.float32) * 2.0 / dh))
    ang = jnp.asarray(t, jnp.float32) * inv
    ang2 = jnp.concatenate([ang, ang])
    return jnp.sin(ang2), jnp.cos(ang2)


def _rot_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _layernorm_ref(x, scale, bias, eps=1e-6):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def fused_decode_step_ref(
    params: Dict[str, jax.Array],
    state: Dict[str, jax.Array],
    h: jax.Array,  # (B, D) f32 embedded token (+ positional rows)
    t: jax.Array,  # int32 scalar token position
    cfg: FusedDecodeConfig,
    *,
    use_quantized: Optional[bool] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array], jax.Array, jax.Array]:
    """Returns (h_out (B, D) f32, new_state, k_all (L, BL), v_all)."""
    B, D, H, dh = cfg.batch, cfg.dim, cfg.heads, cfg.dim_head
    gh, lh, m = cfg.gh, cfg.local_heads, cfg.nb_features
    R, Wn = cfg.ring_size, cfg.local_window
    quant = cfg.quantize if use_quantized is None else use_quantized
    dn = dh ** -0.25
    ratio = m ** -0.5

    def matmul(x, wq, ws, wf):
        if quant and cfg.weight_quant == "int4":
            # same op order as the kernel: unpack nibbles, two half
            # dots, per-half f32 post-scale
            lo, hi = unpack_int4(wq)
            kh = lo.shape[0]
            xb = x.astype(jnp.bfloat16)
            return (
                jnp.dot(
                    xb[:, :kh], lo.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ) * ws[0:1]
                + jnp.dot(
                    xb[:, kh:], hi.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ) * ws[1:2]
            )
        if quant:
            # same op order as the kernel: int8→bf16 dot, f32 post-scale
            y = jnp.dot(
                x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return y * ws
        return jnp.dot(
            x.astype(jnp.bfloat16), wf.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    # recover the plain projᵀ (dh, m) from the packed block-diagonal
    pair = cfg.pair
    new_S, new_z, k_list, v_list = [], [], [], []
    sin, cos = _rotary_vecs(t, dh)
    h = jnp.asarray(h, jnp.float32)
    for i in range(cfg.depth):
        projT = params["proj2"][i][:dh, :m]
        # ReZero: no pre-norm (the g gains are folded into the weights)
        a = (
            h if cfg.use_rezero
            else _layernorm_ref(h, params["ln1_s"][i, 0], params["ln1_b"][i, 0])
        )
        y = matmul(a, params["wqkv_q"][i], params["wqkv_s"][i],
                   params["_wqkv_f"][i])
        q, k, v = jnp.split(y, 3, axis=-1)  # (B, H*dh) each
        outs = []
        # ---- global FAVOR heads
        qg = q[:, : gh * dh].reshape(B * gh, dh)
        kg = k[:, : gh * dh].reshape(B * gh, dh)
        vg = v[:, : gh * dh].reshape(B * gh, dh)
        dash_q = (qg * dn) @ projT  # (Bg, m)
        dash_k = (kg * dn) @ projT
        diag_q = jnp.sum(jnp.square(qg), -1, keepdims=True) * (0.5 * dn * dn)
        diag_k = jnp.sum(jnp.square(kg), -1, keepdims=True) * (0.5 * dn * dn)
        # stabilizer over dash only (matches ops/favor.py:115-120; the
        # -diag shift does not cancel through the +eps guard)
        stab = jnp.max(dash_q, -1, keepdims=True)
        q_p = ratio * (jnp.exp(dash_q - diag_q - stab) + 1e-4)
        k_p = ratio * (jnp.exp(dash_k - diag_k) + 1e-4)
        S = state["S"][i].astype(jnp.float32)  # (m, BG)
        S = S + k_p.T @ (
            _eye_mask(B * gh, dh) * vg.reshape(1, -1)
        )  # rank-B*gh update in flat layout
        z = state["z"][i] + k_p
        numR = q_p @ S  # (Bg, BG)
        num = jnp.sum(numR * _eye_mask(B * gh, dh), axis=0)  # (BG,)
        den = jnp.maximum(jnp.sum(q_p * z, -1), 1e-12)  # (Bg,)
        og = (num.reshape(B * gh, dh) / den[:, None]).reshape(B, gh * dh)
        outs.append(og)
        new_S.append(S.astype(cfg.state_dtype))
        new_z.append(z)
        # ---- local windowed heads
        if lh:
            ql = q[:, gh * dh :].reshape(B * lh, dh)
            kl = k[:, gh * dh :].reshape(B * lh, dh)
            vl = v[:, gh * dh :].reshape(B * lh, dh)
            scale = dh ** -0.5
            qr = ql * cos + _rot_half(ql) * sin
            kr = kl * cos + _rot_half(kl) * sin
            K = state["ck"][i].astype(jnp.float32)  # (R, BL)
            V = state["cv"][i].astype(jnp.float32)
            Qmat = qr.reshape(-1)[:, None] * _eye_mask(B * lh, dh).T
            s_ring = (K @ Qmat) * scale  # (R, Bl)
            if cfg.ring_quant:
                # same fold order as the kernel: dequant scale applied
                # post-compaction
                s_ring = s_ring * state["ck_s"][i]
            w_idx = jnp.arange(R)
            k_pos = t - 1 - jnp.mod(t - 1 - w_idx, R)
            valid = (k_pos >= 0) & (k_pos > t - Wn)
            s_ring = jnp.where(valid[:, None], s_ring, -jnp.inf)
            s_self = jnp.sum(qr * kr, -1) * scale  # (Bl,)
            mx = jnp.maximum(jnp.max(s_ring, axis=0), s_self)
            p_ring = jnp.exp(s_ring - mx[None, :])
            p_self = jnp.exp(s_self - mx)
            den_l = jnp.sum(p_ring, axis=0) + p_self
            p_eff = p_ring * state["cv_s"][i] if cfg.ring_quant else p_ring
            p_exp = p_eff @ _eye_mask(B * lh, dh)  # (R, BL)
            o_flat = jnp.sum(p_exp * V, axis=0)
            o_flat = (o_flat + jnp.repeat(p_self, dh) * vl.reshape(-1)) / (
                jnp.repeat(den_l, dh)
            )
            outs.append(o_flat.reshape(B, lh * dh))
            k_list.append(kr.reshape(-1))
            v_list.append(vl.reshape(-1))
        o = jnp.concatenate(outs, axis=-1)  # (B, H*dh)
        attn_out = matmul(o, params["wout_q"][i], params["wout_s"][i],
                          params["_wout_f"][i])
        h = h + attn_out
        f = (
            h if cfg.use_rezero
            else _layernorm_ref(h, params["ln2_s"][i, 0], params["ln2_b"][i, 0])
        )
        f1 = matmul(f, params["w1_q"][i], params["w1_s"][i], params["_w1_f"][i])
        f1 = jax.nn.gelu(f1 + params["b1"][i, 0])
        f2 = matmul(f1, params["w2_q"][i], params["w2_s"][i], params["_w2_f"][i])
        h = h + f2 + params["b2"][i, 0]

    new_state = dict(state)
    new_state["S"] = jnp.stack(new_S)
    new_state["z"] = jnp.stack(new_z)
    k_all = jnp.stack(k_list) if lh else jnp.zeros((cfg.depth, 0))
    v_all = jnp.stack(v_list) if lh else jnp.zeros((cfg.depth, 0))
    return h, new_state, k_all, v_all


def _eye_mask(nb: int, dh: int) -> jax.Array:
    """(nb, nb*dh) mask with M[c, j] = (j // dh == c)."""
    c = jax.lax.broadcasted_iota(jnp.int32, (nb, nb * dh), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (nb, nb * dh), 1)
    return (j // dh == c).astype(jnp.float32)


# ---------------------------------------------------------------------------
# the Pallas kernel
# ---------------------------------------------------------------------------


def _build_kernel(cfg: FusedDecodeConfig):
    B, D, H, dh = cfg.batch, cfg.dim, cfg.heads, cfg.dim_head
    gh, lh, m = cfg.gh, cfg.local_heads, cfg.nb_features
    R, Wn, F, L = cfg.ring_size, cfg.local_window, cfg.ff_inner, cfg.depth
    pair = cfg.pair
    dn = dh ** -0.25
    ratio = m ** -0.5
    att_scale = dh ** -0.5
    Bg, Bl = B * gh, B * lh
    half = dh // 2

    rq = cfg.ring_quant

    def kernel(*refs):
        (t_ref, h_ref,
         ln1_s, ln1_b, ln2_s, ln2_b,
         wqkv_q, wqkv_s, wout_q, wout_s,
         w1_q, w1_s, b1, w2_q, w2_s, b2, proj2,
         S_in, z_in) = refs[:19]
        rest = refs[19:]
        if lh:
            ck, cv = rest[0], rest[1]
            rest = rest[2:]
            if rq:
                cks, cvs = rest[0], rest[1]
                rest = rest[2:]
        h_out, S_out, z_out = rest[0], rest[1], rest[2]
        if lh:
            k_out, v_out = rest[3], rest[4]
        h_scratch = rest[-1]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            h_scratch[...] = h_ref[...]

        t = t_ref[0]
        h = h_scratch[...]

        def layernorm(x, s_ref, b_ref):
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
            return (x - mu) * jax.lax.rsqrt(var + 1e-6) * s_ref[0] + b_ref[0]

        int4 = cfg.quantize and cfg.weight_quant == "int4"

        def qmat(x, wq_ref, ws_ref):
            if int4:
                lo, hi = unpack_int4(wq_ref[0])
                kh = lo.shape[0]
                xb = x.astype(jnp.bfloat16)
                w_s = ws_ref[0]  # (2, N)
                return (
                    jnp.dot(
                        xb[:, :kh], lo.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    ) * w_s[0:1]
                    + jnp.dot(
                        xb[:, kh:], hi.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    ) * w_s[1:2]
                )
            w = wq_ref[0].astype(jnp.bfloat16)
            y = jnp.dot(
                x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
            )
            return y * ws_ref[0]

        # ---- attention ----------------------------------------------------
        # ReZero (static branch, zero runtime cost): no pre-norm — the
        # g_attn/g_ff gains are folded into wout/w2/b2 at pack time
        a = h if cfg.use_rezero else layernorm(h, ln1_s, ln1_b)
        y = qmat(a, wqkv_q, wqkv_s)  # (B, 3*H*dh) f32
        q = y[:, : H * dh]
        k = y[:, H * dh : 2 * H * dh]
        v = y[:, 2 * H * dh :]

        # ---- global FAVOR heads (rows land in bh = b*gh + h order) -------
        # (B, gh*dh) → (B*gh/pair, pair*dh) → features → (B*gh, m)
        GW = gh * dh  # global lane width
        qg2 = q[:, :GW].reshape(B * gh // pair, pair * dh)
        kg2 = k[:, :GW].reshape(B * gh // pair, pair * dh)
        p2 = proj2[0]  # (pair*dh, pair*m)
        dash_q2 = jnp.dot(
            qg2 * dn, p2, preferred_element_type=jnp.float32
        )  # (Bg/pair, pair*m)
        dash_k2 = jnp.dot(kg2 * dn, p2, preferred_element_type=jnp.float32)
        # per-head ||x||²/2·dn² broadcast over that head's m-block
        lidx = jax.lax.broadcasted_iota(jnp.int32, (pair * dh, pair * m), 0)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (pair * dh, pair * m), 1)
        Dmask = (lidx // dh == cidx // m).astype(jnp.float32)
        diag_q2 = jnp.dot(
            jnp.square(qg2) * (0.5 * dn * dn), Dmask,
            preferred_element_type=jnp.float32,
        )
        diag_k2 = jnp.dot(
            jnp.square(kg2) * (0.5 * dn * dn), Dmask,
            preferred_element_type=jnp.float32,
        )
        dash_q = dash_q2.reshape(Bg, m)  # rows land in b*gh + h order
        dash_k = dash_k2.reshape(Bg, m)
        diag_q = diag_q2.reshape(Bg, m)  # row-constant per head
        diag_k = diag_k2.reshape(Bg, m)
        # stabilizer over dash only (matches ops/favor.py:115-120)
        stab = jnp.max(dash_q, axis=-1, keepdims=True)
        q_p = ratio * (jnp.exp(dash_q - diag_q - stab) + 1e-4)  # (Bg, m)
        k_p = ratio * (jnp.exp(dash_k - diag_k) + 1e-4)

        cg = jax.lax.broadcasted_iota(jnp.int32, (Bg, Bg * dh), 0)
        jg = jax.lax.broadcasted_iota(jnp.int32, (Bg, Bg * dh), 1)
        Eg = (jg // dh == cg).astype(jnp.float32)  # (Bg, BG)

        v_flat_g = v[:, :GW].reshape(1, Bg * dh)
        S = S_in[0].astype(jnp.float32)  # (m, BG)
        kp_exp = jnp.dot(k_p.T, Eg, preferred_element_type=jnp.float32)
        S = S + kp_exp * v_flat_g
        z = z_in[0] + k_p  # (Bg, m)

        numR = jnp.dot(
            q_p.astype(jnp.bfloat16), S.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # (Bg, BG)
        num = jnp.sum(numR * Eg, axis=0, keepdims=True)  # (1, BG)
        den = jnp.maximum(jnp.sum(q_p * z, -1, keepdims=True), 1e-12)
        den_exp = jnp.dot(
            den.reshape(1, Bg), Eg, preferred_element_type=jnp.float32
        )
        og_flat = (num / den_exp).reshape(B, gh * dh)

        S_out[0] = S.astype(S_out.dtype)
        z_out[0] = z

        if lh:
            LW = lh * dh
            ql = q[:, GW:]  # (B, lh*dh)
            kl = k[:, GW:]
            vl = v[:, GW:]
            # rotary at position t, applied per dh-lane segment
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, LW), 1)
            dd = lane % dh
            inv = jnp.exp(
                (dd % half).astype(jnp.float32)
                * (-2.0 * math.log(10000.0) / dh)
            )
            ang = t.astype(jnp.float32) * inv
            sinp = jnp.sin(ang)
            cosp = jnp.cos(ang)
            first = dd < half

            def rot(x):
                # pltpu.roll requires non-negative shifts; rolling the
                # whole LW-lane axis by (LW - half) == rolling by -half,
                # and both picks stay within their dh segment
                partner = jnp.where(
                    first,
                    -pltpu.roll(x, LW - half, 1),
                    pltpu.roll(x, half, 1),
                )
                return x * cosp + partner * sinp

            qr = rot(ql)  # (B, lh*dh)
            kr = rot(kl)
            qr_flat = qr.reshape(1, Bl * dh)
            kr_flat = kr.reshape(1, Bl * dh)
            vl_flat = vl.reshape(1, Bl * dh)

            cl = jax.lax.broadcasted_iota(jnp.int32, (Bl, Bl * dh), 0)
            jl = jax.lax.broadcasted_iota(jnp.int32, (Bl, Bl * dh), 1)
            El = (jl // dh == cl).astype(jnp.float32)  # (Bl, BL) expander
            jt = jax.lax.broadcasted_iota(jnp.int32, (Bl * dh, Bl), 0)
            ct = jax.lax.broadcasted_iota(jnp.int32, (Bl * dh, Bl), 1)
            ElT = (jt // dh == ct).astype(jnp.bfloat16)  # (BL, Bl) compactor

            K = ck[0]  # (R, BL) bf16
            V = cv[0]
            # scores: elementwise q-broadcast then MXU compaction
            kq = K.astype(jnp.float32) * qr_flat  # (R, BL)
            s_ring = jnp.dot(
                kq.astype(jnp.bfloat16), ElT,
                preferred_element_type=jnp.float32,
            ) * att_scale  # (R, Bl)
            if rq:
                # int8 dequant scale is constant within each head's
                # dh-lane block → folds exactly post-compaction
                s_ring = s_ring * cks[0]
            w_idx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
            k_pos = t - 1 - jnp.mod(t - 1 - w_idx, R)
            valid = (k_pos >= 0) & (k_pos > t - Wn)
            s_ring = jnp.where(valid, s_ring, -jnp.inf)
            # self score, compacted to (1, Bl)
            s_self_flat = qr_flat * kr_flat  # (1, BL)
            s_self = jnp.dot(
                s_self_flat.astype(jnp.bfloat16), ElT,
                preferred_element_type=jnp.float32,
            ) * att_scale  # (1, Bl)
            mx = jnp.maximum(jnp.max(s_ring, axis=0, keepdims=True), s_self)
            p_ring = jnp.exp(s_ring - mx)  # (R, Bl)
            p_self = jnp.exp(s_self - mx)  # (1, Bl)
            den_l = jnp.sum(p_ring, axis=0, keepdims=True) + p_self
            p_eff = p_ring * cvs[0] if rq else p_ring
            p_exp = jnp.dot(
                p_eff.astype(jnp.bfloat16), El.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )  # (R, BL)
            o_flat = jnp.sum(p_exp * V.astype(jnp.float32), axis=0,
                             keepdims=True)
            p_self_exp = jnp.dot(p_self, El, preferred_element_type=jnp.float32)
            den_exp_l = jnp.dot(den_l, El, preferred_element_type=jnp.float32)
            o_flat = (o_flat + p_self_exp * vl_flat) / den_exp_l  # (1, BL)
            ol = o_flat.reshape(B, lh * dh)

            k_out[0] = kr_flat
            v_out[0] = vl_flat
            o = jnp.concatenate([og_flat, ol], axis=-1)
        else:
            o = og_flat

        attn_out = qmat(o, wout_q, wout_s)
        h = h + attn_out

        # ---- feed-forward --------------------------------------------------
        f = h if cfg.use_rezero else layernorm(h, ln2_s, ln2_b)
        f1 = qmat(f, w1_q, w1_s) + b1[0]
        f1 = jax.nn.gelu(f1)
        f2 = qmat(f1, w2_q, w2_s) + b2[0]
        h = h + f2

        h_scratch[...] = h

        @pl.when(i == L - 1)
        def _():
            h_out[...] = h

    return kernel


def make_fused_decode_step(cfg: FusedDecodeConfig, *, interpret: bool = False):
    """Build ``step(params, state, h, t) -> (h_out, new_state, k_all,
    v_all)`` running the whole depth-L decode step as one Pallas call.

    The caller embeds the token (+positional rows) into ``h`` and
    inserts (k_all, v_all) into the rings via :func:`update_rings` —
    both tiny XLA ops.
    """
    B, D, H, dh = cfg.batch, cfg.dim, cfg.heads, cfg.dim_head
    gh, lh, m = cfg.gh, cfg.local_heads, cfg.nb_features
    R, F, L = cfg.ring_size, cfg.ff_inner, cfg.depth
    pair = cfg.pair
    Bg, Bl = B * gh, B * lh
    kernel = _build_kernel(cfg)

    def layer_spec(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(
            (1,) + shape, lambda i: (i,) + zeros, memory_space=pltpu.VMEM
        )

    def const_spec(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i: zeros, memory_space=pltpu.VMEM)

    int4 = cfg.quantize and cfg.weight_quant == "int4"
    kdiv = 2 if int4 else 1  # packed weights hold K/2 rows
    srows = 2 if int4 else 1  # per-half scales
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # t (1,)
        const_spec((B, D)),  # h
        layer_spec((1, D)), layer_spec((1, D)),  # ln1 scale/bias
        layer_spec((1, D)), layer_spec((1, D)),  # ln2
        layer_spec((D // kdiv, 3 * H * dh)), layer_spec((srows, 3 * H * dh)),
        layer_spec((H * dh // kdiv, D)), layer_spec((srows, D)),
        layer_spec((D // kdiv, F)), layer_spec((srows, F)),
        layer_spec((1, F)),  # b1
        layer_spec((F // kdiv, D)), layer_spec((srows, D)),
        layer_spec((1, D)),  # b2
        layer_spec((pair * dh, pair * m)),  # proj2
        layer_spec((m, Bg * dh)),  # S
        layer_spec((Bg, m)),  # z
    ]
    out_specs = [
        const_spec((B, D)),
        layer_spec((m, Bg * dh)),
        layer_spec((Bg, m)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((B, D), jnp.float32),
        jax.ShapeDtypeStruct((L, m, Bg * dh), cfg.state_dtype),
        jax.ShapeDtypeStruct((L, Bg, m), jnp.float32),
    ]
    if lh:
        in_specs += [layer_spec((R, Bl * dh)), layer_spec((R, Bl * dh))]
        if cfg.ring_quant:
            in_specs += [layer_spec((R, Bl)), layer_spec((R, Bl))]
        out_specs += [layer_spec((1, Bl * dh)), layer_spec((1, Bl * dh))]
        out_shapes += [
            jax.ShapeDtypeStruct((L, 1, Bl * dh), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, Bl * dh), jnp.float32),
        ]

    # S (arg 17) → out 1, z (arg 18) → out 2, in-place in HBM
    aliases = {17: 1, 18: 2}

    call = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )

    param_order = [
        "ln1_s", "ln1_b", "ln2_s", "ln2_b",
        "wqkv_q", "wqkv_s", "wout_q", "wout_s",
        "w1_q", "w1_s", "b1", "w2_q", "w2_s", "b2", "proj2",
    ]

    def step(params, state, h, t):
        t_arr = jnp.asarray(t, jnp.int32).reshape(1)
        args = [t_arr, jnp.asarray(h, jnp.float32)]
        args += [params[k] for k in param_order]
        args += [state["S"], state["z"]]
        if lh:
            args += [state["ck"], state["cv"]]
            if cfg.ring_quant:
                args += [state["ck_s"], state["cv_s"]]
        outs = call(*args)
        h_out, S, z = outs[0], outs[1], outs[2]
        new_state = dict(state)
        new_state["S"], new_state["z"] = S, z
        if lh:
            k_all, v_all = outs[3][:, 0, :], outs[4][:, 0, :]
        else:
            k_all = v_all = jnp.zeros((L, 0), jnp.float32)
        return h_out, new_state, k_all, v_all

    return step

"""Fused Pallas kernels for causal FAVOR+ attention (softmax kernel).

Two costs dominate the XLA path (``ops.favor``) at the paper shape:
materializing the fp32 feature maps q_p/k_p (B, H, L, m) through HBM
(~400 MB/layer) and the ``lax.scan`` chunk copies.  These kernels fuse
BOTH the softmax-kernel feature maps (reference performer-pytorch
math: φ(x) = m^(-1/2)·(exp(x·dn·Pᵀ − ‖x‖²dn²/2 − stab) + ε), query
rowmax stabilizer, zero key stabilizer — the batch==incremental design
of ops/favor.py) and the causal prefix scan into one VMEM-resident
pass: HBM traffic per layer drops to the q/k/v/out streams (~30 MB).

Grid = (batch·head tile, chunk): each grid step processes a ``bt``-deep
batch·head tile of chunks (round 3 — the chunk sweep at the paper
shape is 48·11 = 528 steps of small matmuls; batching amortizes the
per-step fixed costs and widens the MXU batch dims).  The running
(S: (bt, m, d), z: (bt, 1, m)) state lives in VMEM scratch across the
chunk sweep.  ``jax.custom_vjp``:

- forward: features + scan; saves only (L,) denominators + output.
- backward dq: forward-order sweep recomputing features and prefix
  (S, z); chains dq_p → dq through the exp/diag/max-stabilizer (the
  rowmax subgradient splits evenly across ties, matching JAX autodiff).
- backward dk/dv: reverse-order sweep carrying suffix
  (Σ q_pᵀ·dnum, Σ q_pᵀ·gd) statistics; chains dk_p → dk (zero key
  stabilizer ⇒ no routing term).

The projection matrix is a non-trained buffer in the reference
(performer-pytorch registers it as a buffer; redrawn, never trained) —
its cotangent is returned as zeros.

Matmul operands in the caller's compute dtype (bf16 under the training
policy), fp32 accumulation and fp32 feature/softmax math.

Chunk default is 128: at the paper length (1401) it pads 0.5% (vs 9.6%
at 256) and with the bt=8 tile the sweep is already only 66 grid
steps.  Known Mosaic limit (this libtpu): the backward kernels at
chunk=256 crash ApplyVectorLayout (`vector_extract` limits 2 vs 1 —
the (bt, c, 1) → (bt, c, 256) lane broadcast of gd spans two vregs);
chunk must stay ≤128 until that is rewritten as a matmul broadcast.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["favor_attention_fused"]

_EPS = 1e-4  # the consumed implementation's feature-map epsilon

# timing probe hook: swap the feature-map exp implementation (round-3
# probe: exp2(x·log2e) measured identical — the kernel is not
# transcendental-bound)
_EXP = jnp.exp


def _tri(c: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (r >= j)[None]


def _bdot(a, b, trans_a=False, trans_b=False):
    """Batched (leading ``bt`` dim) matmul, fp32 accumulation."""
    ca = (1,) if trans_a else (2,)
    cb = (2,) if trans_b else (1,)
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((ca[0],), (cb[0],)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _pdot(a, p):
    """(bt, c, x) · (m, x)ᵀ → (bt, c, m): unbatched projection matmul."""
    return jax.lax.dot_general(
        a, p,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pdot_t(a, p):
    """(bt, c, m) · (m, d) → (bt, c, d)."""
    return jax.lax.dot_general(
        a, p,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _features(q, k, p_ref, cd):
    """In-VMEM softmax-kernel feature maps for one chunk tile.

    q/k: (bt, c, d) fp32; returns (q_p, k_p, e_q, e_k, u_q) where
    e_* = exp(u − diag − stab) (needed for the backward chain) and the
    features are r·(e + ε).  Query stabilizer = rowmax; key = 0.
    """
    d = q.shape[-1]
    m = p_ref.shape[0]
    dn = d**-0.25
    r = m**-0.5
    p = p_ref[...]  # (m, d)
    u_q = _pdot((q * dn).astype(cd), p.astype(cd))  # (bt, c, m) f32
    u_k = _pdot((k * dn).astype(cd), p.astype(cd))
    diag_q = jnp.sum(q * q, axis=-1, keepdims=True) * (0.5 * dn * dn)
    diag_k = jnp.sum(k * k, axis=-1, keepdims=True) * (0.5 * dn * dn)
    s_q = jnp.max(u_q, axis=-1, keepdims=True)
    e_q = _EXP(u_q - diag_q - s_q)
    e_k = _EXP(u_k - diag_k)
    return r * (e_q + _EPS), r * (e_k + _EPS), e_q, e_k, u_q


def _dfeat_q(q, u_q, e_q, dqp, p_ref, cd):
    """Chain dL/dq_p → dL/dq through φ_q (rowmax stabilizer routed to
    ties evenly — identical to JAX's reduce_max VJP)."""
    d = q.shape[-1]
    m = p_ref.shape[0]
    dn = d**-0.25
    r = m**-0.5
    dE = dqp * (r * e_q)  # (bt, c, m)
    w = jnp.sum(dE, axis=-1, keepdims=True)  # (bt, c, 1)
    s_q = jnp.max(u_q, axis=-1, keepdims=True)
    ties = (u_q == s_q).astype(jnp.float32)
    cnt = jnp.sum(ties, axis=-1, keepdims=True)
    du = dE - ties * (w / cnt)
    dq = _pdot_t(du.astype(cd), p_ref[...].astype(cd)) * dn - w * (dn * dn) * q
    return dq


def _dfeat_k(k, e_k, dkp, p_ref, cd):
    """Chain dL/dk_p → dL/dk through φ_k (zero stabilizer ⇒ no
    routing)."""
    d = k.shape[-1]
    m = p_ref.shape[0]
    dn = d**-0.25
    r = m**-0.5
    dE = dkp * (r * e_k)
    w = jnp.sum(dE, axis=-1, keepdims=True)
    dk = _pdot_t(dE.astype(cd), p_ref[...].astype(cd)) * dn - w * (dn * dn) * k
    return dk


def _fwd_kernel(q_ref, k_ref, v_ref, p_ref, o_ref, den_ref, S_ref, z_ref):
    bt, c = q_ref.shape[0], q_ref.shape[1]
    cd = q_ref.dtype

    @pl.when(pl.program_id(1) == 0)
    def _():
        S_ref[...] = jnp.zeros_like(S_ref)
        z_ref[...] = jnp.zeros_like(z_ref)

    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...]
    qp, kp, _, _, _ = _features(q, k, p_ref, cd)
    qc = qp.astype(cd)
    kc = kp.astype(cd)

    scores = jnp.where(_tri(c), _bdot(qc, kc, trans_b=True), 0.0)  # (bt, c, c)
    num = _bdot(scores.astype(cd), v) + _bdot(qc, S_ref[...].astype(cd))
    den = (
        jnp.sum(scores, axis=-1, keepdims=True)
        + _bdot(qc, z_ref[...][:, :1].astype(cd), trans_b=True)
    )  # (bt, c, 1)
    inv = 1.0 / jnp.maximum(den, 1e-12)
    o_ref[...] = (num * inv).astype(o_ref.dtype)
    # den saved for the backward as a (c, 8) broadcast plane — a
    # (1, chunk) block would violate the (8, 128) tiling constraint
    den_ref[...] = jnp.broadcast_to(den, (bt, c, 8)).astype(den_ref.dtype)

    S_ref[...] += _bdot(kc, v, trans_a=True)
    z_ref[...] += jnp.sum(kp, axis=1, keepdims=True)  # all 8 rows alike


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, p_ref, g_ref, o_ref, den_ref, dq_ref, S_ref, z_ref
):
    c = q_ref.shape[1]
    cd = q_ref.dtype

    @pl.when(pl.program_id(1) == 0)
    def _():
        S_ref[...] = jnp.zeros_like(S_ref)
        z_ref[...] = jnp.zeros_like(z_ref)

    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...]
    qp, kp, e_q, _, u_q = _features(q, k, p_ref, cd)
    qc = qp.astype(cd)
    kc = kp.astype(cd)
    g = g_ref[...].astype(jnp.float32)
    out = o_ref[...].astype(jnp.float32)
    inv = 1.0 / jnp.maximum(den_ref[...][:, :, :1].astype(jnp.float32), 1e-12)

    dnum = g * inv  # (bt, c, d)
    gd = -jnp.sum(g * out, axis=-1, keepdims=True) * inv  # (bt, c, 1)

    dscores = jnp.where(
        _tri(c), _bdot(dnum.astype(cd), v, trans_b=True) + gd, 0.0
    )
    dqp = (
        _bdot(dscores.astype(cd), kc)
        + _bdot(dnum.astype(cd), S_ref[...].astype(cd), trans_b=True)
        + gd * z_ref[...][:, :1].astype(jnp.float32)
    )
    dq_ref[...] = _dfeat_q(q, u_q, e_q, dqp, p_ref, cd).astype(dq_ref.dtype)

    S_ref[...] += _bdot(kc, v, trans_a=True)
    z_ref[...] += jnp.sum(kp, axis=1, keepdims=True)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, p_ref, g_ref, o_ref, den_ref, dk_ref, dv_ref,
    dS_ref, dz_ref,
):
    c = q_ref.shape[1]
    cd = q_ref.dtype

    @pl.when(pl.program_id(1) == 0)
    def _():
        dS_ref[...] = jnp.zeros_like(dS_ref)
        dz_ref[...] = jnp.zeros_like(dz_ref)

    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...]
    qp, kp, _, e_k, _ = _features(q, k, p_ref, cd)
    qc = qp.astype(cd)
    kc = kp.astype(cd)
    g = g_ref[...].astype(jnp.float32)
    out = o_ref[...].astype(jnp.float32)
    inv = 1.0 / jnp.maximum(den_ref[...][:, :, :1].astype(jnp.float32), 1e-12)

    dnum = g * inv
    gd = -jnp.sum(g * out, axis=-1, keepdims=True) * inv

    tri = _tri(c)
    scores = jnp.where(tri, _bdot(qc, kc, trans_b=True), 0.0)
    dscores = jnp.where(
        tri, _bdot(dnum.astype(cd), v, trans_b=True) + gd, 0.0
    )

    # suffix statistics exclude the current chunk (strictly-later
    # chunks): use them BEFORE adding this chunk's contribution
    dS = dS_ref[...].astype(jnp.float32)  # (bt, m, d)
    dz = dz_ref[...][:, :1].astype(jnp.float32)  # (bt, 1, m)

    dkp = (
        _bdot(dscores.astype(cd), qc, trans_a=True)
        + _bdot(v, dS.astype(cd), trans_b=True)
        + dz
    )
    dv = _bdot(scores.astype(cd), dnum.astype(cd), trans_a=True) + _bdot(
        kc, dS.astype(cd)
    )
    dk_ref[...] = _dfeat_k(k, e_k, dkp, p_ref, cd).astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)

    dS_ref[...] += _bdot(qc, dnum.astype(cd), trans_a=True)
    # Σ_c qp·gd as a VPU reduction — a (bt, m, 1) matmul + transpose is
    # not Mosaic-friendly
    dz_ref[...] += jnp.sum(qp * gd, axis=1, keepdims=True)


def _flatten_pad(x, chunk: int):
    b, h, n, f = x.shape
    pad = (-n) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x.reshape(b * h, n + pad, f), (n + pad) // chunk


def _bh_tile(bh: int, chunk: int, m: int) -> int:
    """Batch·head tile per grid step: the chunk sweep is otherwise
    bh·nc small-matmul steps (528 at the paper shape).  Bounded so the
    ~6 live fp32 (bt, c, m) feature/score tensors stay well inside the
    16 MB VMEM (shared heuristic: ops/tiling.py)."""
    from synthanatomy_tpu.ops.tiling import vmem_bh_tile

    return vmem_bh_tile(bh, chunk * m, live=6)


def _specs(bt: int, chunk: int, d: int, nc: int, reverse: bool):
    if reverse:
        jm = lambda i, j: (i, nc - 1 - j, 0)  # noqa: E731
    else:
        jm = lambda i, j: (i, j, 0)  # noqa: E731
    x = pl.BlockSpec((bt, chunk, d), jm, memory_space=pltpu.VMEM)
    den = pl.BlockSpec((bt, chunk, 8), jm, memory_space=pltpu.VMEM)
    return x, den


def _proj_spec(m: int, d: int):
    return pl.BlockSpec((m, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM)


def _scratch(bt: int, m: int, d: int):
    # z is logically (bt, 1, m) but stored as an (bt, 8, m) broadcast
    # plane: a sublane dim of 1 is not a legal Mosaic tile
    return [
        pltpu.VMEM((bt, m, d), jnp.float32),
        pltpu.VMEM((bt, 8, m), jnp.float32),
    ]


def _fwd_impl(q, k, v, p, chunk: int, interpret: bool):
    b, h, n, d = q.shape
    m = p.shape[0]
    qf, nc = _flatten_pad(q, chunk)
    kf, _ = _flatten_pad(k, chunk)
    vf, _ = _flatten_pad(v, chunk)
    bh = b * h
    bt = _bh_tile(bh, chunk, m)

    sx, sden = _specs(bt, chunk, d, nc, reverse=False)
    out, den = pl.pallas_call(
        _fwd_kernel,
        grid=(bh // bt, nc),
        in_specs=[sx, sx, sx, _proj_spec(m, d)],
        out_specs=[sx, sden],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nc * chunk, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, nc * chunk, 8), jnp.float32),
        ],
        scratch_shapes=_scratch(bt, m, d),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * nc * chunk * (2 * m * d + chunk * m + chunk * d + 2 * m * d),
            bytes_accessed=bh * nc * chunk * 4 * d * q.dtype.itemsize,
            transcendentals=2 * bh * nc * chunk * m,
        ),
    )(qf, kf, vf, p)
    return out, den, nc


def _bwd_impl(q, k, v, p, g, out_flat, den_flat, nc, chunk: int, interpret: bool):
    b, h, n, d = q.shape
    m = p.shape[0]
    qf, _ = _flatten_pad(q, chunk)
    kf, _ = _flatten_pad(k, chunk)
    vf, _ = _flatten_pad(v, chunk)
    gf, _ = _flatten_pad(g.astype(q.dtype), chunk)
    bh = b * h
    bt = _bh_tile(bh, chunk, m)

    sx, sden = _specs(bt, chunk, d, nc, reverse=False)
    dq = pl.pallas_call(
        _bwd_dq_kernel,
        grid=(bh // bt, nc),
        in_specs=[sx, sx, sx, _proj_spec(m, d), sx, sx, sden],
        out_specs=sx,
        out_shape=jax.ShapeDtypeStruct((bh, nc * chunk, d), jnp.float32),
        scratch_shapes=_scratch(bt, m, d),
        interpret=interpret,
    )(qf, kf, vf, p, gf, out_flat, den_flat)

    rx, rden = _specs(bt, chunk, d, nc, reverse=True)
    dk, dv = pl.pallas_call(
        _bwd_dkv_kernel,
        grid=(bh // bt, nc),
        in_specs=[rx, rx, rx, _proj_spec(m, d), rx, rx, rden],
        out_specs=[rx, rx],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nc * chunk, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, nc * chunk, d), jnp.float32),
        ],
        scratch_shapes=_scratch(bt, m, d),
        interpret=interpret,
    )(qf, kf, vf, p, gf, out_flat, den_flat)

    def unflat(x):
        return x.reshape(b, h, nc * chunk, d)[:, :, :n]

    return unflat(dq), unflat(dk), unflat(dv)


# GSPMD-partitionable wrappers (see ops/partitioning.py): the scan is
# independent per (batch, head) slice, so b/h shard freely (DP batch,
# Megatron TP heads); the projection matrix is a shared weight and is
# replicated.  The partition boundary keeps every tensor 4-D
# (b, h, ..., .) so leading-dim shardings map cleanly; the flat
# (b·h, L', .) kernel layout is a reshape inside the per-shard lowering.
from synthanatomy_tpu.ops.partitioning import make_bh_partitioned


def _fwd_part(q, k, v, p, chunk, interpret):
    out, den, _nc = _fwd_impl(q, k, v, p, chunk, interpret)
    b, h, _, d = q.shape
    return out.reshape(b, h, -1, d), den.reshape(b, h, -1, 8)


def _bwd_part(q, k, v, p, g, out4, den4, chunk, interpret):
    b, h, _, d = q.shape
    nc = out4.shape[2] // chunk
    out_flat = out4.reshape(b * h, -1, d)
    den_flat = den4.reshape(b * h, -1, 8)
    return _bwd_impl(
        q, k, v, p, g, out_flat, den_flat, nc, chunk, interpret
    )


_fwd_p = make_bh_partitioned(
    _fwd_part,
    n_operands=4,
    static_argnums=(4, 5),
    rule="b h l d, b h l d, b h l d, m e -> b h k d, b h k f",
    replicated_argnums=(3,),
)
_bwd_p = make_bh_partitioned(
    _bwd_part,
    n_operands=7,
    static_argnums=(7, 8),
    rule=(
        "b h l d, b h l d, b h l d, m e, b h l d, b h k d, b h k f -> "
        "b h l d, b h l d, b h l d"
    ),
    replicated_argnums=(3,),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def favor_attention_fused(q, k, v, projection, chunk: int = 128,
                          interpret: bool = False):
    """Causal softmax-kernel FAVOR+ with fused feature maps + prefix
    scan.  q/k/v: (B, H, L, d) in compute dtype; projection: (m, d).
    Returns (B, H, L, d) fp32.  Math matches
    ``favor_attention(..., stabilize_keys=False)`` exactly (zero key
    stabilizer).  The projection cotangent is zeros (non-trained buffer
    in the reference)."""
    out4, _den4 = _fwd_p(q, k, v, projection, chunk, interpret)
    n = q.shape[2]
    return out4[:, :, :n]


def _vjp_fwd(q, k, v, projection, chunk, interpret):
    out4, den4 = _fwd_p(q, k, v, projection, chunk, interpret)
    n = q.shape[2]
    return out4[:, :, :n], (q, k, v, projection, out4, den4)


def _vjp_bwd(chunk, interpret, res, g):
    q, k, v, projection, out4, den4 = res
    dq, dk, dv = _bwd_p(
        q, k, v, projection, g, out4, den4, chunk, interpret
    )
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        jnp.zeros_like(projection),
    )


favor_attention_fused.defvjp(_vjp_fwd, _vjp_bwd)

"""Decompose the per-grid-step BODY cost of the training kernels.

The round-4 roofline (BASELINE.md) pins the 101.8 ms paper step's gap
at ~76 ms inside the two Pallas kernel families and proves (via
tools/probe_pallas_overhead.py) that invocation/grid bookkeeping is
~1 us/step — the cost is inside the per-step bodies.  But the roofline
only bounds MXU and HBM; both bodies also do heavy fp32 VPU work
(softmax over (bt, 256, 768) score tiles in the local kernels; feature
maps + exp over (bt, 128, 256) tiles in FAVOR), and the local BACKWARD
runs at bt=1 (live=4 x 786 KB tiles vs the 6 MB heuristic budget in
ops/tiling.py) — 288 grid steps/layer of batch-1 matmuls.

This probe measures, on the real chip at the exact paper shape
(b6 x 8 local + 8 FAVOR heads of dim_head=64, L=1401, w=420, m=256):

  1. the real local fwd/bwd and FAVOR fwd/dq/dkv per-invocation times;
  2. body ablations of the local kernels (matmuls-only, defer-norm,
     no-max) to split MXU vs softmax-VPU cost;
  3. tile ablations: local bwd at bt=2 (budget bump) and at s=128/bt=4;
  4. FAVOR body ablations (identity features, no causal mask select).

Methodology per the repo rules: every variant runs R reps inside one
jitted lax.scan with a carry data-dependency (no CSE), one np.asarray
on a reduced scalar at the end, persistent compile cache.

Run:  python tools/probe_kernel_body.py [--reps=50] [--quick]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from synthanatomy_tpu.ops import local_attention_pallas as lap
from synthanatomy_tpu.ops import favor_pallas as fav

# paper shape (tools/bench_transformer.py defaults: dim_head=64 —
# performer-pytorch's dim_head is independent of dim/heads, inner
# dim = 16 x 64 = 1024; m = default_nb_features(64) = 256)
B, H, L, D = 6, 8, 1401, 64  # 8 local + 8 FAVOR heads of the 16
W = 420
M_FEAT = 256
CHUNK = 128


def timed(fn, args, label, reps, n_meas: int = 5):
    """Tunnel timings drift ±20% minutes apart (measured: identical
    cached programs moved 840→1200 us between probe runs) — take the
    MIN of n_meas back-to-back measurements; min tracks the compute
    cost, the tail tracks tunnel scheduling noise."""
    out = fn(*args)
    np.asarray(out)  # compile + warm
    ts = []
    for _ in range(n_meas):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append((time.perf_counter() - t0) / reps)
    ts.sort()
    print(f"  {label:46s}: {ts[0] * 1e6:9.1f} us/invocation "
          f"(median {ts[len(ts) // 2] * 1e6:9.1f})")
    return ts[0]


def rep_harness(body, reps):
    """R reps of body(q, k, v, g) with a scalar carry perturbing q —
    prevents CSE across reps; returns a reduced scalar."""

    @jax.jit
    def fn(q, k, v, g):
        def step(c, _):
            out = body(q + c.astype(q.dtype), k, v, g)
            return jnp.float32(1e-12) * jnp.sum(out).astype(jnp.float32), None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=reps)
        return c

    return fn


# ---------------------------------------------------------------- local

def local_fwd_variant(mode: str, block_size=None, bt_override=None):
    """Rebuild lap._forward with a body ablation.  mode:
    full | matmuls (skip softmax: o = scores @ v) |
    defer (probs unnormalized; divide the (bt,s,d) output) |
    nomax (skip the rowmax stabilizer)."""
    s, nl = lap._band_params(W, block_size)
    span = (nl + 1) * s

    def kernel(*refs):
        q_ref = refs[0]
        k_refs = refs[1 : 2 + nl]
        v_refs = refs[2 + nl : 3 + 2 * nl]
        bias_ref = refs[3 + 2 * nl]
        o_ref = refs[4 + 2 * nl]
        cd = q_ref.dtype
        q = q_ref[:, 0]
        k2 = jnp.concatenate([r[:, 0] for r in k_refs], axis=1)
        v2 = jnp.concatenate([r[:, 0] for r in v_refs], axis=1)
        d = q_ref.shape[3]
        if mode == "foldscale":
            # scale the (bt, s, d) q instead of the (bt, s, span)
            # scores — one narrow VPU pass replaces a full-tile one
            q = (q.astype(jnp.float32) * (d**-0.5)).astype(q.dtype)
            scores = jax.lax.dot_general(
                q, k2, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) + bias_ref[0][None]
        else:
            scores = jax.lax.dot_general(
                q, k2, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * (d**-0.5) + bias_ref[0][None]
        if mode == "matmuls":
            probs = scores
        elif mode == "nomax":
            e = jnp.exp(scores)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
        elif mode in ("defer", "foldscale"):
            m = jnp.max(scores, axis=-1, keepdims=True)
            probs = jnp.exp(scores - m)
        else:
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            probs.astype(cd), v2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if mode in ("defer", "foldscale"):
            o = o / jnp.sum(probs, axis=-1, keepdims=True)
        o_ref[:, 0] = o.astype(o_ref.dtype)

    def forward(q, k, v, g):
        del g
        b, h, n, d = q.shape
        qf, nblk = lap._bucketize(q, s)
        kf, _ = lap._bucketize(k, s)
        vf, _ = lap._bucketize(v, s)
        bh = b * h
        bt = bt_override or lap._bh_tile(bh, s, span, live_tiles=2)
        ks, bspec = lap._block_specs(s, d, nblk, nl, bt)
        cur = ks[-1]
        bias = jnp.asarray(lap._mask_bias(W, s, nl))
        out = pl.pallas_call(
            kernel,
            grid=(nblk, bh // bt),
            in_specs=[cur] + ks + ks + [bspec],
            out_specs=cur,
            out_shape=jax.ShapeDtypeStruct((bh, nblk, s, d), v.dtype),
        )(qf, *([kf] * (nl + 1)), *([vf] * (nl + 1)), bias)
        return out

    return forward, (s, nl)


def local_bwd_variant(mode: str, block_size=None, bt_override=None,
                      out_dtype=jnp.float32):
    """Rebuild lap._backward.  mode: full | matmuls (skip softmax and
    its chain: dS = dP).  out_dtype tests halving the dominant
    dk2/dv2/dq output write traffic (the fold casts to bf16 anyway)."""
    s, nl = lap._band_params(W, block_size)
    span = (nl + 1) * s

    def kernel(*refs):
        q_ref = refs[0]
        k_refs = refs[1 : 2 + nl]
        v_refs = refs[2 + nl : 3 + 2 * nl]
        g_ref = refs[3 + 2 * nl]
        bias_ref = refs[4 + 2 * nl]
        dq_ref, dk2_ref, dv2_ref = refs[5 + 2 * nl :]
        cd = q_ref.dtype
        d = q_ref.shape[3]
        scale = d**-0.5
        q = q_ref[:, 0]
        k2 = jnp.concatenate([r[:, 0] for r in k_refs], axis=1)
        v2 = jnp.concatenate([r[:, 0] for r in v_refs], axis=1)
        g = g_ref[:, 0]
        scores = jax.lax.dot_general(
            q, k2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + bias_ref[0][None]
        dP = jax.lax.dot_general(
            g, v2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if mode == "matmuls":
            probs = scores
            dS = dP
        else:
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            t = jnp.sum(dP * probs, axis=-1, keepdims=True)
            dS = probs * (dP - t)
        dq_ref[:, 0] = (
            jax.lax.dot_general(
                dS.astype(cd), k2, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale
        ).astype(dq_ref.dtype)
        dk2_ref[:, 0] = (
            jax.lax.dot_general(
                dS.astype(cd), q, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale
        ).astype(dk2_ref.dtype)
        dv2_ref[:, 0] = jax.lax.dot_general(
            probs.astype(cd), g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dv2_ref.dtype)

    def backward(q, k, v, g):
        b, h, n, d = q.shape
        qf, nblk = lap._bucketize(q, s)
        kf, _ = lap._bucketize(k, s)
        vf, _ = lap._bucketize(v, s)
        gf, _ = lap._bucketize(g.astype(q.dtype), s)
        bh = b * h
        bt = bt_override or lap._bh_tile(bh, s, span, live_tiles=4)
        ks, bspec = lap._block_specs(s, d, nblk, nl, bt)
        cur = ks[-1]
        d2 = pl.BlockSpec(
            (bt, 1, span, d), lambda j, i: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        )
        bias = jnp.asarray(lap._mask_bias(W, s, nl))
        dq, dk2, dv2 = pl.pallas_call(
            kernel,
            grid=(nblk, bh // bt),
            in_specs=[cur] + ks + ks + [cur, bspec],
            out_specs=[cur, d2, d2],
            out_shape=[
                jax.ShapeDtypeStruct((bh, nblk, s, d), out_dtype),
                jax.ShapeDtypeStruct((bh, nblk, span, d), out_dtype),
                jax.ShapeDtypeStruct((bh, nblk, span, d), out_dtype),
            ],
        )(qf, *([kf] * (nl + 1)), *([vf] * (nl + 1)), gf, bias)
        # tiny-slice consumption: the outputs' HBM WRITES are the cost
        # under test; reading all 132 MB back through jnp.sum would add
        # ~0.5 ms of unrelated traffic to every row
        return (
            jnp.sum(dq[:, :, :8].astype(jnp.float32))
            + jnp.sum(dk2[:, :, :8].astype(jnp.float32))
            + jnp.sum(dv2[:, :, :8].astype(jnp.float32))
        )

    return backward, (s, nl)


# ---------------------------------------------------------------- favor

def favor_variant(which: str, mode: str):
    """which: fwd | dq | dkv.  mode: full | idfeat (identity feature
    map — skips diag/max/exp chains) | nomask (no causal where)."""
    patches = {}
    if mode == "idfeat":
        def _features_id(q, k, p_ref, cd):
            p = p_ref[...]
            u_q = fav._pdot(q.astype(cd), p.astype(cd))
            u_k = fav._pdot(k.astype(cd), p.astype(cd))
            return u_q, u_k, u_q, u_k, u_q

        patches["_features"] = _features_id
    if mode == "nomask":
        patches["_tri"] = lambda c: jnp.bool_(True)

    def run(q, k, v, g):
        saved = {n: getattr(fav, n) for n in patches}
        for n, f in patches.items():
            setattr(fav, n, f)
        try:
            p = jnp.zeros((M_FEAT, D), jnp.float32) + 0.05
            if which == "fwd":
                out, _den, _nc = fav._fwd_impl(q, k, v, p, CHUNK, False)
                return jnp.sum(out)
            out, den, nc = fav._fwd_impl(q, k, v, p, CHUNK, False)
            dq, dk, dv = fav._bwd_impl(
                q, k, v, p, g, out, den, nc, CHUNK, False
            )
            if which == "dq":
                return jnp.sum(dq)
            return jnp.sum(dk) + jnp.sum(dv)
        finally:
            for n, f in saved.items():
                setattr(fav, n, f)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    reps = args.reps

    print(f"backend: {jax.default_backend()}  paper shape: "
          f"b{B} h{H} L{L} d{D} w{W} m{M_FEAT} chunk{CHUNK}")
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, L, D)) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, L, D)) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, L, D)) * 0.5, jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(B, H, L, D)) * 0.5, jnp.bfloat16)
    A = (q, k, v, g)

    print("\n-- local attention forward (s=256/nl=2, bt=3, 96 steps) --")
    rows = [
        ("full body", "full", None, None),
        ("matmuls only (no softmax)", "matmuls", None, None),
        ("defer normalization past PV", "defer", None, None),
        ("defer + fold scale into q", "foldscale", None, None),
        ("no rowmax stabilizer", "nomax", None, None),
        ("full, bt=4", "full", None, 4),
        ("full, bt=6 (budget 2x)", "full", None, 6),
        ("defer+foldscale, bt=4", "foldscale", None, 4),
        ("defer+foldscale, bt=6", "foldscale", None, 6),
        ("defer+foldscale, bt=8", "foldscale", None, 8),
    ]
    for label, mode, bs, bt in rows:
        fn, (s, nl) = local_fwd_variant(mode, bs, bt)
        try:
            timed(rep_harness(fn, reps), A, f"{label} [s={s},nl={nl}]", reps)
        except Exception as e:  # VMEM OOM etc. — report, keep going
            print(f"  {label:46s}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})")

    print("\n-- local attention backward (s=256/nl=2, bt=1, 288 steps) --")
    rows = [
        ("full body, bt=1 (current default)", "full", None, None, jnp.float32),
        ("matmuls only (no softmax chain)", "matmuls", None, None, jnp.float32),
        ("full, bt=2 (budget bump)", "full", None, 2, jnp.float32),
        ("full, bf16 outputs, bt=1", "full", None, None, jnp.bfloat16),
        ("full, bf16 outputs, bt=2", "full", None, 2, jnp.bfloat16),
        ("full, bf16 outputs, bt=4", "full", None, 4, jnp.bfloat16),
    ]
    if args.quick:
        rows = rows[:3]
    for label, mode, bs, bt, od in rows:
        fn, (s, nl) = local_bwd_variant(mode, bs, bt, od)
        try:
            timed(rep_harness(fn, reps), A, f"{label} [s={s},nl={nl}]", reps)
        except Exception as e:
            print(f"  {label:46s}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})")

    print("\n-- FAVOR kernels (chunk=128, m=256, bt=6, 88 steps each) --")
    rows = [
        ("fwd full", "fwd", "full"),
        ("fwd identity features (no exp chain)", "fwd", "idfeat"),
        ("fwd no causal mask select", "fwd", "nomask"),
        ("dq full (fwd+dq measured; subtract fwd)", "dq", "full"),
        ("dkv full (fwd+dkv measured; subtract fwd)", "dkv", "full"),
        ("dkv identity features", "dkv", "idfeat"),
    ]
    if args.quick:
        rows = rows[:2]
    for label, which, mode in rows:
        fn = favor_variant(which, mode)
        try:
            timed(rep_harness(fn, reps), A, label, reps)
        except Exception as e:
            print(f"  {label:46s}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})")


if __name__ == "__main__":
    main()

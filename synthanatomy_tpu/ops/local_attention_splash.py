"""Local-window causal attention via JAX's stock splash-attention kernel.

External yardstick for the first-party banded Pallas kernels
(``ops.local_attention_pallas``): the installed JAX ships production
TPU attention kernels under
``jax.experimental.pallas.ops.tpu.splash_attention`` whose block-sparse
mask machinery targets exactly the sliding-window shape the hybrid
Performer's local heads use (reference performer.py:199-200 consumes
CUDA kernels from ``pytorch-fast-transformers`` here).  This wrapper
maps our window semantics — each query attends ``k_pos ∈ (q_pos - w,
q_pos]`` — onto splash's ``LocalMask((L, L), (w-1, 0), offset=0)``
(verified identical), applies the same rotary/scale conventions as
``ops.local_attention.local_attention``, and exposes the result as a
drop-in so ``tools/bench_transformer.py --splash-local`` can
cross-benchmark the two implementations at the paper shape.

Splash operates on (heads, L, d) operands and is vmapped over batch; it
does NOT scale q internally (the d^-0.5 is folded into q here, matching
the first-party kernels).  Sequence length is zero-padded up to the
block size; padded keys sit causally after every real query so they are
never attended, and padded query rows are sliced off.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from synthanatomy_tpu.ops.local_attention import (
    apply_rotary,
    local_attention as _local_attention_xla,
    rotary_sin_cos,
)

__all__ = ["local_attention_splash"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=16)
def _make_kernel(
    heads: int,
    seq_pad: int,
    window: int,
    block_q: int,
    block_kv: int,
    fused_bwd: bool,
    interpret: bool,
):
    """Build (and cache) the splash MHA kernel for a padded shape.

    Mask construction is host-side numpy over (L/bq, L/bkv) blocks —
    cheap at these lengths, and cached so repeated jit traces reuse it.
    """
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    mask = sm.MultiHeadMask(
        [
            sm.LocalMask((seq_pad, seq_pad), (window - 1, 0), 0)
            for _ in range(heads)
        ]
    )
    bs = sk.BlockSizes(
        block_q=block_q,
        block_kv=block_kv,
        block_kv_compute=block_kv,
        block_q_dkv=block_q,
        block_kv_dkv=block_kv,
        block_kv_dkv_compute=block_kv,
        block_q_dq=None if fused_bwd else block_q,
        block_kv_dq=None if fused_bwd else block_kv,
        use_fused_bwd_kernel=fused_bwd,
    )
    return sk.make_splash_mha(
        mask,
        block_sizes=bs,
        head_shards=1,
        q_seq_shards=1,
        interpret=interpret,
    )


def local_attention_splash(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    window: int,
    causal: bool = True,
    use_rotary: bool = True,
    compute_dtype=jnp.bfloat16,
    block_q: int = 256,
    block_kv: int = 256,
    use_fused_bwd: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Drop-in for ``ops.local_attention.local_attention`` backed by the
    stock splash-attention TPU kernel (XLA fallback off-TPU /
    non-causal, same policy as ``local_attention_flash``).

    q/k/v: (B, H, L, d) → (B, H, L, d).  ``compute_dtype`` sets the
    splash operand dtype; softmax accumulation inside splash is fp32.
    """
    if interpret is None:
        dd = jax.config.jax_default_device
        on_tpu = (
            dd.platform == "tpu"
            if dd is not None
            else jax.default_backend() == "tpu"
        )
        if not on_tpu:
            return _local_attention_xla(
                q, k, v, window=window, causal=causal,
                use_rotary=use_rotary, compute_dtype=compute_dtype,
            )
        interpret = False
    if not causal:
        return _local_attention_xla(
            q, k, v, window=window, causal=False, use_rotary=use_rotary,
            compute_dtype=compute_dtype,
        )

    b, h, n, d = q.shape
    in_dtype = v.dtype

    if use_rotary:
        pos = jnp.arange(n)
        sin, cos = rotary_sin_cos(d, pos)
        q = apply_rotary(q.astype(jnp.float32), sin, cos)
        k = apply_rotary(k.astype(jnp.float32), sin, cos)

    # splash does not scale internally — fold d^-0.5 into q (fp32, then
    # cast: same convention as the first-party kernels)
    q = (q.astype(jnp.float32) * (d**-0.5)).astype(compute_dtype)
    k = k.astype(compute_dtype)
    v = v.astype(compute_dtype)

    step = max(block_q, block_kv)
    n_pad = _round_up(n, step)
    if n_pad != n:
        zpad = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
        q, k, v = jnp.pad(q, zpad), jnp.pad(k, zpad), jnp.pad(v, zpad)

    kernel = _make_kernel(
        h, n_pad, window,
        min(block_q, n_pad), min(block_kv, n_pad),
        use_fused_bwd, interpret,
    )
    out = jax.vmap(lambda qq, kk, vv: kernel(qq, kk, vv, None))(q, k, v)
    return out[:, :, :n].astype(in_dtype)

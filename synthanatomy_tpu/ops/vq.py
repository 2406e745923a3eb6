"""EMA vector quantization — the stage-1 hot op.

TPU-first rebuild of the reference ``Quantizer_impl``
(src/networks/vqvae/baseline.py:24-122):

- the codebook is *explicit functional state* (:class:`VQState`) threaded
  through the jitted train step (the reference mutates registered torch
  buffers inside ``forward``);
- the nearest-codeword search is a fused Pallas kernel
  (:func:`nearest_codeword_pallas`) tiling rows of the flattened input
  against the whole codebook in VMEM so the ``(N, K)`` distance matrix
  never materializes in HBM;
- all VQ arithmetic is an fp32 island regardless of the bf16 compute
  policy (mirrors the reference's ``autocast(enabled=False)`` islands);
- cross-replica reduction of the EMA statistics is *implicit* under
  pjit/GSPMD (sums over a batch-sharded axis lower to ICI collectives),
  with an optional explicit ``axis_name`` psum for ``shard_map`` callers
  — preserving the reduce-before-update invariant of the reference's
  ``dist.all_reduce`` (baseline.py:70-76, SURVEY.md §5.2);
- straight-through estimator and commitment loss identical in math to
  baseline.py:82-85.

Layout note: the framework is channels-last ``(B, H, W, D, C)``
everywhere (idiomatic XLA-TPU), vs. the reference's NCHWD.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "VQState",
    "init_vq_state",
    "nearest_codeword",
    "nearest_codeword_pallas",
    "quantize_ema",
    "embed_indices",
    "perplexity",
]


# use the fully fused argmin+EMA-stats kernel inside quantize_ema
# (see the note at its call site; off by default on measured v5e perf)
FUSED_EMA_STATS = False


class VQState(NamedTuple):
    """Functional EMA codebook state (all fp32).

    codebook:     (K, D) current codeword vectors.
    cluster_size: (K,)   EMA of per-codeword assignment counts
                  (reference buffer ``N``).
    embed_avg:    (K, D) EMA of per-codeword summed inputs
                  (reference buffer ``embed_avg``).
    """

    codebook: jax.Array
    cluster_size: jax.Array
    embed_avg: jax.Array


def init_vq_state(
    key: jax.Array,
    num_embeddings: int,
    embedding_dim: int,
    init: str = "normal",
) -> VQState:
    """Initialize the codebook (reference inits via ``nn.Embedding``
    default = N(0,1); 'kaiming_uniform' mirrors the dead-code layer's
    option, src/layers/vector_quantization.py:51-54)."""
    if init == "normal":
        w = jax.random.normal(key, (num_embeddings, embedding_dim), jnp.float32)
    elif init == "kaiming_uniform":
        bound = float(np.sqrt(3.0) * np.sqrt(2.0 / embedding_dim))
        w = jax.random.uniform(
            key, (num_embeddings, embedding_dim), jnp.float32, -bound, bound
        )
    else:
        raise ValueError(f"unknown embedding_init {init!r}")
    return VQState(
        codebook=w,
        cluster_size=jnp.zeros((num_embeddings,), jnp.float32),
        embed_avg=w.copy(),
    )


# ---------------------------------------------------------------------------
# nearest-codeword search
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _vq_argmin_kernel(x_ref, wt_ref, wsq_ref, idx_ref):
    """One grid step: (TILE_N, D') rows against the full (D', K') codebook.

    dist(n, k) = ||x_n||² - 2·x_n·w_k + ||w_k||²; the ||x||² term is
    constant per row, so argmin only needs  ||w||² - 2·x·wᵀ.
    """
    scores = jnp.dot(
        x_ref[:],
        wt_ref[:],
        preferred_element_type=jnp.float32,
        # full-f32 MXU passes: nearest-codeword selection must be exact
        # (codebook-index-exact parity target, BASELINE.md)
        precision=jax.lax.Precision.HIGHEST,
    )  # (TILE_N, K')
    dist = wsq_ref[:] - 2.0 * scores
    idx_ref[:] = jnp.argmin(dist, axis=1, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_n"))
def nearest_codeword_pallas(
    x_flat: jax.Array,
    codebook: jax.Array,
    *,
    tile_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Fused Pallas nearest-codeword indices for ``x_flat`` (N, D) against
    ``codebook`` (K, D).  Returns int32 (N,).

    The distance matrix stays in VMEM per tile; K' (padded K) fp32
    columns of the transposed codebook (~D'·K'·4 bytes) are resident for
    the whole grid.
    """
    n, d = x_flat.shape
    k = codebook.shape[0]
    d_pad = _round_up(max(d, 128), 128)
    k_pad = _round_up(max(k, 128), 128)
    n_pad = _round_up(n, tile_n)

    x = jnp.asarray(x_flat, jnp.float32)
    w = jnp.asarray(codebook, jnp.float32)
    # zero-pad the feature dim (does not change distances) and the
    # codeword dim (padded codewords get +inf squared-norm → never win)
    x = jnp.pad(x, ((0, n_pad - n), (0, d_pad - d)))
    wt = jnp.pad(w, ((0, k_pad - k), (0, d_pad - d))).T  # (D', K')
    wsq = jnp.sum(wt * wt, axis=0, keepdims=True)  # (1, K')
    if k_pad > k:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)
        wsq = jnp.where(col < k, wsq, jnp.float32(np.inf))

    grid = (n_pad // tile_n,)
    idx = pl.pallas_call(
        _vq_argmin_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d_pad * k_pad,
            bytes_accessed=n_pad * d_pad * 4 + d_pad * k_pad * 4 + n_pad * 4,
            transcendentals=0,
        ),
    )(x, wt, wsq)
    return idx[:n, 0]


def _vq_argmin_stats_kernel(
    n_real_ref, x_ref, wt_ref, wsq_ref, idx_ref, counts_ref, dw_ref
):
    """Distance → argmin → one-hot EMA statistics, all in VMEM.

    counts/dw use constant-index output blocks, so they stay resident
    across the sequential grid and accumulate per tile; padded rows
    (global row ≥ n_real) are masked out of the statistics.
    """
    i = pl.program_id(0)
    tile_n = x_ref.shape[0]
    k_pad = wt_ref.shape[1]

    scores = jnp.dot(
        x_ref[:],
        wt_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dist = wsq_ref[:] - 2.0 * scores
    idx = jnp.argmin(dist, axis=1)
    idx_ref[:] = idx[:, None].astype(jnp.int32)

    # one-hot restricted to real rows
    row_global = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0)[:, 0] + i * tile_n
    )
    real = (row_global < n_real_ref[0]).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, k_pad), 1)
    onehot = (col == idx[:, None]).astype(jnp.float32) * real[:, None]

    counts_partial = jnp.sum(onehot, axis=0, keepdims=True)  # (1, K')
    dw_partial = jax.lax.dot_general(
        onehot, x_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (K', D')

    @pl.when(i == 0)
    def _():
        counts_ref[:] = counts_partial
        dw_ref[:] = dw_partial

    @pl.when(i > 0)
    def _():
        counts_ref[:] = counts_ref[:] + counts_partial
        dw_ref[:] = dw_ref[:] + dw_partial


@functools.partial(jax.jit, static_argnames=("interpret", "tile_n"))
def nearest_codeword_stats_pallas(
    x_flat: jax.Array,
    codebook: jax.Array,
    *,
    tile_n: int = 512,
    interpret: bool = False,
):
    """Fused nearest-codeword + EMA statistics (SURVEY.md §2.9's
    "distance+argmin+EMA-stats" kernel): returns
    ``(indices (N,), counts (K,), dw (K, D))`` without materializing
    the (N, K) one-hot in HBM."""
    n, d = x_flat.shape
    k = codebook.shape[0]
    d_pad = _round_up(max(d, 128), 128)
    k_pad = _round_up(max(k, 128), 128)
    n_pad = _round_up(n, tile_n)

    x = jnp.pad(jnp.asarray(x_flat, jnp.float32), ((0, n_pad - n), (0, d_pad - d)))
    w = jnp.asarray(codebook, jnp.float32)
    wt = jnp.pad(w, ((0, k_pad - k), (0, d_pad - d))).T
    wsq = jnp.sum(wt * wt, axis=0, keepdims=True)
    if k_pad > k:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)
        wsq = jnp.where(col < k, wsq, jnp.float32(np.inf))
    n_real = jnp.asarray([n], jnp.int32)

    grid = (n_pad // tile_n,)
    idx, counts, dw = pl.pallas_call(
        _vq_argmin_stats_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((k_pad, d_pad), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * d_pad * k_pad,
            bytes_accessed=n_pad * d_pad * 4 + d_pad * k_pad * 4
            + n_pad * 4 + k_pad * d_pad * 4,
            transcendentals=0,
        ),
    )(n_real, x, wt, wsq)
    return idx[:n, 0], counts[0, :k], dw[:k, :d]


def _nearest_codeword_xla(x_flat: jax.Array, codebook: jax.Array) -> jax.Array:
    x = jnp.asarray(x_flat, jnp.float32)
    w = jnp.asarray(codebook, jnp.float32)
    # same argmin objective; ||x||² dropped as row-constant
    scores = jnp.dot(x, w.T, precision=jax.lax.Precision.HIGHEST)
    dist = jnp.sum(w * w, axis=1)[None, :] - 2.0 * scores
    return jnp.argmin(dist, axis=1).astype(jnp.int32)


def _running_on_tpu() -> bool:
    # honour a `jax.default_device(cpu)` scope (e.g. cheap host-side
    # model init), under which default_backend() still reports tpu
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"


def nearest_codeword(
    x_flat: jax.Array,
    codebook: jax.Array,
    *,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Dispatch: Pallas kernel on TPU, plain-XLA fallback elsewhere."""
    if use_pallas is None:
        use_pallas = _running_on_tpu()
    if use_pallas:
        return nearest_codeword_pallas(x_flat, codebook)
    return _nearest_codeword_xla(x_flat, codebook)


# ---------------------------------------------------------------------------
# quantize + EMA update (training) / embed (inference)
# ---------------------------------------------------------------------------


def embed_indices(state: VQState, indices: jax.Array) -> jax.Array:
    """indices (...,) int → codewords (..., D) fp32 (reference
    ``Quantizer_impl.embed``, baseline.py:89-91)."""
    return jnp.take(state.codebook, indices, axis=0)


def perplexity(indices: jax.Array, num_embeddings: int) -> jax.Array:
    """exp(entropy) of the empirical codeword usage distribution
    (reference Quantizer.forward, baseline.py:105-122)."""
    counts = jnp.zeros((num_embeddings,), jnp.float32).at[indices.reshape(-1)].add(1.0)
    probs = counts / indices.size
    return jnp.exp(-jnp.sum(probs * jnp.log(probs + 1e-10)))


def quantize_ema(
    state: VQState,
    x: jax.Array,
    *,
    decay,
    commitment_cost,
    training: bool,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
    use_pallas: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, VQState]:
    """Quantize ``x`` (..., D) with straight-through gradients and
    (when ``training``) return the EMA-updated codebook state.

    Returns ``(quantized_st, commitment_loss, indices, new_state)``;
    ``quantized_st`` has x's original dtype, loss is fp32.
    """
    in_dtype = x.dtype
    spatial_shape = x.shape[:-1]
    d = x.shape[-1]
    k = state.codebook.shape[0]

    xf = jnp.asarray(x, jnp.float32)
    flat = xf.reshape(-1, d)
    flat_ng = jax.lax.stop_gradient(flat)

    if use_pallas is None:
        use_pallas = _running_on_tpu()

    if training and use_pallas and FUSED_EMA_STATS:
        # fully fused kernel: indices + EMA statistics in one pass, no
        # (N, K) one-hot in HBM.  Bit-exact vs the XLA stats path but
        # measured ~2× slower at paper sizes on v5e (the dw accumulator
        # re-writes 1 MB per tile while XLA's one-hot matmuls ride the
        # MXU); kept for larger-N regimes where the HBM one-hot hurts.
        indices, counts, dw = nearest_codeword_stats_pallas(flat_ng, state.codebook)
    else:
        indices = nearest_codeword(flat_ng, state.codebook, use_pallas=use_pallas)
        counts = dw = None
    quantized = embed_indices(state, indices).reshape(xf.shape)

    if training:
        if counts is None:
            onehot = jax.nn.one_hot(indices, k, dtype=jnp.float32)
            counts = jnp.sum(onehot, axis=0)  # (K,)
            dw = onehot.T @ flat_ng  # (K, D)
        if axis_name is not None:
            # explicit cross-replica reduce-before-update (shard_map
            # path); under pjit the global sums above already reduce
            # across the data-sharded axis
            counts = jax.lax.psum(counts, axis_name)
            dw = jax.lax.psum(dw, axis_name)
        new_cluster = state.cluster_size * decay + counts * (1.0 - decay)
        new_avg = state.embed_avg * decay + dw * (1.0 - decay)
        n_total = jnp.sum(new_cluster)
        # Laplace smoothing (baseline.py:79)
        smoothed = (new_cluster + eps) / (n_total + k * eps) * n_total
        new_codebook = new_avg / smoothed[:, None]
        new_state = VQState(new_codebook, new_cluster, new_avg)
    else:
        new_state = state

    loss = commitment_cost * jnp.mean(
        jnp.square(jax.lax.stop_gradient(quantized) - xf)
    )
    # straight-through estimator (baseline.py:85)
    quantized_st = xf + jax.lax.stop_gradient(quantized - xf)

    return (
        quantized_st.astype(in_dtype),
        loss,
        indices.reshape(spatial_shape),
        new_state,
    )

"""Autoregressive sampling for the stage-2 prior.

Rebuild of the reference ``TransformerBase.sample_next_index`` /
``sample`` (src/networks/transformers/transformer.py:8-104): last-
position logits / temperature → optional top-k (minGPT-style,
transformer.py:11-17) → softmax → multinomial-or-argmax, looped over
``prod(ordering.dimensions)`` positions, then inverse-ordering permute
and reshape to the 3D grid.

Two implementations:

- :func:`sample` — the TPU-native fast path: prefix-state/ring-buffer
  cached incremental decoding inside one ``lax.scan`` (compiled once;
  O(1) work per token in sequence length for the FAVOR heads).  This is
  the headline fix for the reference's biggest inefficiency — it
  re-runs the FULL forward over the growing prefix every step with no
  cache (transformer.py:84-93).
- :func:`sample_naive` — a reference-shaped loop (full forward each
  step) kept for parity checks and benchmark comparison.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from synthanatomy_tpu.models.ordering import Ordering

__all__ = [
    "top_k_logits",
    "sample_next_index",
    "sample",
    "sample_naive",
    "make_sampler",
]


def top_k_logits(logits: jax.Array, k: Optional[int]) -> jax.Array:
    """Mask all but the top-k logits to -inf (reference
    transformer.py:11-17)."""
    if k is None:
        return logits
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    return jnp.where(logits < kth, -jnp.inf, logits)


def sample_next_index(
    logits: jax.Array,
    *,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    sample: bool = True,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """logits (B, V) → token ids (B,) — the per-step policy of
    reference ``sample_next_index`` (transformer.py:19-56).  The BOS
    token (last vocab slot) is never emitted by the reference because
    the codebook indices occupy [0, vocab_size); here we mask it
    explicitly for safety."""
    logits = jnp.asarray(logits, jnp.float32) / temperature
    logits = top_k_logits(logits, top_k)
    if sample:
        assert rng is not None, "sampling requires an rng"
        return jax.random.categorical(rng, logits, axis=-1)
    return jnp.argmax(logits, axis=-1)


def _grid_from_sequence(tokens: jax.Array, ordering: Ordering) -> jax.Array:
    """(B, L) sequence (ordering order) → (B, *dims) grid via the
    revert ordering (reference transformer.py:95-99)."""
    revert = jnp.asarray(ordering.get_revert_sequence_ordering())
    flat = tokens[:, revert]
    return flat.reshape((tokens.shape[0],) + tuple(ordering.dimensions))


def sample(
    model,
    variables,
    ordering: Ordering,
    *,
    batch: int = 1,
    conditionings: Optional[Sequence[jax.Array]] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    do_sample: bool = True,
    rng: Optional[jax.Array] = None,
    bos_token: Optional[int] = None,
) -> jax.Array:
    """Fast cached sampling → (B, *ordering.dimensions) int32 grid."""
    seq_len = int(np.prod(ordering.dimensions))
    vocab = model.num_tokens
    bos = vocab - 1 if bos_token is None else bos_token
    if rng is None:
        rng = jax.random.key(0)

    cache = model.apply(variables, batch, method=model.init_cache)
    if conditionings is not None and model.conditioning_type == "prepending":
        cache = model.apply(
            variables, cache, conditionings, method=model.prime_cache
        )

    step_rngs = jax.random.split(rng, seq_len)

    def body(carry, inp):
        token, cache = carry
        t, step_rng = inp
        logits, cache = model.apply(
            variables, token, cache, t, conditionings, method=model.decode_step
        )
        # never emit BOS
        logits = logits.at[..., bos].set(-jnp.inf)
        nxt = sample_next_index(
            logits,
            temperature=temperature,
            top_k=top_k,
            sample=do_sample,
            rng=step_rng,
        )
        return (nxt, cache), nxt

    init_token = jnp.full((batch,), bos, jnp.int32)
    (_, _), tokens = jax.lax.scan(
        body,
        (init_token, cache),
        (jnp.arange(seq_len, dtype=jnp.int32), step_rngs),
    )
    tokens = tokens.T.astype(jnp.int32)  # (B, L)
    return _grid_from_sequence(tokens, ordering)


def make_sampler(
    model,
    ordering: Ordering,
    *,
    batch: int = 1,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    do_sample: bool = True,
    bos_token: Optional[int] = None,
    with_conditionings: bool = False,
):
    """Return a **jitted** ``sampler(variables, rng[, conditionings])``.

    Calling :func:`sample` directly re-traces the whole scan every call
    (seconds of Python overhead); production sampling must go through
    this factory so the trace is cached and steady-state cost is pure
    device execution.
    """

    if with_conditionings:

        @jax.jit
        def sampler(variables, rng, conditionings):
            return sample(
                model, variables, ordering, batch=batch,
                conditionings=conditionings, temperature=temperature,
                top_k=top_k, do_sample=do_sample, rng=rng, bos_token=bos_token,
            )

    else:

        @jax.jit
        def sampler(variables, rng):
            return sample(
                model, variables, ordering, batch=batch,
                temperature=temperature, top_k=top_k, do_sample=do_sample,
                rng=rng, bos_token=bos_token,
            )

    return sampler


def sample_naive(
    model,
    variables,
    ordering: Ordering,
    *,
    batch: int = 1,
    conditionings: Optional[Sequence[jax.Array]] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    do_sample: bool = True,
    rng: Optional[jax.Array] = None,
    bos_token: Optional[int] = None,
) -> jax.Array:
    """Reference-shaped sampler: full forward over the growing prefix
    each step (transformer.py:84-93).  Pads the prefix to a static
    length so the forward compiles once; still O(L) full forwards."""
    seq_len = int(np.prod(ordering.dimensions))
    vocab = model.num_tokens
    bos = vocab - 1 if bos_token is None else bos_token
    if rng is None:
        rng = jax.random.key(0)

    tokens = jnp.full((batch, seq_len + 1), bos, jnp.int32)

    @jax.jit
    def step(tokens, t, step_rng):
        logits_all = model.apply(variables, tokens[:, :-1], conditionings)
        logits = jax.lax.dynamic_slice_in_dim(
            logits_all, t, 1, axis=1
        )[:, 0]
        logits = logits.at[..., bos].set(-jnp.inf)
        nxt = sample_next_index(
            logits, temperature=temperature, top_k=top_k, sample=do_sample,
            rng=step_rng,
        )
        return tokens.at[:, t + 1].set(nxt)

    step_rngs = jax.random.split(rng, seq_len)
    for t in range(seq_len):
        tokens = step(tokens, t, step_rngs[t])
    return _grid_from_sequence(tokens[:, 1:], ordering)

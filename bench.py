"""Headline benchmark — AR prior sampling throughput (latent tokens/s).

Config 4 of BASELINE.json: Performer 24 layers / d512 / 16 heads
(8 local, window 420), vocab 2048, 10×14×10 = 1400-token latent grid —
the paper's transformer over the 4-level VQ-VAE latents
(reference README.md:106-137).

- measured: fused-kernel incremental sampling — the whole 24-layer
  decode step is ONE Pallas call per token (int8 weight streaming,
  bf16 FAVOR accumulators, flat ring-buffer layout; see
  synthanatomy_tpu/ops/fused_decode.py), batch 16 (the measured
  serving sweet spot), on the attached TPU chip;
- baseline: the reference's sampling algorithm — a full forward over
  the (padded) sequence per generated token with NO cache
  (reference src/networks/transformers/transformer.py:84-93) — run on
  the SAME chip and extrapolated from a measured slice of steps, so
  ``vs_baseline`` is the algorithmic speedup at equal hardware.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    # Fail fast (with a traceback) if PJRT client init hangs — a
    # timeout-killed on-chip run can wedge the axon tunnel for hours
    # (CLAUDE.md), and a diagnosed 10-min failure beats an indefinite
    # hang at round end.  Cancelled once the backend is up.
    import faulthandler

    faulthandler.dump_traceback_later(600, exit=True)

    import jax
    import jax.numpy as jnp

    jax.devices()  # force backend init under the watchdog
    faulthandler.cancel_dump_traceback_later()
    # the 24-layer paper-model compiles are multi-minute through the
    # tunnel; reuse them across runs (CLAUDE.md)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from synthanatomy_tpu.models.ordering import Ordering
    from synthanatomy_tpu.models.performer import Performer
    from synthanatomy_tpu.models.sampling import make_sampler, sample_next_index

    # batch 16 is the measured single-chip serving sweet spot (BASELINE.md
    # round-2 scaling sweep: B8 16.3k / B16 20.1k / B32 14.7k tok/s)
    BATCH = 16
    GRID = (10, 14, 10)
    SEQ = int(np.prod(GRID))

    ordering = Ordering("raster_scan", 3, GRID)
    # the EXACT paper block/embedding form (reference README.md:140-141):
    # ReZero blocks + learned spatial coordinate tables — the released
    # checkpoints carry these, and the fused kernel supports both
    model = Performer(
        num_tokens=2049, max_seq_len=SEQ + 1, dim=512, depth=24, heads=16,
        dim_head=64, local_attn_heads=8, local_window_size=420,
        use_rezero=True, spatial_position_emb="absolute",
        spatial_shape=GRID, ordering=ordering,
        dtype=jnp.bfloat16,
    )
    x0 = jnp.zeros((1, 8), jnp.int32)
    # init on host CPU (eager init dispatches hundreds of tiny ops —
    # seconds on CPU, minutes through the TPU tunnel), then stage in
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(
            {"params": jax.random.key(0), "favor": jax.random.key(1)}, x0
        )
    variables = jax.device_put(variables, jax.devices()[0])

    # ---- fast fused sampler -------------------------------------------
    sampler = make_sampler(
        model, ordering, batch=BATCH, temperature=1.0, fused="auto",
        ring_quant=True,  # int8 local-head rings: +17%, quality-tested
        # packed-int4 weight streaming: +6% at B16, 100% greedy
        # agreement with the exact path on trained priors of both block
        # forms (tools/validate_fused_decode.py --weight-quant=int4)
        weight_quant="int4",
    )
    path_note = ""
    try:
        np.asarray(sampler(variables, jax.random.key(2)))  # compile
    except Exception as e:  # pragma: no cover - defensive headline guard
        # the fused Pallas step is the fast path; if it fails to compile
        # on this backend, still report an honest (slower) headline from
        # the exact XLA decode path — marked in the unit string so a
        # kernel regression can never masquerade as a real trend point
        import sys

        print(f"fused sampler failed ({type(e).__name__}: {e}); "
              "falling back to the exact path", file=sys.stderr)
        path_note = " [EXACT-PATH FALLBACK: fused kernel failed to compile]"
        sampler = make_sampler(
            model, ordering, batch=BATCH, temperature=1.0, fused=False,
        )
        np.asarray(sampler(variables, jax.random.key(2)))  # compile
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        np.asarray(sampler(variables, jax.random.key(3 + i)))
    fast_dt = (time.perf_counter() - t0) / reps
    fast_tps = BATCH * SEQ / fast_dt

    # ---- reference-algorithm baseline (same chip) ---------------------
    # one full forward over the padded sequence per token, no cache.
    # NB: variables must be an ARGUMENT — closing over 100M+ params
    # bakes them into the HLO as constants and stalls compilation.
    @jax.jit
    def naive_step(variables, tokens, t, rng):
        logits_all = model.apply(variables, tokens[:, :-1])
        logits = jax.lax.dynamic_slice_in_dim(logits_all, t, 1, axis=1)[:, 0]
        nxt = sample_next_index(logits, temperature=1.0, sample=True, rng=rng)
        return tokens.at[:, t + 1].set(nxt)

    tokens = jnp.full((BATCH, SEQ + 1), 2048, jnp.int32)
    # compile + warm up (tunnel stragglers distort the first few steps)
    for t in range(4):
        tokens = naive_step(variables, tokens, jnp.asarray(t), jax.random.key(9 + t))
    np.asarray(tokens)
    MEASURE = 60
    t0 = time.perf_counter()
    for t in range(4, 4 + MEASURE):
        tokens = naive_step(variables, tokens, jnp.asarray(t), jax.random.key(10 + t))
    np.asarray(tokens)
    naive_per_step = (time.perf_counter() - t0) / MEASURE
    naive_dt = naive_per_step * SEQ  # cost/step is length-independent here
    naive_tps = BATCH * SEQ / naive_dt

    print(
        json.dumps(
            {
                "metric": "ar_sampling_tokens_per_sec_paper24L",
                "value": round(fast_tps, 1),
                "unit": "latent tokens/s/chip (batch 16, 24L/d512/16h "
                        "Performer, 1400-token grid)" + path_note,
                "vs_baseline": round(fast_tps / naive_tps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

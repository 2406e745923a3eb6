#!/usr/bin/env python
"""End-to-end synthesis benchmark (BASELINE.md config 5).

Full brain synthesis on one chip: paper-form Performer prior (24L/d512/
16h, 8 local heads w420, ReZero + learned spatial tables — reference
README.md:106-141) samples 1400-token latent grids, which the paper
4-level/256ch VQ-VAE decodes to 160×224×160 volumes — all device-
resident via ``synthanatomy_tpu.pipeline.make_synthesizer`` (no
filesystem hop between the stages, unlike the reference's two-CLI
workflow).

Usage: python tools/bench_pipeline.py [--batch=16 --reps=3]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from synthanatomy_tpu.cli import parse_argv
    from synthanatomy_tpu.models.ordering import Ordering
    from synthanatomy_tpu.models.performer import Performer
    from synthanatomy_tpu.models.vqvae import BaselineVQVAE
    from synthanatomy_tpu.pipeline import make_synthesizer

    _, kw = parse_argv(sys.argv[1:])
    batch = int(kw.get("batch", 16))
    reps = int(kw.get("reps", 3))

    GRID = (10, 14, 10)
    SEQ = int(np.prod(GRID))
    ordering = Ordering("raster_scan", 3, GRID)
    performer = Performer(
        num_tokens=2049, max_seq_len=SEQ + 1, dim=512, depth=24, heads=16,
        dim_head=64, local_attn_heads=8, local_window_size=420,
        use_rezero=True, spatial_position_emb="absolute",
        spatial_shape=GRID, ordering=ordering, dtype=jnp.bfloat16,
    )
    vqvae = BaselineVQVAE(
        n_levels=4,
        downsample_parameters=((4, 2, 1, 1),) * 4,
        upsample_parameters=((4, 2, 1, 0, 1),) * 4,
        n_embed=2048, embed_dim=32, n_channels=256, n_res_channels=256,
        n_res_layers=3, dtype=jnp.bfloat16,
    )

    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        pvars = performer.init(
            {"params": jax.random.key(0), "favor": jax.random.key(1)},
            jnp.zeros((1, 8), jnp.int32),
        )
        vvars = vqvae.init(
            jax.random.key(2), jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
        )
    pvars = jax.device_put(pvars, dev)
    vvars = jax.device_put(vvars, dev)

    synth = make_synthesizer(
        performer, vqvae, ordering, batch=batch, temperature=1.0,
        decode_batch=8, ring_quant=True,
    )

    # consume volumes ON DEVICE: the axon tunnel moves large outputs to
    # host at ~0.01 GB/s, so np.asarray on the 367 MB batch would
    # dominate (round-4 finding).  jnp.sum forces the full computation.
    consume = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))

    t0 = time.perf_counter()
    vols, grids = synth(pvars, vvars, jax.random.key(3))
    np.asarray(consume(vols))
    print(f"[e2e] compile+run {time.perf_counter() - t0:.1f}s "
          f"volumes {vols.shape} grids {grids.shape}")

    t0 = time.perf_counter()
    for i in range(reps):
        vols, _ = synth(pvars, vvars, jax.random.key(4 + i))
    np.asarray(consume(vols))
    dt = (time.perf_counter() - t0) / reps
    print(
        f"[e2e] paper-form synthesis batch={batch}: {dt:.2f} s/batch → "
        f"{batch * 60 / dt:.1f} volumes/min/chip "
        f"({batch * SEQ / dt:.0f} latent tok/s incl. decode)"
    )

    if kw.get("split"):
        # stage decomposition: sampler alone, then decode alone
        from synthanatomy_tpu.models.sampling import make_sampler

        sampler = make_sampler(
            performer, ordering, batch=batch, temperature=1.0,
            fused="auto", ring_quant=True,
        )
        grids = sampler(pvars, jax.random.key(3))
        np.asarray(grids)  # (B, 10,14,10) int32 — tiny, transfer is fine
        t0 = time.perf_counter()
        for i in range(reps):
            grids = sampler(pvars, jax.random.key(4 + i))
        np.asarray(grids)
        sdt = (time.perf_counter() - t0) / reps
        print(f"[split] sampling alone: {sdt:.2f} s/batch "
              f"({batch * SEQ / sdt:.0f} tok/s)")

        @jax.jit
        def decode_chunk(vvars, g):
            out = vqvae.apply(vvars, [g], method=vqvae.decode_samples)
            return jnp.sum(out.astype(jnp.float32))

        np.asarray(decode_chunk(vvars, grids[:8]))
        t0 = time.perf_counter()
        for _ in range(reps):
            for i in range(0, batch, 8):
                out = decode_chunk(vvars, grids[i : i + 8])
        np.asarray(out)
        ddt = (time.perf_counter() - t0) / reps
        print(f"[split] decode alone ({batch} vols, sub-batch 8): "
              f"{ddt:.2f} s/batch ({ddt / batch * 1e3:.0f} ms/vol)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Fused-decode weight-stream ablation: int8 vs packed-int4 weights.

Measures the paper sampler (24L/d512/16h, 8 local w420, 1400-token
grid, int8 rings) at serving batches with both weight formats — the
bandwidth side of the int4 candidate (VERDICT r4 #2).  Quality is
adjudicated separately by tools/validate_fused_decode.py
--weight-quant=int4 (trained-model greedy-agreement standard).

Usage: python tools/bench_decode_quant.py [--batches=8,16]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from synthanatomy_tpu.models.ordering import Ordering
    from synthanatomy_tpu.models.performer import Performer
    from synthanatomy_tpu.models.sampling import make_sampler

    batches = [
        int(b)
        for b in (sys.argv[sys.argv.index("--batches") + 1].split(","))
    ] if "--batches" in sys.argv else [8, 16]

    GRID = (10, 14, 10)
    SEQ = int(np.prod(GRID))
    ordering = Ordering("raster_scan", 3, GRID)
    model = Performer(
        num_tokens=2049, max_seq_len=SEQ + 1, dim=512, depth=24, heads=16,
        dim_head=64, local_attn_heads=8, local_window_size=420,
        use_rezero=True, spatial_position_emb="absolute",
        spatial_shape=GRID, ordering=ordering, dtype=jnp.bfloat16,
    )
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(
            {"params": jax.random.key(0), "favor": jax.random.key(1)},
            jnp.zeros((1, 8), jnp.int32),
        )
    variables = jax.device_put(variables, jax.devices()[0])

    for B in batches:
        for wq in ("int8", "int4"):
            sampler = make_sampler(
                model, ordering, batch=B, temperature=1.0, fused=True,
                ring_quant=True, weight_quant=wq,
            )
            np.asarray(sampler(variables, jax.random.key(2)))  # compile
            reps = 3
            t0 = time.perf_counter()
            for i in range(reps):
                np.asarray(sampler(variables, jax.random.key(3 + i)))
            dt = (time.perf_counter() - t0) / reps
            tps = B * SEQ / dt
            print(
                f"B={B:3d} weights={wq}: {tps:8.0f} tok/s "
                f"({dt / SEQ * 1e6:.0f} us/step)",
                flush=True,
            )


if __name__ == "__main__":
    main()

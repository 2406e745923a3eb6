"""Re-validate the fused-decode / int8-ring quality guards on a
TRAINED prior (VERDICT round-2 item: the guards were calibrated on
random weights, whose unusually flat logit statistics may make the
thresholds loose).

Trains a small-but-real Performer (6L/d256) on structured synthetic
latents to a non-trivial CE on the chip (minutes), then measures:

- greedy-decode agreement between the exact general path
  (``make_sampler(fused=False)``) and the fused kernel path with int8
  weights, with bf16 and int8 rings;
- teacher-forced logit perturbation (max |Δ| / logit std) between the
  exact and fused paths on trained sequences.

Prints one JSON line for BASELINE.md.

Usage: python tools/validate_fused_decode.py [--steps=400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument(
        "--weight-quant", default="int8", choices=["int8", "int4"],
        help="fused-path weight stream format (int4 = packed nibbles, "
        "per-half-channel scales — the VERDICT r5 candidate)",
    )
    p.add_argument(
        "--paper-form", action="store_true",
        help="ReZero blocks + learned 'absolute' spatial tables (the "
        "bench.py headline block/embedding form, reference "
        "README.md:140-141)",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from synthanatomy_tpu.models.ordering import Ordering
    from synthanatomy_tpu.models.performer import Performer
    from synthanatomy_tpu.models.sampling import make_sampler
    from synthanatomy_tpu.ops.fused_decode import supports_fused_decode
    from synthanatomy_tpu.runners.transformer import prepare_batch
    from synthanatomy_tpu.train.transformer_steps import (
        create_transformer_train_state,
        make_transformer_train_step,
    )

    grid = (8, 8, 8)
    vocab = 512
    seq = int(np.prod(grid))
    ordering = Ordering("raster_scan", 3, grid)

    # structured latents: smooth position-dependent pattern + small
    # per-volume offset + sparse noise — learnable to low CE but not
    # degenerate (per-position entropy stays non-zero)
    rng = np.random.default_rng(0)
    n_vols = 64
    pos = np.arange(seq)
    base = (7 * pos + (pos // 8) * 3) % vocab
    vols = []
    for i in range(n_vols):
        v = (base + (i % 4) * 11) % vocab
        noise = rng.random(seq) < 0.02
        v = np.where(noise, rng.integers(0, vocab, seq), v)
        vols.append(v.reshape(grid))
    latents = np.stack(vols)

    extra = (
        dict(use_rezero=True, spatial_position_emb="absolute",
             spatial_shape=grid, ordering=ordering)
        if args.paper_form
        else {}
    )
    model = Performer(
        num_tokens=vocab + 1, max_seq_len=seq + 1, dim=256, depth=6,
        heads=4, dim_head=64, local_attn_heads=2, local_window_size=64,
        nb_features=128, dtype=jnp.bfloat16, scan_chunk=128, **extra,
    )
    assert supports_fused_decode(model)
    state, tx = create_transformer_train_state(
        model, jax.random.key(0), seq + 1, learning_rate=args.lr
    )
    step = jax.jit(make_transformer_train_step(model, tx), donate_argnums=0)

    t0 = time.time()
    loss = None
    for it in range(args.steps):
        sel = rng.integers(0, n_vols, args.batch)
        inputs, targets = prepare_batch(latents[sel], ordering, vocab)
        state, metrics = step(
            state, jnp.asarray(inputs), jnp.asarray(targets), None,
            {"lr": args.lr},
        )
        if (it + 1) % 100 == 0:
            loss = float(np.asarray(metrics["Loss"]))
            print(f"step {it + 1}: CE={loss:.4f} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)
    loss = float(np.asarray(metrics["Loss"]))

    variables = {"params": state.params, "favor": state.favor}

    # ---- greedy agreement: exact vs fused(int8 weights) -------------
    def grids_for(fused, ring_quant):
        s = make_sampler(
            model, ordering, batch=4, do_sample=False,
            fused=fused, ring_quant=ring_quant,
            weight_quant=args.weight_quant,
        )
        return np.asarray(s(variables, jax.random.key(7)))

    g_exact = grids_for(False, False)
    g_fused_bf = grids_for(True, False)
    g_fused_i8 = grids_for(True, True)
    agree_bf = float((g_exact == g_fused_bf).mean())
    agree_i8 = float((g_exact == g_fused_i8).mean())

    # ---- teacher-forced logit perturbation ---------------------------
    # exact path logits via the batch forward; fused path via the
    # fused reference (int8 weights) stepped over the same sequence
    from synthanatomy_tpu.ops.fused_decode import (
        FusedDecodeConfig,
        fused_decode_step_ref,
        init_fused_state,
        pack_fused_params,
        update_rings,
    )

    T = 256
    toks = np.concatenate([[vocab], latents[0].reshape(-1)[: T - 1]])
    toks = jnp.asarray(toks[None].repeat(2, 0), jnp.int32)
    logits_exact = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x))(variables, toks)
    )[:, -1]

    cfg = FusedDecodeConfig(
        depth=6, batch=2, dim=256, heads=4, dim_head=64, local_heads=2,
        local_window=64, nb_features=128, quantize=True,
        state_dtype=jnp.bfloat16, ring_quant=True,
        weight_quant=args.weight_quant,
    )
    params_f = pack_fused_params(
        model, variables, weight_quant=args.weight_quant
    )
    st = init_fused_state(cfg)
    pemb = variables["params"]["token_emb"]["embedding"]
    ppos = variables["params"]["abs_pos_emb"]["embedding"]

    # embedding tables as ARGUMENTS, not closure captures (CLAUDE.md:
    # closed-over pytrees bake into the HLO as constants and stall
    # compilation once the validation model is scaled up)
    @jax.jit
    def roll(params_f, st, toks, pemb, ppos):
        def body(carry, t):
            st = carry
            h = (
                jnp.asarray(pemb)[toks[:, t]] + jnp.asarray(ppos)[t][None]
            ).astype(jnp.float32)
            h, st, ka, va = fused_decode_step_ref(
                params_f, st, h, t, cfg, use_quantized=True
            )
            st = update_rings(st, ka, va, t, cfg)
            return st, h

        st, hs = jax.lax.scan(body, st, jnp.arange(T))
        return hs[-1]

    h_last = roll(params_f, st, toks, pemb, ppos)
    fn = variables["params"]["final_norm"]
    h32 = jnp.asarray(h_last, jnp.float32)
    mu = h32.mean(-1, keepdims=True)
    var = ((h32 - mu) ** 2).mean(-1, keepdims=True)
    hn = (h32 - mu) * jax.lax.rsqrt(var + 1e-6) * fn["scale"] + fn["bias"]
    out_k = variables["params"]["to_out"]
    logits_fused = np.asarray(hn @ out_k["kernel"] + out_k["bias"])

    std = float(np.std(logits_exact))
    max_rel = float(np.abs(logits_exact - logits_fused).max() / (std + 1e-9))
    greedy_tf = float(
        (logits_exact.argmax(-1) == logits_fused.argmax(-1)).mean()
    )

    print(json.dumps({
        "block_form": "rezero+spatial" if args.paper_form else "preln",
        "weight_quant": args.weight_quant,
        "trained_ce": round(loss, 4),
        "greedy_agreement_fused_bf16_rings": round(agree_bf, 4),
        "greedy_agreement_fused_int8_rings": round(agree_i8, 4),
        "teacher_forced_max_rel_logit_perturbation": round(max_rel, 4),
        "teacher_forced_greedy_agreement": round(greedy_tf, 4),
        "logit_std": round(std, 3),
    }))


if __name__ == "__main__":
    main()

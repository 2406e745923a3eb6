"""Full two-stage QUALITY loop on the chip (VERDICT r4 #6).

The smoke pipeline (tools/smoke_pipeline_tpu.py) proves the 5-stage
workflow *runs*; this tool proves it *learns*, end to end, through the
same public CLI surfaces the reference exposes (run_vqvae.py:538 /
run_transformer.py:405):

  1. generate structured synthetic "brain-like" volumes (48³ —
     rotated ellipsoid tissue + bright shell + dark inner blobs +
     smooth intensity field; the smallest size the reference MS-SSIM
     window rule accepts, src/utils/vqvae.py:499-544),
  2. train the VQ-VAE until val MS-SSIM ≥ --ms_ssim, in epoch chunks
     through the auto-resume path (each chunk re-invokes the CLI with
     a larger --epochs and restores the last checkpoint),
  3. extract latents,
  4. train the Performer prior (paper block form: ReZero + learned
     'absolute' spatial tables) until val CE ≤ --ce, same chunked
     resume,
  5. sample new latent grids (temperature 1.0),
  6. decode them to volumes,
  7. assert the sampled volumes' statistics land inside the envelope
     of the *reconstructed* training set (foreground fraction,
     bright-shell fraction, mean intensity, gradient magnitude) and
     that samples are diverse — i.e. the prior learned the latent
     distribution rather than memorising or collapsing.  The envelope
     is taken over encode→decode round-trips of the training volumes,
     not the raw volumes: both sides then carry the same codec
     imprint (e.g. the decoder's nonzero background tint), so the
     check isolates the prior's samples from stage-1 recon artifacts
     (recon fidelity itself is pinned by the MS-SSIM bar).

Prints one JSON line for BASELINE.md.  Reference contract being
exercised: SURVEY.md §3.2/§3.4 call stacks (two-stage training +
synthesis).

Usage: timeout 3600 python tools/quality_loop.py [--workdir=/tmp/quality_loop]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------- data


def make_brain_volume(rng: np.random.Generator, size: int = 48) -> np.ndarray:
    """One structured synthetic volume in [0, 1]: a randomly placed,
    randomly rotated ellipsoid of smooth "tissue" intensity wrapped in
    a bright shell, with 2 dark inner blobs and mild sensor noise."""
    ax = np.arange(size, dtype=np.float32)
    z, y, x = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([z, y, x], axis=-1)

    center = size * rng.uniform(0.44, 0.56, 3).astype(np.float32)
    radii = size * rng.uniform(0.28, 0.38, 3).astype(np.float32)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    d = ((pts - center) @ q.astype(np.float32)) / radii
    r2 = (d * d).sum(-1)

    phase = rng.uniform(0, 2 * np.pi, 3)
    freq = rng.uniform(1.0, 2.0, 3)
    field = (
        np.sin(2 * np.pi * freq[0] * z / size + phase[0])
        + np.sin(2 * np.pi * freq[1] * y / size + phase[1])
        + np.sin(2 * np.pi * freq[2] * x / size + phase[2])
    ).astype(np.float32) / 3.0

    vol = np.where(r2 < 1.0, 0.55 + 0.18 * field, 0.0).astype(np.float32)
    vol = np.where((r2 >= 0.72) & (r2 < 1.0), 0.92, vol).astype(np.float32)
    for _ in range(2):
        bc = center + rng.uniform(-0.3, 0.3, 3).astype(np.float32) * radii * 0.5
        br = size * rng.uniform(0.05, 0.09)
        bd = ((pts - bc) ** 2).sum(-1)
        vol = np.where((bd < br * br) & (r2 < 0.72), 0.12, vol)
    vol = vol + rng.normal(0, 0.01, vol.shape).astype(np.float32)
    return np.clip(vol, 0.0, 1.0).astype(np.float32)


def volume_stats(vol: np.ndarray) -> dict:
    """Distribution-level shape statistics, computed on a per-volume
    min-max normalised copy (the loader normalises inputs to [0,1] the
    same way, so train and decoded-sample stats are comparable)."""
    v = vol.astype(np.float32)
    lo, hi = float(v.min()), float(v.max())
    v = (v - lo) / max(hi - lo, 1e-6)
    fg = v > 0.3
    grad = (
        np.abs(np.diff(v, axis=0)).mean()
        + np.abs(np.diff(v, axis=1)).mean()
        + np.abs(np.diff(v, axis=2)).mean()
    ) / 3.0
    return {
        "foreground_frac": float(fg.mean()),
        "bright_frac": float((v > 0.8).mean()),
        "mean_intensity": float(v.mean()),
        "grad_mag": float(grad),
    }


def stat_envelope(stats: list, widen: float = 0.5) -> dict:
    """[min, max] per statistic over the training set, widened by
    ``widen`` × span each side (plus a small absolute floor)."""
    keys = stats[0].keys()
    env = {}
    for k in keys:
        vals = np.array([s[k] for s in stats])
        lo, hi = float(vals.min()), float(vals.max())
        pad = widen * (hi - lo) + 0.01
        env[k] = (lo - pad, hi + pad)
    return env


# ---------------------------------------------------------------- main


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/quality_loop")
    p.add_argument("--n_subjects", type=int, default=32)
    p.add_argument("--size", type=int, default=48)
    p.add_argument("--ms_ssim", type=float, default=0.90,
                   help="stage-1 val MS-SSIM threshold")
    p.add_argument("--ce", type=float, default=1.0,
                   help="stage-2 val CE threshold (nats/token)")
    p.add_argument("--vq_chunk", type=int, default=10)
    p.add_argument("--max_vq_chunks", type=int, default=8)
    p.add_argument("--prior_chunk", type=int, default=5)
    p.add_argument("--max_prior_chunks", type=int, default=8)
    p.add_argument("--n_samples", type=int, default=8)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from synthanatomy_tpu.data.nifti import load_nifti, save_nifti

    t_start = time.time()
    root = args.workdir
    shutil.rmtree(root, ignore_errors=True)
    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir)
    rng = np.random.default_rng(7)
    train_vols = []
    for i in range(args.n_subjects):
        vol = make_brain_volume(rng, args.size)
        train_vols.append(vol)
        save_nifti(os.path.join(data_dir, f"subj{i:03d}.nii.gz"), vol)
    train_stats = [volume_stats(v) for v in train_vols]
    env = stat_envelope(train_stats)
    print(f"[0/6] {args.n_subjects} structured volumes @ {args.size}³; "
          f"train stat envelope: "
          + ", ".join(f"{k}=[{a:.3f},{b:.3f}]" for k, (a, b) in env.items()),
          flush=True)

    from run_transformer import run as run_transformer
    from run_vqvae import run as run_vqvae

    vq = dict(
        training_subjects=data_dir,
        validation_subjects=data_dir,
        project_directory=root,
        experiment_name="quality",
        batch_size=4,
        eval_batch_size=4,
        num_workers=2,
        prefetch_factor=2,
        loss="mse",
        adversarial_component=False,
        augmentation_probability=0.0,
        no_levels=2,
        downsample_parameters=((4, 2, 1, 1), (4, 2, 1, 1)),
        upsample_parameters=((4, 2, 1, 0, 1), (4, 2, 1, 0, 1)),
        no_channels=48,
        no_res_layers=2,
        num_embeddings=(128,),
        embedding_dim=(32,),
        decay=(0.5,),
        gamma=0.999,
        log_every=5,
    )

    # ---- stage 1: VQ-VAE to an MS-SSIM threshold (chunked auto-resume)
    ms = -1.0
    vq_epochs = 0
    for chunk in range(args.max_vq_chunks):
        vq_epochs += args.vq_chunk
        r = run_vqvae(
            mode="training", epochs=vq_epochs, eval_every=args.vq_chunk,
            checkpoint_every=args.vq_chunk, **vq,
        )
        ms = r["history"][-1].get("val_MS-SSIM", -1.0)
        print(f"[1/6] VQ-VAE epoch {vq_epochs}: val MS-SSIM={ms:.4f} "
              f"MSE={r['history'][-1].get('val_MSE', float('nan')):.5f} "
              f"({time.time() - t_start:.0f}s)", flush=True)
        if ms >= args.ms_ssim:
            break
    assert ms >= args.ms_ssim, (
        f"VQ-VAE failed the quality bar: val MS-SSIM {ms:.4f} < "
        f"{args.ms_ssim} after {vq_epochs} epochs"
    )

    # ---- stage 2: latent extraction
    run_vqvae(mode="extracting", epochs=vq_epochs, eval_every=args.vq_chunk,
              checkpoint_every=args.vq_chunk, **vq)
    out_vq = os.path.join(root, "quality", "baseline_vqvae", "outputs")
    latents = sorted(
        f for f in os.listdir(out_vq) if f.endswith("_quantization_0.npy")
    )
    assert len(latents) == args.n_subjects, latents
    lat_dir = os.path.join(root, "latents")
    os.makedirs(lat_dir)
    for f in latents:
        os.rename(os.path.join(out_vq, f), os.path.join(lat_dir, f))
    lat_shape = np.load(os.path.join(lat_dir, latents[0])).shape
    print(f"[2/6] extracted {len(latents)} latent grids {lat_shape}", flush=True)

    # ---- stage 2b: decode the extracted training latents and take the
    # stat envelope over the RECONSTRUCTIONS (the fair yardstick for
    # stage 6 — the sampled volumes go through the same decoder)
    vq_rec = dict(vq)
    vq_rec["training_subjects"] = lat_dir
    run_vqvae(mode="decoding", epochs=vq_epochs, eval_every=args.vq_chunk,
              checkpoint_every=args.vq_chunk, **vq_rec)
    recon_files = sorted(
        f for f in os.listdir(out_vq) if f.endswith("_sample.nii.gz")
    )
    assert len(recon_files) == args.n_subjects, recon_files
    recon_stats = []
    for f in recon_files:
        recon_stats.append(volume_stats(load_nifti(os.path.join(out_vq, f)).data))
        os.remove(os.path.join(out_vq, f))
    env = stat_envelope(recon_stats)
    print(f"[2b/6] recon stat envelope (n={len(recon_stats)}): "
          + ", ".join(f"{k}=[{a:.3f},{b:.3f}]" for k, (a, b) in env.items()),
          flush=True)

    # ---- stage 3: prior to a CE threshold (paper block form)
    tr = dict(
        training_subjects=lat_dir,
        validation_subjects=lat_dir,
        project_directory=root,
        experiment_name="quality",
        batch_size=4,
        eval_batch_size=args.n_samples,
        num_workers=2,
        learning_rate=3e-4,
        vocab_size=128,
        n_embd=256,
        n_layers=4,
        n_head=4,
        dim_head=64,
        nb_features=128,
        local_attn_heads=2,
        local_window_size=64,
        ordering_type="raster_scan",
        use_rezero=True,
        spatial_position_emb="absolute",
        gamma=0.999,
        log_every=5,
    )
    ce = float("inf")
    pr_epochs = 0
    for chunk in range(args.max_prior_chunks):
        pr_epochs += args.prior_chunk
        r = run_transformer(
            mode="training", epochs=pr_epochs, eval_every=args.prior_chunk,
            checkpoint_every=args.prior_chunk, **tr,
        )
        ce = r["history"][-1].get("val_Loss", float("inf"))
        print(f"[3/6] prior epoch {pr_epochs}: val CE={ce:.4f} "
              f"({time.time() - t_start:.0f}s)", flush=True)
        if ce <= args.ce:
            break
    assert ce <= args.ce, (
        f"prior failed the quality bar: val CE {ce:.4f} > {args.ce} "
        f"after {pr_epochs} epochs"
    )

    # ---- stage 4: sampling (one batch of n_samples, BOS-seeded from a
    # subset dir so the sample count is the batch size)
    seed_dir = os.path.join(root, "seed_latents")
    os.makedirs(seed_dir)
    for f in latents[: args.n_samples]:
        shutil.copy(os.path.join(lat_dir, f), os.path.join(seed_dir, f))
    tr_inf = dict(tr, training_subjects=seed_dir, validation_subjects=seed_dir)
    run_transformer(mode="inference", temperature=1.0, top_k=None,
                    epochs=pr_epochs, **tr_inf)
    out_tr = os.path.join(root, "quality", "performer", "outputs")
    sample_files = sorted(
        f for f in os.listdir(out_tr) if f.endswith("_sample.npy")
    )
    assert len(sample_files) == args.n_samples, sample_files
    grids = np.stack(
        [np.load(os.path.join(out_tr, f)) for f in sample_files]
    )
    assert grids.dtype == np.uint16 and grids.max() < 128, (
        grids.dtype, grids.max(),
    )
    # latent-level diversity: the prior must not have collapsed to one grid
    uniq = len({g.tobytes() for g in grids})
    print(f"[4/6] sampled {len(sample_files)} grids {grids.shape[1:]}, "
          f"{uniq} unique", flush=True)
    assert uniq >= max(2, args.n_samples // 2), f"mode collapse: {uniq} unique"
    samp_dir = os.path.join(root, "samples")
    os.makedirs(samp_dir)
    for f in sample_files:
        os.rename(os.path.join(out_tr, f), os.path.join(samp_dir, f))

    # ---- stage 5: decode sampled latents
    vq_dec = dict(vq)
    vq_dec["training_subjects"] = samp_dir
    run_vqvae(mode="decoding", epochs=vq_epochs, eval_every=args.vq_chunk,
              checkpoint_every=args.vq_chunk, **vq_dec)
    decoded_files = sorted(
        f for f in os.listdir(out_vq) if f.endswith("_sample.nii.gz")
    )
    assert len(decoded_files) == args.n_samples, decoded_files
    decoded = [
        load_nifti(os.path.join(out_vq, f)).data for f in decoded_files
    ]
    print(f"[5/6] decoded {len(decoded)} volumes {decoded[0].shape}", flush=True)

    # ---- stage 6: sampled-volume statistics vs the training envelope
    n_ok = 0
    failures = []
    for f, vol in zip(decoded_files, decoded):
        s = volume_stats(vol)
        bad = {
            k: (round(s[k], 4), tuple(round(b, 4) for b in env[k]))
            for k in env
            if not (env[k][0] <= s[k] <= env[k][1])
        }
        if bad:
            failures.append((f, bad))
        else:
            n_ok += 1
    # volume-level diversity: mean pairwise |Δ| between decoded samples
    pairs = [
        float(np.abs(decoded[i] - decoded[j]).mean())
        for i in range(len(decoded))
        for j in range(i + 1, len(decoded))
    ]
    diversity = float(np.mean(pairs))
    for f, bad in failures:
        print(f"      OUT-OF-ENVELOPE {f}: {bad}", flush=True)
    print(f"[6/6] {n_ok}/{args.n_samples} sampled volumes inside the "
          f"training stat envelope; mean pairwise |Δ|={diversity:.4f}",
          flush=True)
    assert n_ok == args.n_samples, f"{len(failures)} sampled volumes out of envelope"
    assert diversity > 0.005, f"decoded samples near-identical: {diversity}"

    result = {
        "tool": "quality_loop",
        "vq_epochs": vq_epochs,
        "val_ms_ssim": round(ms, 4),
        "prior_epochs": pr_epochs,
        "prior_val_ce": round(ce, 4),
        "n_samples": args.n_samples,
        "unique_grids": uniq,
        "samples_in_envelope": n_ok,
        "decoded_diversity": round(diversity, 4),
        "wall_s": round(time.time() - t_start, 1),
        "platform": jax.devices()[0].platform,
    }
    print("QUALITY LOOP OK")
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""On-chip smoke of the complete 5-stage reference workflow.

Drives the PUBLIC CLI entries (run_vqvae.run / run_transformer.run —
the same surfaces as the reference's run_vqvae.py:538 /
run_transformer.py:405) on the attached TPU with the production
defaults active (bf16 compute, Pallas VQ + attention kernels):

  1. VQ-VAE adversarial training          (mode=training)
  2. latent extraction                    (mode=extracting)
  3. Performer prior training             (mode=training)
  4. prior sampling                       (mode=inference)
  5. decoding sampled latents to NIfTI    (mode=decoding)

Small synthetic volumes (32³, latents 8³) keep the whole run a few
minutes; the point is exercising the real code paths on real hardware
— compile, kernels, checkpoint save/restore, file contracts — not
statistical quality.  The CPU equivalent (full assertions) is
tests/test_end_to_end.py; this tool exists so runner/kernel changes
can be validated against the chip in one command:

    python tools/smoke_pipeline_tpu.py [--workdir=/tmp/smoke_proj]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/smoke_proj")
    args = p.parse_args()

    from synthanatomy_tpu.data.nifti import load_nifti, save_nifti

    root = args.workdir
    shutil.rmtree(root, ignore_errors=True)
    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir)
    rng = np.random.default_rng(0)
    for i in range(4):
        vol = rng.uniform(size=(32, 32, 32)).astype(np.float32)
        save_nifti(os.path.join(data_dir, f"subj{i}.nii.gz"), vol)

    from run_transformer import run as run_transformer
    from run_vqvae import run as run_vqvae

    vq = dict(
        training_subjects=data_dir,
        validation_subjects=data_dir,
        project_directory=root,
        experiment_name="smoke",
        epochs=2,
        batch_size=2,
        eval_batch_size=2,
        eval_every=2,
        checkpoint_every=1,
        num_workers=2,
        prefetch_factor=2,
        loss="mse",
        adversarial_component=True,
        no_levels=2,
        downsample_parameters=((4, 2, 1, 1), (4, 2, 1, 1)),
        upsample_parameters=((4, 2, 1, 0, 1), (4, 2, 1, 0, 1)),
        no_channels=16,
        no_res_layers=1,
        num_embeddings=(64,),
        embedding_dim=(8,),
        decay=(0.5,),
        gamma=0.999,
    )

    print("[1/5] VQ-VAE adversarial training ...", flush=True)
    r = run_vqvae(mode="training", **vq)
    loss = r["history"][-1]["Loss-Reconstruction-Total"]
    assert np.isfinite(loss), loss
    print(f"      recon loss {loss:.4f}")

    print("[2/5] latent extraction ...", flush=True)
    run_vqvae(mode="extracting", **vq)
    out1 = os.path.join(root, "smoke", "baseline_vqvae", "outputs")
    latents = [f for f in os.listdir(out1) if f.endswith("_quantization_0.npy")]
    assert len(latents) == 4, latents
    lat_dir = os.path.join(root, "latents")
    os.makedirs(lat_dir)
    for f in latents:
        os.rename(os.path.join(out1, f), os.path.join(lat_dir, f))
    print(f"      {len(latents)} latent grids "
          f"{np.load(os.path.join(lat_dir, latents[0])).shape}")

    # conditioned prior (the released paper priors' setup): a tiny
    # conditioning CSV joined on the subject name
    import pandas as pd

    cond_csv = os.path.join(root, "conditioning.csv")
    pd.DataFrame(
        {
            "subject": sorted(latents),
            "age": [60.0, 70.0, 60.0, 70.0],
        }
    ).to_csv(cond_csv, index=False)

    # the PAPER block/embedding form at smoke scale: ReZero blocks +
    # learned 'absolute' spatial tables + bos_replacement conditioning,
    # 2 global + 2 local heads at dim_head=64 so stage [4/5] exercises
    # the FUSED decode kernel (supports_fused_decode needs
    # dim_head∈{64,128}, dim%128==0, and 128-lane-aligned head groups)
    tr = dict(
        training_subjects=lat_dir,
        validation_subjects=lat_dir,
        project_directory=root,
        experiment_name="smoke",
        eval_batch_size=4,
        num_workers=2,
        vocab_size=64,
        n_embd=256,
        n_layers=2,
        n_head=4,
        dim_head=64,
        nb_features=128,
        local_attn_heads=2,
        local_window_size=64,
        ordering_type="hilbert",
        use_rezero=True,
        spatial_position_emb="absolute",
        conditioning_path=cond_csv,
        conditionings=("age",),
        conditioning_type="bos_replacement",
    )

    print("[3/5] Performer prior training (Pallas kernels on) ...", flush=True)
    r = run_transformer(
        mode="training", epochs=2, batch_size=4, eval_every=2,
        checkpoint_every=1, log_every=1, gamma=0.999, **tr,
    )
    l0, l1 = r["history"][0]["Loss"], r["history"][-1]["Loss"]
    assert np.isfinite(l1) and l1 < l0, (l0, l1)
    print(f"      CE {l0:.4f} -> {l1:.4f}")

    print("[4/5] prior sampling ...", flush=True)
    run_transformer(mode="inference", temperature=1.0, top_k=32, **tr)
    out2 = os.path.join(root, "smoke", "performer", "outputs")
    samples = [f for f in os.listdir(out2) if f.endswith("_sample.npy")]
    arr = np.load(os.path.join(out2, samples[0]))
    assert arr.dtype == np.uint16 and arr.max() < 64, (arr.dtype, arr.max())
    samp_dir = os.path.join(root, "samples")
    os.makedirs(samp_dir)
    for f in samples:
        os.rename(os.path.join(out2, f), os.path.join(samp_dir, f))
    print(f"      {len(samples)} sampled grids {arr.shape}")

    print("[5/5] decoding sampled latents ...", flush=True)
    vq_dec = dict(vq)
    vq_dec["training_subjects"] = samp_dir
    run_vqvae(mode="decoding", **vq_dec)
    decoded = [
        f for f in os.listdir(out1) if f.endswith("_sample.nii.gz")
    ]
    assert decoded, os.listdir(out1)
    vol = load_nifti(os.path.join(out1, decoded[0])).data
    print(f"      {len(decoded)} decoded volumes {vol.shape}")

    print("SMOKE OK: 5-stage pipeline on", end=" ")
    import jax

    print(jax.devices()[0].platform.upper())


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Host data-pipeline benchmark (SURVEY.md §7 'host data pipeline
throughput' hard part): NIfTI decode → transform chain → batch,
native C++ loader vs pure Python, in volumes/s.

Usage: python tools/bench_dataloader.py [--n=16 --shape='(160,224,160)']
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from synthanatomy_tpu.cli import parse_argv
    from synthanatomy_tpu.data.datasets import (
        PrefetchLoader,
        VolumeDataset,
        discover_subjects,
    )
    from synthanatomy_tpu.data.nifti import save_nifti
    from synthanatomy_tpu.data.transforms import VQVAETransform
    from synthanatomy_tpu.native import native_available

    _, kw = parse_argv(sys.argv[1:])
    n = int(kw.get("n", 8))
    shape = tuple(kw.get("shape", (160, 224, 160)))
    workers = int(kw.get("workers", os.cpu_count() or 1))

    with tempfile.TemporaryDirectory() as d:
        rng = np.random.default_rng(0)
        print(f"writing {n} volumes of {shape}...", flush=True)
        for i in range(n):
            save_nifti(
                os.path.join(d, f"s{i}.nii.gz"),
                (rng.uniform(0, 1000, shape)).astype(np.float32),
            )

        aug_p = float(kw.get("augment_p", 0.2))
        tf = VQVAETransform(augment=True, augmentation_probability=aug_p)
        cases = [
            (True, False, "native C++"),
            (False, False, "pure python"),
            # host does load+normalize only; the randomized chain runs
            # on-device inside the train step (config.device_augmentation)
            (True, True, "native C++ + device-augment"),
        ]
        for use_native, dev_aug, tag in cases:
            if use_native and not native_available():
                print("native loader unavailable; skipping")
                continue
            ds = VolumeDataset(
                discover_subjects(d), tf, use_native=use_native,
                device_augment=dev_aug,
            )
            loader = PrefetchLoader(
                ds, batch_size=2, num_workers=workers, shuffle=False,
                drop_last=False,
            )
            # warm (file cache) — exhaust the epoch: its worker threads
            # keep draining the job queue after the first batch, and on
            # a 1-core box they'd contend with the timed epoch (this
            # inflated the round-4 recorded numbers by ~1.7x)
            for _ in loader.epoch(0):
                pass
            t0 = time.perf_counter()
            count = 0
            for batch in loader.epoch(1):
                count += batch["MRI"].shape[0]
            dt = time.perf_counter() - t0
            print(
                f"{tag:12s}: {count / dt:6.2f} volumes/s "
                f"({dt / count * 1e3:.0f} ms/volume, {workers} workers)",
                flush=True,
            )


if __name__ == "__main__":
    main()

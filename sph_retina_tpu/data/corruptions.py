"""Image corruptions for the robustness benchmark.

Counterpart of the reference's corruption benchmark
(/root/reference/tools/analysis_tools/test_robustness.py, which applies the
``imagecorruptions`` library inside the mmdet pipeline; metrics in
robustness_eval.py). Re-implemented natively (numpy + cv2 + PIL) with the
published severity parameterizations, and — unlike the upstream library —
**seeded**, so every evaluation is reproducible.

All 15 benchmark types are implemented
(/root/reference/tools/analysis_tools/test_robustness.py:222-227). Three
deviate from upstream by construction and are documented as such:
``frost`` overlays a *procedural* crystalline texture instead of the
library's six bundled frost photographs (zero egress — no binary assets);
``glass_blur`` replaces the upstream per-pixel python swap loop (O(iters *
H * W) interpreter time, pathological on ERP images) with vectorized
random-displacement gathers of the same radius/iteration schedule; and
``elastic_transform`` uses a shape-relative smoothed displacement field
(cv2.remap) rather than scipy map_coordinates with the library's absolute
pixel constants.
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


def glass_blur(img, severity, rng):
    """Upstream: gaussian blur, then ``iters`` sweeps where every pixel is
    swapped with a random neighbour within ``max_delta`` — a per-pixel
    python loop. Same schedule here, but each sweep is one vectorized
    gather through a random integer displacement field (a shuffle
    approximated as resampling; visually identical frosted-glass grain,
    bounded cost)."""
    import cv2

    sigma, max_delta, iters = [(0.7, 1, 2), (0.9, 2, 1), (1.0, 2, 3),
                               (1.1, 3, 2), (1.5, 4, 2)][severity - 1]
    x = cv2.GaussianBlur(_to_float(img), (0, 0), sigma)
    h, w = x.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(iters):
        dy = rng.integers(-max_delta, max_delta + 1, (h, w))
        dx = rng.integers(-max_delta, max_delta + 1, (h, w))
        x = x[np.clip(yy + dy, 0, h - 1), np.clip(xx + dx, 0, w - 1)]
    return cv2.GaussianBlur(x, (0, 0), sigma)


def _frost_texture(shape, rng):
    """Procedural stand-in for the upstream library's bundled frost
    photographs: sharpened multi-octave noise for the icy grain plus a few
    anisotropic (motion-blurred noise) crystalline streak layers."""
    import cv2

    h, w = shape
    base = _plasma((h, w), rng, octaves=6) ** 2.2
    streaks = np.zeros((h, w), np.float32)
    for _ in range(3):
        g = rng.random((h, w)).astype(np.float32)
        g = np.where(g > 0.985, g, 0.0)  # sparse bright seeds
        size = max(7, min(h, w) // 24) | 1
        angle = rng.uniform(0, 180)
        k = np.zeros((size, size), np.float32)
        k[size // 2, :] = 1.0
        rot = cv2.getRotationMatrix2D((size / 2 - 0.5, size / 2 - 0.5),
                                      angle, 1)
        k = cv2.warpAffine(k, rot, (size, size))
        streaks += cv2.filter2D(g, -1, k / max(k.sum(), 1e-6)) * size
    tex = base * 0.7 + np.clip(streaks, 0, 1) * 0.6
    tex -= tex.min()
    return (tex / max(tex.max(), 1e-6))[..., None]


def frost(img, severity, rng):
    cx, cf = [(1.0, 0.4), (0.8, 0.6), (0.7, 0.7),
              (0.65, 0.7), (0.6, 0.75)][severity - 1]
    x = _to_float(img)
    return cx * x + cf * _frost_texture(x.shape[:2], rng)


def snow(img, severity, rng):
    """Upstream recipe (imagecorruptions.snow): a zoomed, thresholded
    gaussian field motion-blurred into flakes, composited over a
    brightness-lifted image, added in two orientations."""
    import cv2

    loc, scale, zoom, thresh, radius, sigma, cmix = [
        (0.1, 0.3, 3.0, 0.5, 10, 4, 0.8),
        (0.2, 0.3, 2.0, 0.5, 12, 4, 0.7),
        (0.55, 0.3, 4.0, 0.9, 12, 8, 0.7),
        (0.55, 0.3, 4.5, 0.85, 12, 8, 0.65),
        (0.55, 0.3, 2.5, 0.85, 12, 12, 0.55)][severity - 1]
    x = _to_float(img)
    h, w = x.shape[:2]
    field = rng.normal(loc, scale, (h, w)).astype(np.float32)
    zh, zw = int(np.ceil(h * zoom)), int(np.ceil(w * zoom))
    field = cv2.resize(field, (zw, zh),
                       interpolation=cv2.INTER_LINEAR)[:h, :w]
    field[field < thresh] = 0.0
    size = 2 * radius + 1
    angle = rng.uniform(-135, -45)
    k = np.zeros((size, size), np.float32)
    k[size // 2, :] = np.exp(
        -np.arange(-radius, radius + 1) ** 2 / (2.0 * sigma ** 2))
    rot = cv2.getRotationMatrix2D((size / 2 - 0.5, size / 2 - 0.5), angle, 1)
    k = cv2.warpAffine(k, rot, (size, size))
    layer = cv2.filter2D(field, -1, k / max(k.sum(), 1e-6))[..., None]
    gray = x.mean(axis=2, keepdims=True)
    x = cmix * x + (1 - cmix) * np.maximum(x, gray * 1.5 + 0.5)
    return x + layer + np.rot90(layer, k=2, axes=(0, 1))


def elastic_transform(img, severity, rng):
    """Shape-relative smoothed random displacement field + small random
    affine, applied with one cv2.remap (upstream uses scipy
    map_coordinates with absolute pixel constants)."""
    import cv2

    # (affine jitter, displacement amplitude, field smoothing sigma),
    # all as fractions of min(h, w)
    ca, alpha, sig = [(0.02, 0.015, 0.08), (0.03, 0.022, 0.07),
                      (0.035, 0.035, 0.06), (0.04, 0.09, 0.06),
                      (0.05, 0.14, 0.05)][severity - 1]
    x = _to_float(img)
    h, w = x.shape[:2]
    m = float(min(h, w))
    pts = np.float32([[w / 2, h / 2], [w / 2 + m / 4, h / 2],
                      [w / 2, h / 2 + m / 4]])
    jitter = rng.uniform(-ca * m, ca * m, (3, 2)).astype(np.float32)
    mat = cv2.getAffineTransform(pts, pts + jitter)
    x = cv2.warpAffine(x, mat, (w, h), borderMode=cv2.BORDER_REFLECT)
    dx = cv2.GaussianBlur(
        rng.uniform(-1, 1, (h, w)).astype(np.float32), (0, 0), sig * m)
    dy = cv2.GaussianBlur(
        rng.uniform(-1, 1, (h, w)).astype(np.float32), (0, 0), sig * m)
    norm = max(np.abs(dx).max(), np.abs(dy).max(), 1e-6)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    map_x = xx + dx / norm * alpha * m
    map_y = yy + dy / norm * alpha * m
    return cv2.remap(x, map_x, map_y, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_REFLECT)


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
    # reference benchmark order (test_robustness.py:222-227)
    "gaussian_noise": gaussian_noise,
    "shot_noise": shot_noise,
    "impulse_noise": impulse_noise,
    "defocus_blur": defocus_blur,
    "glass_blur": glass_blur,
    "motion_blur": motion_blur,
    "zoom_blur": zoom_blur,
    "snow": snow,
    "frost": frost,
    "fog": fog,
    "brightness": brightness,
    "contrast": contrast,
    "elastic_transform": elastic_transform,
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

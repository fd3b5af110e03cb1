"""Transfer-colorspace policy: measured RGB-vs-YUV420 selection.

YUV420 packing halves host->device bytes but costs host CPU (measured on
the round-4 host: 244 -> 133 img/s single-vCPU), so the right default flips
with the link: a tunneled device (~3-150 MB/s) wants yuv420, a PCIe-local
chip (>10 GB/s) wants rgb (VERDICT r4 item 6). ``resolve_transfer_colorspace``
turns that trade into a measurement: probe the host pack rate and the actual
link bandwidth, model the steady-state pipeline rate of each colorspace as

    effective(c) = min(host_rate(c) * workers, link_bytes_per_sec / bytes(c))

and pick the argmax. Configs opt in with ``data.transfer_colorspace='auto'``
(builder.build_datasets); explicit 'rgb' / 'yuv420' bypass the probe.
"""

from __future__ import annotations

import os
import time

import numpy as np


def _probe_host_rates(img_size, n=6):
    """Single-thread img/s of the full decode+resize(+pack) host path for
    both colorspaces. Probes the real file path (a temp JPEG through the
    native loader when available — its raw-plane I420 decode is *faster*
    than the RGB path, which inverts the naive pack-costs-extra intuition);
    falls back to the in-memory python pipeline otherwise."""
    import tempfile

    from .pipeline import SphPipeline

    h, w = img_size
    img = (np.random.default_rng(0).random((h, w, 3)) * 255).astype(np.uint8)

    from . import native_loader

    if native_loader.available():
        from PIL import Image

        with tempfile.NamedTemporaryFile(suffix=".jpg") as tmp:
            Image.fromarray(img).save(tmp.name, quality=85)
            out = {}
            for name, fn in (
                    ("rgb", native_loader.load_image_u8),
                    ("yuv420", native_loader.load_image_yuv)):
                fn(tmp.name, img_size)  # warm
                t0 = time.perf_counter()
                for _ in range(n):
                    fn(tmp.name, img_size)
                out[name] = n / (time.perf_counter() - t0)
            return out

    rgb_pipe = SphPipeline(img_size=img_size, training=False,
                           normalize_on_device=True,
                           transfer_colorspace="rgb")
    yuv_pipe = SphPipeline(img_size=img_size, training=False,
                           normalize_on_device=True,
                           transfer_colorspace="yuv420")
    item = {"image": img, "boxes": np.zeros((0, 4), np.float32),
            "labels": np.zeros((0,), np.int32)}
    rng = np.random.default_rng(0)
    out = {}
    for name, pipe in (("rgb", rgb_pipe), ("yuv420", yuv_pipe)):
        pipe(dict(item), rng)  # warm
        t0 = time.perf_counter()
        for _ in range(n):
            pipe(dict(item), rng)
        out[name] = n / (time.perf_counter() - t0)
    return out


def _probe_link_bytes_per_sec(nbytes=4 << 20, trials=2):
    """Measured host->device bandwidth: transfer + force materialization."""
    import jax
    import jax.numpy as jnp

    buf = np.zeros((nbytes,), np.uint8)
    jnp.asarray(buf).block_until_ready()  # warm the path
    t0 = time.perf_counter()
    for _ in range(trials):
        # fetching one element forces the copy to land even on tunneled
        # backends where block_until_ready returns at enqueue
        float(jnp.asarray(buf)[0])
    return trials * nbytes / (time.perf_counter() - t0)


def resolve_transfer_colorspace(img_size, num_workers: int = 4,
                                probe_link=None, probe_host=None) -> str:
    """Pick 'rgb' or 'yuv420' from measured host and link rates.

    Falls back to 'rgb' (the zero-extra-host-cost choice) when the probes
    cannot run (no device, restricted environment). Override hooks exist
    for tests."""
    h, w = img_size
    try:
        host = (probe_host or _probe_host_rates)(img_size)
        link = (probe_link or _probe_link_bytes_per_sec)()
    except Exception:
        return "rgb"
    workers = max(1, min(num_workers, os.cpu_count() or 1))
    bytes_rgb = h * w * 3
    bytes_yuv = h * w * 3 // 2
    eff_rgb = min(host["rgb"] * workers, link / bytes_rgb)
    eff_yuv = min(host["yuv420"] * workers, link / bytes_yuv)
    return "yuv420" if eff_yuv > eff_rgb else "rgb"

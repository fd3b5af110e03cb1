"""Packaging smoke test (reference ships setup.py; here pyproject.toml).

Installs the package into an isolated --target dir (offline: --no-deps,
--no-build-isolation) and imports/drives it from there in a subprocess,
proving the wheel layout is self-contained.
"""

import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_pip_install_target_and_import(tmp_path):
    target = tmp_path / "site"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps",
         "--no-build-isolation", "--quiet", "--target", str(target), REPO],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    probe = (
        "import sph_retina_tpu, os, sys\n"
        f"assert os.path.dirname(sph_retina_tpu.__file__).startswith({str(target)!r}), sph_retina_tpu.__file__\n"
        "from sph_retina_tpu.iou import sph_overlaps\n"
        "from sph_retina_tpu.geometry import generate_boxes\n"
        "import jax.numpy as jnp\n"
        "b = jnp.asarray(generate_boxes(16, 4, seed=1))\n"
        "v = float(sph_overlaps(b, b, 'sph2pob_efficient', is_aligned=True).mean())\n"
        "assert 0.9 < v <= 1.0 + 1e-6, v\n"
        "print('ok', v)\n"
    )
    env = {**os.environ, "PYTHONPATH": str(target), "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": ""}
    r = subprocess.run([sys.executable, "-c", probe], cwd=str(tmp_path),
                       capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    assert "ok" in r.stdout

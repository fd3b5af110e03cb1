"""Tests for the OOM retry ladder (utils/memory.py — AvoidCUDAOOM parity,
/root/reference/mmdet/utils/memory.py:79) and the dataset staging tool
(tools/download_dataset.py — /root/reference/tools/misc/download_dataset.py),
both exercised fully offline."""

import hashlib
import os
import subprocess
import sys
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_retina_tpu.utils.memory import AvoidOOM, is_oom_error

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


class FakeOOM(RuntimeError):
    def __init__(self):
        super().__init__("RESOURCE_EXHAUSTED: Out of memory allocating "
                         "12345678 bytes")


def test_is_oom_error_classification():
    assert is_oom_error(FakeOOM())
    assert not is_oom_error(ValueError("shape mismatch"))


def test_retry_passes_through_success_and_other_errors():
    calls = []

    @AvoidOOM(verbose=False)
    def ok(x):
        calls.append(1)
        return x + 1

    assert float(ok(jnp.float32(1.0))) == 2.0
    assert len(calls) == 1

    @AvoidOOM(verbose=False)
    def boom(x):
        raise ValueError("not an oom")

    with pytest.raises(ValueError):
        boom(jnp.zeros(2))


def test_retry_ladder_falls_back_to_bf16():
    seen = []

    @AvoidOOM(verbose=False)
    def fn(x):
        seen.append(x.dtype)
        if x.dtype != jnp.bfloat16:
            raise FakeOOM()
        return x * 2

    out = fn(jnp.ones(4, jnp.float32))
    # full-precision try, gc retry, then the bf16 rung succeeds
    assert [str(d) for d in seen] == ["float32", "float32", "bfloat16"]
    # float outputs are cast back to fp32 for the caller
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_retry_ladder_falls_back_to_cpu():
    cpu = jax.devices("cpu")[0]
    calls = []

    @AvoidOOM(to_bf16=False, verbose=False)
    def fn(x):
        calls.append(list(x.devices())[0])
        if len(calls) < 3:
            raise FakeOOM()  # initial try + gc retry
        return x + 1

    out = fn(jnp.zeros(3, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), 1.0)
    assert len(calls) == 3 and calls[-1] == cpu  # rung 3 ran on the host

    with pytest.raises(RuntimeError, match="retry ladder"):
        AvoidOOM(to_bf16=False, to_cpu=False, verbose=False)(
            lambda: (_ for _ in ()).throw(FakeOOM()))()


def _make_zip(path, name="img.txt", payload=b"hello sphere"):
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(name, payload)
    return hashlib.sha256(path.read_bytes()).hexdigest()


def test_download_dataset_stages_local_archive(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "data"
    src.mkdir()
    digest = _make_zip(src / "mini.zip")

    p = subprocess.run(
        [sys.executable, "tools/download_dataset.py", "--dataset-name",
         "local", "--save-dir", str(dst), "--unzip",
         "--urls", f"{src / 'mini.zip'} sha256:{digest}"],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert p.returncode == 0, p.stdout + p.stderr
    assert (dst / "mini.zip").exists()          # staged copy
    assert (src / "mini.zip").exists()          # original untouched
    assert (dst / "img.txt").read_bytes() == b"hello sphere"


def test_download_dataset_checksum_mismatch_fails(tmp_path):
    src = tmp_path / "a.zip"
    dst = tmp_path / "out"
    with zipfile.ZipFile(src, "w") as z:
        z.writestr("x", "y")
    p = subprocess.run(
        [sys.executable, "tools/download_dataset.py", "--dataset-name",
         "local", "--save-dir", str(dst),
         "--urls", f"{src} sha256:{'0' * 64}"],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert p.returncode != 0
    assert "sha256 mismatch" in (p.stdout + p.stderr)


def test_download_dataset_gated_prints_instructions(tmp_path):
    p = subprocess.run(
        [sys.executable, "tools/download_dataset.py", "--dataset-name",
         "indoor360", "--save-dir", str(tmp_path / "d")],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert p.returncode == 0, p.stdout + p.stderr
    assert "360-Indoor" in p.stdout
    assert "convert_anno" in p.stdout

"""Live differential fuzz tests against the reference's own code.

Every test here runs BOTH implementations — this framework (jnp, fp32) and
the reference's torch/numpy modules loaded straight from /root/reference via
``tests/utils/refmods.py`` — on the same random boxes and asserts numerical
agreement. This replaces fixed golden pairs with measured parity on
thousands of points, including adversarial strata (seam, poles,
near-identical, containment, slivers).

Reference pipelines exercised end to end (their own jitter + transform +
IoU): sph2pob_{efficient,standard,legacy}_iou, unbiased_iou (BFoV + RBFoV
numpy oracles), sph_iou, fov_iou, naive_iou
(/root/reference/sphdet/iou/sph_iou_api.py), deg2kent moment estimation
(/root/reference/sphdet/bbox/kent_formator.py:833-839) and the Kent KLD
(/root/reference/sphdet/iou/kent_iou_calculator.py:133-161).

Box distribution matches the reference benchmark harness
(/root/reference/tests/test_all_ious.py:141-147): uniform theta in (0,360),
phi in (0,180), fov in (1,100) degrees.

Sizing: N boxes per stratum per backend; default keeps CI fast, full-size
mode via ``SPH_DIFF_N=10000 pytest tests/test_reference_differential.py``.

Tolerances: on non-degenerate strata both sides compute the same math in
fp32, and measured disagreement is ~1e-7 mean / <1e-3 max (dominated by
fp32 vertex math on sliver intersections). The ``near_identical`` stratum is
looser by design: both sides *jitter* degenerate pairs before computing, the
jitter reformulations differ (componentwise (cos,sin) here vs in-place torch
there), so identical inputs become slightly different perturbed pairs; both
values are ~1.0 and only their difference is bounded, not their equality.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from utils.refmods import load_reference_sphdet, reference_available  # noqa: E402

if not reference_available():  # pragma: no cover
    pytest.skip("/root/reference not present", allow_module_level=True)

import jax.numpy as jnp  # noqa: E402

from sph_retina_tpu.geometry import generate_boxes  # noqa: E402
from sph_retina_tpu.iou import sph_overlaps  # noqa: E402

N = int(os.environ.get("SPH_DIFF_N", "400"))


@pytest.fixture(scope="module")
def ref():
    return load_reference_sphdet()


def _strata(n: int, box_version: int, seed: int):
    """Adversarial strata on top of the reference's uniform distribution."""
    rng = np.random.default_rng(seed)
    v = box_version
    out = {}
    out["uniform"] = (
        generate_boxes(n, v, seed=seed),
        generate_boxes(n, v, seed=seed + 1),
    )

    a = generate_boxes(n, v, seed=seed + 2)
    b = generate_boxes(n, v, seed=seed + 3)
    a[:, 0] = rng.uniform(-5, 5, n) % 360
    b[:, 0] = rng.uniform(-5, 5, n) % 360
    out["seam"] = (a, b)

    a = generate_boxes(n, v, seed=seed + 4)
    b = generate_boxes(n, v, seed=seed + 5)
    polar = rng.uniform(1, 12, n)
    a[:, 1] = np.where(rng.random(n) < 0.5, polar, 180 - polar)
    b[:, 1] = np.clip(a[:, 1] + rng.uniform(-8, 8, n), 0.5, 179.5)
    out["pole"] = (a, b)

    a = generate_boxes(n, v, seed=seed + 6)
    b = a + rng.normal(0, 0.01, a.shape)
    b[:, 0] %= 360
    b[:, 1] = np.clip(b[:, 1], 0.1, 179.9)
    b[:, 2:4] = np.clip(b[:, 2:4], 1, 179)
    out["near_identical"] = (a.astype(np.float32), b.astype(np.float32))

    a = generate_boxes(n, v, seed=seed + 7)
    b = a.copy()
    b[:, 2:4] = b[:, 2:4] * rng.uniform(0.2, 0.6, (n, 1))
    out["containment"] = (a, b.astype(np.float32))

    a = generate_boxes(n, v, seed=seed + 8)
    b = generate_boxes(n, v, seed=seed + 9)
    a[:, 2] = rng.uniform(0.5, 3, n)
    b[:, 3] = rng.uniform(0.5, 3, n)
    b[:, 0] = (a[:, 0] + rng.uniform(-4, 4, n)) % 360
    b[:, 1] = np.clip(a[:, 1] + rng.uniform(-4, 4, n), 0.5, 179.5)
    out["sliver"] = (a, b)
    return out


def _ref_backend_fns(ref):
    api = ref.api
    return {
        "sph2pob_efficient": lambda a, b: api.sph2pob_efficient_iou(
            a, b, is_aligned=True, calculator="common"
        ),
        "sph2pob_standard": lambda a, b: api.sph2pob_standard_iou(
            a, b, is_aligned=True, calculator="common"
        ),
        "sph2pob_legacy": lambda a, b: api.sph2pob_legacy_iou(
            a, b, is_aligned=True, calculator="common"
        ),
        "unbiased": lambda a, b: api.unbiased_iou(a, b, is_aligned=True),
        "sph": lambda a, b: api.sph_iou(a, b, is_aligned=True),
        "fov": lambda a, b: api.fov_iou(a, b, is_aligned=True),
        "naive": lambda a, b: api.naive_iou(a, b, is_aligned=True),
    }


# (mean, max) bounds per backend on non-degenerate strata, with generous
# margin over the measured distributions (mean ~1e-7, max <1e-3); and
# (mean, p99) bounds on the near-identical stratum where only closeness of
# the independently-jittered results is claimed.
_BOUNDS = {
    "sph2pob_efficient": dict(mean=2e-5, max=2e-3, ni_mean=5e-3, ni_p99=5e-2),
    "sph2pob_standard": dict(mean=5e-5, max=1e-2, ni_mean=5e-3, ni_p99=5e-2),
    "sph2pob_legacy": dict(mean=2e-5, max=2e-3, ni_mean=5e-3, ni_p99=5e-2),
    "unbiased": dict(mean=1e-4, max=1e-2, ni_mean=1e-2, ni_p99=5e-2),
    "sph": dict(mean=1e-6, max=1e-4, ni_mean=1e-4, ni_p99=1e-3),
    "fov": dict(mean=1e-6, max=1e-4, ni_mean=1e-4, ni_p99=1e-3),
    "naive": dict(mean=1e-5, max=1e-3, ni_mean=1e-3, ni_p99=1e-2),
}

_BFOV_BACKENDS = sorted(_BOUNDS)
_RBFOV_BACKENDS = ["sph2pob_efficient", "sph2pob_standard", "unbiased"]


def _run_differential(ref, backend: str, box_version: int):
    ref_fn = _ref_backend_fns(ref)[backend]
    bounds = _BOUNDS[backend]
    strata = _strata(N, box_version, seed=1000 * box_version)

    pooled_ref, pooled_mine = [], []
    for name, (a, b) in strata.items():
        ta = torch.from_numpy(a.copy())
        tb = torch.from_numpy(b.copy())
        ref_v = np.clip(
            np.asarray(ref_fn(ta, tb).detach(), dtype=np.float64), 0.0, 1.0
        )
        mine = np.asarray(
            sph_overlaps(jnp.asarray(a), jnp.asarray(b), backend, is_aligned=True),
            dtype=np.float64,
        )
        err = np.abs(ref_v - mine)
        if name == "near_identical":
            assert err.mean() <= bounds["ni_mean"], (
                f"{backend}/{name}: mean err {err.mean():.2e}"
            )
            assert np.quantile(err, 0.99) <= bounds["ni_p99"], (
                f"{backend}/{name}: p99 err {np.quantile(err, 0.99):.2e}"
            )
        else:
            assert err.mean() <= bounds["mean"], (
                f"{backend}/{name}: mean err {err.mean():.2e}"
            )
            assert err.max() <= bounds["max"], (
                f"{backend}/{name}: max err {err.max():.2e}"
            )
            pooled_ref.append(ref_v)
            pooled_mine.append(mine)

    pooled_ref = np.concatenate(pooled_ref)
    pooled_mine = np.concatenate(pooled_mine)
    r = np.corrcoef(pooled_ref, pooled_mine)[0, 1]
    assert r >= 0.99999, f"{backend}: pooled Pearson R {r:.6f}"


@pytest.mark.parametrize("backend", _BFOV_BACKENDS)
def test_bfov_differential(ref, backend):
    _run_differential(ref, backend, box_version=4)


@pytest.mark.parametrize("backend", _RBFOV_BACKENDS)
def test_rbfov_differential(ref, backend):
    _run_differential(ref, backend, box_version=5)


# --------------------------------------------------------------------------- #
# Kent subsystem
# --------------------------------------------------------------------------- #
def _ref_deg2kent_canonical(ref, boxes_deg: np.ndarray) -> np.ndarray:
    """Reference deg2kent, remapped to the canonical layout.

    The reference emits columns [alpha, eta, psi, kappa, beta]
    (kent_formator.py:838) while its own KLD consumer unpacks
    [kappa, beta, alpha, psi, eta] (kent_iou_calculator.py:134) — the
    producer/consumer mismatch SURVEY.md documents. The canonical layout
    here IS the consumer's order, so only the reference's output needs the
    permutation.
    """
    out = ref.kent_formator.deg2kent(torch.from_numpy(boxes_deg.copy()))
    out = np.asarray(out.detach(), dtype=np.float64)
    return out[:, [3, 4, 0, 2, 1]]


def test_deg2kent_matches_reference(ref):
    n = min(N, 64)  # the reference loops per box on the host (~500 boxes/s)
    boxes = generate_boxes(n, 4, seed=7, fov_range=(5.0, 90.0))
    ref_k = _ref_deg2kent_canonical(ref, boxes)
    mine = np.asarray(
        __import__("sph_retina_tpu.iou.kent", fromlist=["deg2kent"]).deg2kent(
            jnp.asarray(boxes)
        ),
        dtype=np.float64,
    )
    # kappa/beta: relative agreement
    np.testing.assert_allclose(mine[:, 0], ref_k[:, 0], rtol=2e-3)
    np.testing.assert_allclose(mine[:, 1], ref_k[:, 1], rtol=2e-2, atol=1e-2)
    # mean direction gamma1 from (alpha, eta): dot product ~ 1
    from sph_retina_tpu.iou.kent import kent_angles_to_gammas

    g1m, _, _ = kent_angles_to_gammas(mine[:, 2], mine[:, 3], mine[:, 4])
    g1r, _, _ = kent_angles_to_gammas(ref_k[:, 2], ref_k[:, 3], ref_k[:, 4])
    dots = np.sum(np.asarray(g1m) * np.asarray(g1r), axis=-1)
    assert dots.min() > 1.0 - 1e-5, f"gamma1 misaligned: min dot {dots.min()}"


def test_kent_kld_matches_reference(ref):
    """My closed-form KLD vs the reference's, on identical canonical params.

    kappa capped below the reference's fp32-overflow regime (its
    c_approximation exponentiates kappa; mine uses analytic ratios), torch
    side run in float64.
    """
    rng = np.random.default_rng(3)
    n = min(N, 256)

    def params(r):
        kappa = r.uniform(2.0, 80.0, n)
        beta = kappa * r.uniform(0.0, 0.45, n)  # Kent validity: beta < kappa/2
        alpha = r.uniform(0.0, np.pi, n)
        psi = r.uniform(-np.pi, np.pi, n)
        eta = r.uniform(-np.pi, np.pi, n)
        return np.stack([kappa, beta, alpha, psi, eta], axis=1)

    ka = params(rng)
    kb = params(rng)

    ref_kld = np.asarray(
        ref.kent_iou_calculator.get_kld(
            torch.from_numpy(ka).double(), torch.from_numpy(kb).double()
        ).detach(),
        dtype=np.float64,
    )
    from sph_retina_tpu.iou.kent import kent_kld

    mine = np.asarray(
        kent_kld(jnp.asarray(ka[:, None, :]), jnp.asarray(kb[None, :, :])),
        dtype=np.float64,
    )
    if ref_kld.ndim == 1:  # reference broadcasting may collapse to aligned
        mine = np.diagonal(mine)
    assert mine.shape == ref_kld.shape
    denom = np.maximum(np.abs(ref_kld), 1.0)
    rel = np.abs(mine - ref_kld) / denom
    assert np.median(rel) < 5e-3, f"median rel err {np.median(rel):.2e}"
    assert np.quantile(rel, 0.95) < 5e-2, (
        f"p95 rel err {np.quantile(rel, 0.95):.2e}"
    )


def test_kent_iou_surrogate_matches_reference(ref):
    """End-to-end: box pair -> (each side's own deg2kent) -> KLD surrogate.

    Cross-implementation at the *pipeline* level: parameters come from each
    side's own moment estimation, so this bounds the compound drift a
    training run would see, not just one stage.
    """
    n = min(N, 48)
    b1 = generate_boxes(n, 4, seed=21, fov_range=(5.0, 90.0))
    b2 = b1.copy()
    rng = np.random.default_rng(22)
    b2[:, 0] = (b2[:, 0] + rng.uniform(-15, 15, n)) % 360
    b2[:, 1] = np.clip(b2[:, 1] + rng.uniform(-10, 10, n), 1, 179)

    ka = _ref_deg2kent_canonical(ref, b1)
    kb = _ref_deg2kent_canonical(ref, b2)
    ref_kld = np.asarray(
        ref.kent_iou_calculator.get_kld(
            torch.from_numpy(ka).double(), torch.from_numpy(kb).double()
        ).detach(),
        dtype=np.float64,
    )
    if ref_kld.ndim == 2:
        ref_kld = np.diagonal(ref_kld)
    ref_iou = 1.0 / (1.0 + np.sqrt(np.maximum(ref_kld, 0.0)))

    mine = np.asarray(
        sph_overlaps(jnp.asarray(b1), jnp.asarray(b2), "kent", is_aligned=True),
        dtype=np.float64,
    )
    err = np.abs(mine - ref_iou)
    assert err.mean() < 2e-2, f"mean err {err.mean():.2e}"
    r = np.corrcoef(mine, ref_iou)[0, 1]
    assert r > 0.999, f"Pearson R {r:.5f}"

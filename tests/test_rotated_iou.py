"""Rotated-rectangle IoU kernel: golden cases, an independent polygon-clipping
oracle, and gradient sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from sph_retina_tpu.iou.rotated import box_corners, rotated_box_iou

jit_iou = jax.jit(rotated_box_iou)


def test_golden_cases():
    """Values verified against the reference torch implementation
    (diff_iou_rotated_2d) and basic geometry."""
    cases = np.array(
        [
            [[0, 0, 1, 1, 0], [0, 0, 1, 1, 0]],          # identical
            [[0, 0, 1, 1, 0], [0.5, 0, 1, 1, 0]],        # half-offset
            [[0, 0, 1, 1, 0], [0, 0, 1, 1, np.pi / 4]],  # square vs diamond
            [[0, 0, 1, 1, 0], [2, 2, 1, 1, 0]],          # disjoint
            [[0, 0, 2, 2, 0], [0, 0, 1, 1, 0.3]],        # nested rotated
            [[0, 0, 1, 1, 0.2], [0.3, 0.1, 1.2, 0.8, -0.5]],
        ],
        dtype=np.float32,
    )
    expected = np.array([1.0, 1 / 3, 0.70710677, 0.0, 0.25, 0.45047675])
    got = np.asarray(jit_iou(jnp.asarray(cases[:, 0]), jnp.asarray(cases[:, 1])))
    np.testing.assert_allclose(got, expected, atol=2e-5)


def _clip_polygon_np(subject, clipper):
    """Sutherland–Hodgman convex clipping (independent numpy oracle)."""
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= 0

    def line_isect(p1, p2, a, b):
        d1 = p2 - p1
        d2 = b - a
        # p1 + t*d1 on the infinite line a->b:  t = cross(a-p1, d2)/cross(d1, d2)
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        t = ((a[0] - p1[0]) * d2[1] - (a[1] - p1[1]) * d2[0]) / denom
        return p1 + t * d1

    output = list(subject)
    for i in range(len(clipper)):
        a, b = clipper[i], clipper[(i + 1) % len(clipper)]
        input_list, output = output, []
        if not input_list:
            break
        s = input_list[-1]
        for e in input_list:
            if inside(e, a, b):
                if not inside(s, a, b):
                    output.append(line_isect(s, e, a, b))
                output.append(e)
            elif inside(s, a, b):
                output.append(line_isect(s, e, a, b))
            s = e
    if len(output) < 3:
        return 0.0
    poly = np.array(output)
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _ccw_corners(box):
    c = np.asarray(box_corners(jnp.asarray(box[None]))[0])
    # ensure counter-clockwise for the clipper
    area = 0.5 * np.sum(
        c[:, 0] * np.roll(c[:, 1], -1) - c[:, 1] * np.roll(c[:, 0], -1)
    )
    return c if area > 0 else c[::-1]


def test_against_clipping_oracle():
    rng = np.random.default_rng(42)
    n = 256
    b1 = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
         rng.uniform(0.2, 2, n), rng.uniform(0.2, 2, n), rng.uniform(-3, 3, n)],
        axis=1,
    ).astype(np.float32)
    b2 = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
         rng.uniform(0.2, 2, n), rng.uniform(0.2, 2, n), rng.uniform(-3, 3, n)],
        axis=1,
    ).astype(np.float32)
    got = np.asarray(jit_iou(jnp.asarray(b1), jnp.asarray(b2)))
    for i in range(n):
        inter = _clip_polygon_np(
            list(_ccw_corners(b1[i]).astype(np.float64)),
            list(_ccw_corners(b2[i]).astype(np.float64)),
        )
        union = b1[i, 2] * b1[i, 3] + b2[i, 2] * b2[i, 3] - inter
        np.testing.assert_allclose(got[i], inter / union, atol=2e-4)


def test_pairwise_broadcast_matches_aligned():
    rng = np.random.default_rng(7)
    b1 = jnp.asarray(rng.uniform(0.2, 1.5, (8, 5)).astype(np.float32))
    b2 = jnp.asarray(rng.uniform(0.2, 1.5, (8, 5)).astype(np.float32))
    aligned = jit_iou(b1, b2)
    pair = rotated_box_iou(b1[:, None, :], b2[None, :, :])
    np.testing.assert_allclose(
        np.asarray(jnp.diagonal(pair)), np.asarray(aligned), atol=1e-6
    )


def test_gradients_finite_and_useful():
    b1 = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.1]])
    b2 = jnp.array([[0.3, 0.2, 1.1, 0.9, -0.2]])

    def loss(x, y):
        return jnp.sum(1.0 - rotated_box_iou(x, y))

    g1, g2 = jax.grad(loss, argnums=(0, 1))(b1, b2)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()
    # moving box2 towards box1 should reduce the loss: d(loss)/d(cx2) > 0
    assert float(g2[0, 0]) > 0.0


def test_greens_matches_clip_on_generic_pairs():
    """Boundary-integral intersection == 2x-emit clip on generic (jittered-
    regime) rotated pairs, including the jit/FMA regression case where an
    empty parameter interval collapses far off-segment."""
    from sph_retina_tpu.iou.rotated import (
        intersection_greens_cs,
        rotated_box_iou,
    )

    rng = np.random.default_rng(7)
    n = 5000
    boxes = []
    for _ in range(2):
        cx, cy = rng.uniform(-2, 2, n), rng.uniform(-2, 2, n)
        w, h = rng.uniform(0.01, 3, n), rng.uniform(0.01, 3, n)
        a = rng.uniform(-np.pi, np.pi, n)
        boxes.append(np.stack([cx, cy, w, h, a], -1).astype(np.float32))
    b1, b2 = jnp.asarray(boxes[0]), jnp.asarray(boxes[1])

    def greens_iou(b1, b2):
        p = []
        for b in (b1, b2):
            p.append((b[..., 0], b[..., 1], b[..., 2], b[..., 3],
                      jnp.cos(b[..., 4]), jnp.sin(b[..., 4])))
        inter = intersection_greens_cs(p[0], p[1])
        a1 = jnp.abs(p[0][2] * p[0][3])
        a2 = jnp.abs(p[1][2] * p[1][3])
        return inter / (a1 + a2 - inter)

    got = np.asarray(jax.jit(greens_iou)(b1, b2))
    ref = np.asarray(jax.jit(rotated_box_iou)(b1, b2))
    np.testing.assert_allclose(got, ref, atol=5e-5)

    # FMA regression pair: disjoint, nearly antiparallel, interval collapse
    # at |t| ~ 1e4 (was +4.06 area under XLA FMA contraction).
    pb1 = jnp.asarray([[-1.06982483, 0.68967436, 2.23213795, 2.40592657,
                        2.71484095]], jnp.float32)
    pb2 = jnp.asarray([[0.36135001, -1.82813364, 0.64721464, 0.46627297,
                        0.42631972]], jnp.float32)
    assert float(jax.jit(greens_iou)(pb1, pb2)[0]) < 1e-5


def test_greens_containment_and_grad():
    from sph_retina_tpu.iou.rotated import intersection_greens_cs

    def inter_of(args):
        b1, b2 = args[:5], args[5:]
        p1 = (b1[0], b1[1], b1[2], b1[3], jnp.cos(b1[4]), jnp.sin(b1[4]))
        p2 = (b2[0], b2[1], b2[2], b2[3], jnp.cos(b2[4]), jnp.sin(b2[4]))
        return intersection_greens_cs(p1, p2)

    args = jnp.asarray([0.0, 0.0, 1.0, 1.0, 0.0,   # P unit square
                        0.1, 0.0, 3.0, 3.0, 0.3])  # Q big rotated
    assert abs(float(inter_of(args)) - 1.0) < 1e-6  # P inside Q
    g = jax.grad(inter_of)(args)
    assert np.isfinite(np.asarray(g)).all()
    # d(inter)/d(w_P) = h_P = 1 when P fully inside Q
    assert abs(float(g[2]) - 1.0) < 1e-5


def test_collinear_pairs_safe_through_public_entries():
    """Greens double-count invariant (VERDICT r2 weak item 5): pairs sharing
    bitwise-collinear boundary runs — identical boxes, touching grid cells,
    pi-offset duplicates — must come out with inter <= min(area) through
    every public spherical entry. The fused pipeline enforces this with an
    explicit min-area bound (ops/fused_iou.py) on top of the jitter; this
    test generates the adversarial inputs and checks IoU stays in [0, 1]
    with identical pairs ~1 and edge-touching neighbours ~0."""
    import itertools

    from sph_retina_tpu.ops import (
        sph2pob_iou_aligned_tpu,
        sph2pob_iou_pairwise_tpu,
    )
    from sph_retina_tpu.ops.fused_iou import fused_sph2pob_iou

    rng = np.random.default_rng(11)
    n = 256
    base = np.stack([
        rng.uniform(5, 355, n), rng.uniform(5, 175, n),
        rng.uniform(5, 90, n), rng.uniform(5, 90, n),
    ], -1).astype(np.float32)

    # stratum 1: bitwise-identical pairs
    ident = np.asarray(sph2pob_iou_aligned_tpu(jnp.asarray(base),
                                               jnp.asarray(base)))
    assert np.all(ident >= 0.0) and np.all(ident <= 1.0)
    assert np.all(ident > 0.95)

    # stratum 2: grid-adjacent boxes sharing one exact boundary meridian
    theta = np.float32(90.0)
    a = np.array([[theta - 10.0, 90.0, 20.0, 20.0]], np.float32)
    b = np.array([[theta + 10.0, 90.0, 20.0, 20.0]], np.float32)
    adj = float(sph2pob_iou_aligned_tpu(jnp.asarray(a), jnp.asarray(b))[0])
    assert 0.0 <= adj < 0.05

    # stratum 3: pairwise kernel on a grid of touching cells (every pair of
    # rows shares a boundary with some neighbour)
    cells = np.array([[t, p, 30.0, 30.0]
                      for t, p in itertools.product(
                          np.arange(30.0, 180.0, 30.0),
                          np.arange(45.0, 135.0, 30.0))], np.float32)
    mat = np.asarray(sph2pob_iou_pairwise_tpu(jnp.asarray(cells),
                                              jnp.asarray(cells)))
    assert np.all(mat >= 0.0) and np.all(mat <= 1.0)
    assert np.all(np.diag(mat) > 0.95)

    # stratum 4: the fused componentwise path under grad on identical pairs
    comp = [jnp.asarray(base[:8, i]) for i in range(4)]
    g = jax.grad(lambda c: jnp.sum(fused_sph2pob_iou(c, comp)))(comp)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)

"""Anchor-shape optimization on a dataset's GT boxes.

Spherical counterpart of the reference's anchor optimizer
(/root/reference/tools/analysis_tools/optimize_anchors.py): there, YOLO
(w, h) anchors are fit to dataset boxes with k-means under an IoU distance
or scipy differential evolution maximizing the average best overlap. Here
the free parameters are spherical FoV pairs (alpha, beta) in degrees —
resolution-independent, so no input-shape rescaling step exists — and the
overlap is a real spherical IoU backend evaluated with both boxes centered
at the equator (theta=180, phi=90), matching the reference's zero-centered
comparison (its ``get_zero_center_bbox_tensor``).

Both optimizers are device-resident: the k-means E/M steps and the whole
differential-evolution population loop are jitted, with the N_gt x K IoU
matrix going through the fused sph2pob kernel.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..iou import sph_overlaps

_CENTER = (180.0, 90.0)  # equator: IoU of centered boxes depends on FoVs only


def centered_boxes(fovs: jnp.ndarray) -> jnp.ndarray:
    """(K, 2) (alpha, beta) FoVs -> (K, 4) BFoV boxes centered on the equator."""
    fovs = jnp.asarray(fovs, jnp.float32)
    center = jnp.broadcast_to(jnp.asarray(_CENTER, jnp.float32),
                              (*fovs.shape[:-1], 2))
    return jnp.concatenate([center, fovs], axis=-1)


@functools.partial(jax.jit, static_argnames=("backend",))
def _best_iou(gt_fovs, anchor_fovs, backend="sph2pob_efficient"):
    """(N,) best IoU of each GT FoV against the anchor set."""
    iou = sph_overlaps(centered_boxes(gt_fovs), centered_boxes(anchor_fovs),
                       backend)
    return jnp.max(iou, axis=1)


def mean_best_iou(gt_fovs, anchor_fovs, backend: str = "sph2pob_efficient"):
    """Average best-anchor IoU over the dataset — the objective both
    optimizers maximize and the number ``avg_iou`` the reference logs."""
    return float(jnp.mean(_best_iou(jnp.asarray(gt_fovs, jnp.float32),
                                    jnp.asarray(anchor_fovs, jnp.float32),
                                    backend)))


def kmeans_anchors(
    gt_fovs: np.ndarray,
    num_anchors: int,
    iters: int = 25,
    seed: int = 0,
    backend: str = "sph2pob_efficient",
) -> np.ndarray:
    """IoU-distance k-means over (alpha, beta) FoVs.

    E-step assigns each GT to argmax-IoU center; M-step recenters on the
    assigned mean — the reference's ``kmeans_expectation`` /
    ``kmeans_maximization`` loop with the spherical kernel as the metric.
    Fixed ``iters`` sweeps (converged assignments make further sweeps
    no-ops, so a fixed count is jit-friendly and deterministic).
    """
    gt = jnp.asarray(gt_fovs, jnp.float32)
    n = gt.shape[0]
    if n < num_anchors:
        raise ValueError(f"{n} GT boxes < {num_anchors} anchors")
    init_idx = jax.random.choice(jax.random.PRNGKey(seed), n,
                                 (num_anchors,), replace=False)

    @functools.partial(jax.jit, static_argnames=("backend",))
    def run(gt, init_idx, backend=backend):
        def sweep(_, centers):
            iou = sph_overlaps(centered_boxes(gt), centered_boxes(centers),
                               backend)
            assign = jnp.argmax(iou, axis=1)                    # (N,)
            one_hot = jax.nn.one_hot(assign, num_anchors, dtype=gt.dtype)
            count = one_hot.sum(axis=0)                          # (K,)
            sums = one_hot.T @ gt                                # (K, 2)
            new = sums / jnp.maximum(count, 1.0)[:, None]
            # empty clusters keep their previous center
            return jnp.where(count[:, None] > 0, new, centers)

        return jax.lax.fori_loop(0, iters, sweep, gt[init_idx])

    centers = np.asarray(run(gt, init_idx))
    return centers[np.argsort(centers.prod(axis=1))]


def evolve_anchors(
    gt_fovs: np.ndarray,
    num_anchors: int,
    iters: int = 200,
    pop_size: int = 48,
    seed: int = 0,
    bounds: tuple = (1.0, 179.0),
    mutation: float = 0.5,
    crossover: float = 0.9,
    backend: str = "sph2pob_efficient",
) -> np.ndarray:
    """Differential evolution (rand/1/bin) over K (alpha, beta) pairs.

    Replaces the reference's scipy ``differential_evolution`` with a fully
    vectorized device-resident loop: the whole population's fitness is one
    (P*K, N) IoU matrix per generation through the fused kernel.
    """
    gt = jnp.asarray(gt_fovs, jnp.float32)
    dim = num_anchors * 2
    lo, hi = bounds

    def fitness(pop):                                   # (P, dim) -> (P,)
        fovs = pop.reshape(-1, 2)                       # (P*K, 2)
        iou = sph_overlaps(centered_boxes(gt), centered_boxes(fovs), backend)
        per = iou.reshape(gt.shape[0], -1, num_anchors)  # (N, P, K)
        return jnp.mean(jnp.max(per, axis=2), axis=0)    # (P,)

    @jax.jit
    def run(key):
        key, k0 = jax.random.split(key)
        pop = jax.random.uniform(k0, (pop_size, dim), minval=lo, maxval=hi)
        fit = fitness(pop)

        def gen(_, carry):
            key, pop, fit = carry
            key, k1, k2, k3 = jax.random.split(key, 4)
            # rand/1/bin donors: three *distinct* indices, none equal to the
            # target (scipy differential_evolution semantics). Permute
            # 0..P-2 per row, take 3, then shift past the row's own index.
            perm = jax.vmap(
                lambda k: jax.random.permutation(k, pop_size - 1)[:3])(
                jax.random.split(k1, pop_size))          # (P, 3) in 0..P-2
            idx = perm + (perm >= jnp.arange(pop_size)[:, None])
            a, b, c = pop[idx[:, 0]], pop[idx[:, 1]], pop[idx[:, 2]]
            mutant = jnp.clip(a + mutation * (b - c), lo, hi)
            cross = jax.random.uniform(k2, (pop_size, dim)) < crossover
            # guarantee >= 1 mutated coordinate per individual
            forced = jax.nn.one_hot(
                jax.random.randint(k3, (pop_size,), 0, dim), dim) > 0
            trial = jnp.where(cross | forced, mutant, pop)
            tfit = fitness(trial)
            better = tfit > fit
            return (key,
                    jnp.where(better[:, None], trial, pop),
                    jnp.where(better, tfit, fit))

        key, pop, fit = jax.lax.fori_loop(0, iters, gen, (key, pop, fit))
        return pop[jnp.argmax(fit)], jnp.max(fit)

    best, _ = run(jax.random.PRNGKey(seed))
    anchors = np.asarray(best).reshape(num_anchors, 2)
    return anchors[np.argsort(anchors.prod(axis=1))]

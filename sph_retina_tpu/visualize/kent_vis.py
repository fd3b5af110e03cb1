"""Kent-distribution visualization.

Counterpart of the reference's root script ``vis_kent_samples.py``, which
scatter-plots *approximate* Kent samples on a 3-D sphere (a hand-rolled 3-D
Gaussian projected to the sphere, with arbitrary minor axes — it ignores the
distribution's actual orientation). The TPU-native spin here:

- the **exact density** rasterized on the ERP lat-long grid the rest of the
  framework lives on (``kent_density_erp``), quadrature-normalized so values
  integrate to 1 over the sphere;
- a **tangent-space sampler** (``sample_kent``) using the large-kappa
  Gaussian limit of the Kent density — exp(-(kappa/2-beta)u^2
  -(kappa/2+beta)v^2) in the (gamma2, gamma3) tangent plane — which honors
  the full (alpha, psi, eta) frame the reference script drops.

Canonical parameter layout throughout: ``(kappa, beta, alpha, psi, eta)``
(the framework-wide convention from ``iou/kent.py``; the reference's
producer/consumer layout mismatch is documented in SURVEY.md §7).

Sphere <-> ERP convention matches ``iou/kent.py:_sample_box_points``:
``X = (-cos(phi), sin(phi) cos(theta), sin(phi) sin(theta))`` with theta in
[0, 360) and phi in [0, 180) degrees.
"""

from __future__ import annotations

import numpy as np


def kent_angles_to_gammas(alpha, psi, eta):
    """(alpha, psi, eta) -> (gamma1, gamma2, gamma3) orthonormal frame.

    numpy twin of ``iou/kent.py:kent_angles_to_gammas`` (property-tested
    against it) so the visualize package stays numpy-only — importing it
    must never pull in jax or risk initializing a device backend.
    """
    ca, sa = np.cos(alpha), np.sin(alpha)
    cp, sp = np.cos(psi), np.sin(psi)
    ce, se = np.cos(eta), np.sin(eta)
    g1 = np.stack([ca, sa * ce, sa * se], axis=-1)
    g2 = np.stack(
        [-cp * sa, cp * ca * ce - sp * se, cp * ca * se + sp * ce], axis=-1
    )
    g3 = np.stack(
        [sp * sa, -sp * ca * ce - cp * se, -sp * ca * se + cp * ce], axis=-1
    )
    return g1, g2, g3


def erp_grid_directions(img_size=(256, 512)):
    """Unit directions of every ERP pixel center -> (H, W, 3) float32."""
    h, w = img_size
    theta = (np.arange(w, dtype=np.float32) + 0.5) * (2.0 * np.pi / w)
    phi = (np.arange(h, dtype=np.float32) + 0.5) * (np.pi / h)
    tt, pp = np.meshgrid(theta, phi)  # (H, W)
    return np.stack(
        [-np.cos(pp), np.sin(pp) * np.cos(tt), np.sin(pp) * np.sin(tt)],
        axis=-1,
    )


def directions_to_erp_deg(x):
    """(..., 3) unit directions -> (theta_deg, phi_deg) on the ERP chart."""
    x = np.asarray(x)
    phi = np.degrees(np.arccos(np.clip(-x[..., 0], -1.0, 1.0)))
    theta = np.degrees(np.arctan2(x[..., 2], x[..., 1])) % 360.0
    return theta, phi


def kent_density_erp(params, img_size=(256, 512), normalize=True):
    """Exact Kent density on the ERP grid -> (H, W) float64.

    ``params``: (5,) canonical ``(kappa, beta, alpha, psi, eta)``.
    ``normalize=True`` divides by the sphere quadrature (pixel solid angle
    sin(phi) dtheta dphi) so the raster integrates to ~1; otherwise the
    density is scaled to max 1 for display. Computed in log space so large
    kappa cannot overflow.
    """
    params = np.asarray(params, np.float64).reshape(5)
    kappa, beta = params[0], params[1]
    g1, g2, g3 = (np.asarray(g, np.float64).reshape(3)
                  for g in kent_angles_to_gammas(*params[2:5]))
    x = erp_grid_directions(img_size).astype(np.float64)  # (H, W, 3)
    log_f = (kappa * (x @ g1)
             + beta * ((x @ g2) ** 2 - (x @ g3) ** 2))
    log_f -= log_f.max()  # overflow-safe; constant factor drops in both modes
    f = np.exp(log_f)
    if not normalize:
        return f
    h, w = img_size
    phi = (np.arange(h, dtype=np.float64) + 0.5) * (np.pi / h)
    d_omega = np.sin(phi)[:, None] * (2.0 * np.pi / w) * (np.pi / h)
    return f / np.sum(f * d_omega)


def sample_kent(params, n=1000, seed=0):
    """~Kent samples -> (n, 3) unit vectors (large-kappa tangent Gaussian).

    In the tangent plane at gamma1, the Kent density is asymptotically
    N(0, diag(1/(kappa-2*beta), 1/(kappa+2*beta))) along (gamma2, gamma3);
    samples are lifted back to the sphere by normalization. Replaces the
    reference's ad-hoc 3-D Gaussian (vis_kent_samples.py:6-29), which used
    arbitrary axes for the beta anisotropy.
    """
    params = np.asarray(params, np.float64).reshape(5)
    kappa, beta = params[0], params[1]
    g1, g2, g3 = (np.asarray(g, np.float64).reshape(3)
                  for g in kent_angles_to_gammas(*params[2:5]))
    var_u = 1.0 / max(kappa - 2.0 * beta, 1e-6)
    var_v = 1.0 / max(kappa + 2.0 * beta, 1e-6)
    rng = np.random.default_rng(seed)
    u = rng.normal(0.0, np.sqrt(var_u), size=n)
    v = rng.normal(0.0, np.sqrt(var_v), size=n)
    x = g1[None, :] + u[:, None] * g2[None, :] + v[:, None] * g3[None, :]
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def plot_kent_density(params, img_size=(256, 512), samples=0, seed=0,
                      image=None, out_file=None, title=None):
    """Render the density heatmap on the ERP chart (+ optional samples).

    ``image``: optional (H, W, 3) uint8 ERP background to overlay on.
    Returns the matplotlib figure (saved and closed when ``out_file``).
    """
    import matplotlib

    if out_file is not None:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    f = kent_density_erp(params, img_size, normalize=False)
    fig, ax = plt.subplots(figsize=(10, 5))
    extent = (0, 360, 180, 0)  # theta right, phi down — ERP image layout
    if image is not None:
        ax.imshow(image, extent=extent)
        ax.imshow(f, cmap="inferno", alpha=0.55, extent=extent)
    else:
        ax.imshow(f, cmap="inferno", extent=extent)
    if samples:
        th, ph = directions_to_erp_deg(sample_kent(params, samples, seed))
        ax.scatter(th, ph, s=4, c="cyan", alpha=0.6, linewidths=0)
    ax.set_xlabel("theta (deg)")
    ax.set_ylabel("phi (deg)")
    ax.set_title(title or
                 "Kent density  kappa={:.3g} beta={:.3g}".format(*params[:2]))
    if out_file is not None:
        fig.savefig(out_file, bbox_inches="tight", dpi=120)
        plt.close(fig)
    return fig

"""Perspective (tangent-plane / gnomonic) camera over ERP images.

Capability parity with the reference's perspective-camera visualizer
(/root/reference/sphdet/visualizers/ImageRecorder.py:9-216 and the border
rotation in ImageRecoderTools.py): extract a pinhole view of an ERP
panorama looking at a given spherical direction, rasterize the border of a
BFoV/RBFoV box (which is exactly the image border of a camera whose FoV is
the box) onto the ERP frame, and compute seam-aware planar enclosing boxes.

Design differences from the reference (this is a re-derivation, not a port):

- one orthonormal-frame formulation (look/right/up from the chenbin angles)
  instead of the reference's chained arctan branch fixups
  (ImageRecorder.py:88-124) — the atan2/arccos pair is branchless and exact
  on the full sphere;
- vectorized numpy bilinear sampling with longitude wrap instead of a
  per-channel scipy ``RegularGridInterpolator`` (ImageRecorder.py:126-149);
- RBFoV handled by rotating the tangent-plane coordinates in-plane by gamma
  (equivalent to the reference's Rodrigues rotation of sampled border points
  in ``ImageRecoderTools.ro_Shpbbox``).

Angle convention is the chenbin degree format used framework-wide:
theta in [0, 360) longitude, phi in [0, 180) colatitude
(/root/reference/sphdet/bbox/box_formator.py:119-127).
"""

from __future__ import annotations

import numpy as np


def _unit_frame(theta: float, phi: float):
    """Orthonormal (look, right, up) for chenbin angles in radians."""
    st, ct, sp, cp = np.sin(theta), np.cos(theta), np.sin(phi), np.cos(phi)
    look = np.array([sp * ct, sp * st, cp])
    right = np.array([-st, ct, 0.0])
    up = np.array([-cp * ct, -cp * st, sp])
    return look, right, up


def _dirs_to_erp_px(dirs: np.ndarray, erp_w: int, erp_h: int) -> np.ndarray:
    """Unit direction vectors (..., 3) -> ERP pixel coords (..., 2)."""
    theta = np.mod(np.arctan2(dirs[..., 1], dirs[..., 0]), 2 * np.pi)
    phi = np.arccos(np.clip(dirs[..., 2], -1.0, 1.0))
    u = theta / (2 * np.pi) * erp_w
    v = phi / np.pi * erp_h
    return np.stack([u, v], axis=-1)


class PerspectiveCamera:
    """Pinhole camera with fixed FoVs over an ERP panorama.

    Mirrors the reference ``ImageRecorder(sphereW, sphereH, view_angle_w,
    view_angle_h, long_side)`` sizing rule: the larger-FoV image side gets
    ``long_side`` pixels, the other side scales by the tangent ratio
    (ImageRecorder.py:27-34).
    """

    def __init__(self, erp_w: int, erp_h: int, fov_w: float = 64.0,
                 fov_h: float = 64.0, long_side: int = 640):
        self.erp_w, self.erp_h = int(erp_w), int(erp_h)
        self.fov_w, self.fov_h = float(fov_w), float(fov_h)
        tw = np.tan(np.deg2rad(fov_w) / 2)
        th = np.tan(np.deg2rad(fov_h) / 2)
        if fov_w >= fov_h:
            self.img_w = int(long_side)
            self.img_h = max(int(round(long_side * th / tw)), 1)
        else:
            self.img_h = int(long_side)
            self.img_w = max(int(round(long_side * tw / th)), 1)
        # Tangent-plane sample grid at pixel centers.
        xs = (np.arange(self.img_w) + 0.5) / self.img_w * 2 - 1  # [-1, 1)
        ys = (np.arange(self.img_h) + 0.5) / self.img_h * 2 - 1
        self._tx = xs * tw
        self._ty = ys * th

    # ------------------------------------------------------------- extract
    def view_directions(self, theta_deg: float, phi_deg: float) -> np.ndarray:
        """(img_h, img_w, 3) unit directions of the view at the given center."""
        look, right, up = _unit_frame(np.deg2rad(theta_deg),
                                      np.deg2rad(phi_deg))
        tx = self._tx[None, :, None]
        ty = self._ty[:, None, None]
        d = look + tx * right - ty * up  # image v grows downward
        return d / np.linalg.norm(d, axis=-1, keepdims=True)

    def extract(self, image: np.ndarray, theta_deg: float,
                phi_deg: float) -> np.ndarray:
        """Perspective view of the ERP image at (theta, phi) degrees.

        Equivalent of ``ImageRecorder.catch`` (ImageRecorder.py:71-74):
        bilinear sampling, longitude-wrapped at the seam, latitude clamped
        at the poles. Returns (img_h, img_w, C) with the input dtype.
        """
        image = np.asarray(image)
        squeeze = image.ndim == 2
        if squeeze:
            image = image[..., None]
        h, w = image.shape[:2]
        px = _dirs_to_erp_px(self.view_directions(theta_deg, phi_deg), w, h)
        u, v = px[..., 0] - 0.5, px[..., 1] - 0.5
        u0 = np.floor(u).astype(np.int64)
        v0 = np.floor(v).astype(np.int64)
        fu = (u - u0)[..., None]
        fv = (v - v0)[..., None]
        u0w, u1w = u0 % w, (u0 + 1) % w               # seam wrap
        v0c = np.clip(v0, 0, h - 1)
        v1c = np.clip(v0 + 1, 0, h - 1)               # pole clamp
        img = image.astype(np.float64)
        out = (img[v0c, u0w] * (1 - fu) * (1 - fv)
               + img[v0c, u1w] * fu * (1 - fv)
               + img[v1c, u0w] * (1 - fu) * fv
               + img[v1c, u1w] * fu * fv)
        if np.issubdtype(image.dtype, np.integer):
            out = np.clip(np.round(out), np.iinfo(image.dtype).min,
                          np.iinfo(image.dtype).max)
        out = out.astype(image.dtype)
        return out[..., 0] if squeeze else out

    # ------------------------------------------------------ box rasterizing
    def box_border_px(self, box_deg, samples_per_edge: int = 64) -> np.ndarray:
        """ERP pixel coords of a BFoV/RBFoV box border through the camera.

        The border of a spherical box (theta, phi, alpha, beta[, gamma]) is
        the image border of a pinhole camera looking at (theta, phi) with
        FoVs (alpha, beta), rolled by gamma — the reference samples exactly
        these points (``_sample_points(border_only=True)``,
        ImageRecorder.py:76-98). Returns (4 * samples_per_edge, 2).
        """
        box = np.asarray(box_deg, np.float64)
        look, right, up = _unit_frame(np.deg2rad(box[0]), np.deg2rad(box[1]))
        hx = np.tan(np.deg2rad(box[2]) / 2)
        hy = np.tan(np.deg2rad(box[3]) / 2)
        t = np.linspace(-1.0, 1.0, samples_per_edge, endpoint=False)
        one = np.ones_like(t)
        # CCW border of the tangent rectangle.
        x = np.concatenate([t, one, -t, -one]) * hx
        y = np.concatenate([-one, t, one, -t]) * hy
        if box.shape[0] == 5:
            g = np.deg2rad(box[4])
            cg, sg = np.cos(g), np.sin(g)
            x, y = x * cg - y * sg, x * sg + y * cg
        d = (look[None, :] + x[:, None] * right[None, :]
             + y[:, None] * up[None, :])
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return _dirs_to_erp_px(d, self.erp_w, self.erp_h)

    def draw_box(self, image: np.ndarray, box_deg, color=(255, 0, 0),
                 thickness: int = 2, samples_per_edge: int = 64) -> np.ndarray:
        """Rasterize a box border onto an ERP frame (``draw_Sphbbox``
        analogue, ImageRecorder.py:176-188). Seam-aware polyline drawing."""
        from PIL import Image, ImageDraw

        img = Image.fromarray(np.ascontiguousarray(image.astype(np.uint8)))
        draw = ImageDraw.Draw(img)
        px = self.box_border_px(box_deg, samples_per_edge)
        px = np.concatenate([px, px[:1]])  # close the loop
        start = 0
        for k in range(1, len(px)):
            if abs(px[k, 0] - px[k - 1, 0]) > self.erp_w / 2:
                if k - start >= 2:
                    draw.line([tuple(p) for p in px[start:k]],
                              fill=tuple(color), width=thickness)
                start = k
        if len(px) - start >= 2:
            draw.line([tuple(p) for p in px[start:]],
                      fill=tuple(color), width=thickness)
        return np.asarray(img)

    def planar_bbox(self, box_deg, samples_per_edge: int = 64) -> np.ndarray:
        """Seam-aware planar xyxy enclosing the box border on the ERP frame.

        ``ImageRecorder.boxinfo`` semantics (ImageRecorder.py:190-216): if
        the border wraps the theta seam, the wider of the two pixel clusters
        is reported.
        """
        px = self.box_border_px(box_deg, samples_per_edge)
        u, v = px[:, 0], px[:, 1]
        ymin, ymax = float(v.min()), float(v.max())
        if u.max() - u.min() < self.erp_w / 2:
            return np.array([u.min(), ymin, u.max(), ymax])
        left = u[u < self.erp_w / 2]
        right = u[u >= self.erp_w / 2]
        w_left = left.max() - left.min() if left.size else -1.0
        w_right = right.max() - right.min() if right.size else -1.0
        side = left if w_left >= w_right else right
        return np.array([side.min(), ymin, side.max(), ymax])

"""H36M camera model: batched projection / undistortion / frame changes.

Replaces the reference's host-numpy ``lib/utils/prep_h36m.py`` (una-dinosauria
``cameras.py`` lineage via integral-human-pose — SURVEY.md §2.A [M]) with
vmappable jnp. Distortion model: radial (k1,k2,k3) + tangential (p1,p2),
identical formulas to ``project_point_radial``.

Conventions:
- World->camera: ``X_cam = R @ (X_world - T)`` (R: world-to-cam rotation,
  T: camera center in world coords) — matches the H36M release.
- Intrinsics: focal ``f=(fx,fy)``, principal point ``c=(cx,cy)``.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
from functools import partial

# Geometry is numerically sensitive and computationally tiny: never let
# XLA drop these contractions to bf16 on the MXU (accuracy collapses from
# ~1e-6 to ~1e-2 at pixel scales).
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)



@flax.struct.dataclass
class Camera:
    """Pytree of per-camera parameters; every field broadcasts batch dims.

    R: (..., 3, 3) world->cam rotation; T: (..., 3) cam center (world);
    f: (..., 2); c: (..., 2); k: (..., 3) radial; p: (..., 2) tangential.
    """

    R: jnp.ndarray
    T: jnp.ndarray
    f: jnp.ndarray
    c: jnp.ndarray
    k: jnp.ndarray
    p: jnp.ndarray

    @property
    def K(self) -> jnp.ndarray:
        """(..., 3, 3) intrinsic matrix."""
        fx, fy = self.f[..., 0], self.f[..., 1]
        cx, cy = self.c[..., 0], self.c[..., 1]
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        K = jnp.stack([
            jnp.stack([fx, z, cx], axis=-1),
            jnp.stack([z, fy, cy], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ], axis=-2)
        return K

    @property
    def P(self) -> jnp.ndarray:
        """(..., 3, 4) projection matrix K [R | -R T] (pinhole part only)."""
        Rt = jnp.concatenate(
            [self.R, -_einsum("...ij,...j->...i", self.R, self.T)[..., None]],
            axis=-1)
        return _einsum("...ij,...jk->...ik", self.K, Rt)

    @staticmethod
    def identity(batch_shape=()) -> "Camera":
        bs = tuple(batch_shape)
        return Camera(
            R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), bs + (3, 3)),
            T=jnp.zeros(bs + (3,), jnp.float32),
            f=jnp.ones(bs + (2,), jnp.float32),
            c=jnp.zeros(bs + (2,), jnp.float32),
            k=jnp.zeros(bs + (3,), jnp.float32),
            p=jnp.zeros(bs + (2,), jnp.float32),
        )


def world_to_camera_frame(P_world, cam: Camera):
    """(..., N, 3) world points -> camera frame (reference CamProj-style)."""
    return _einsum("...ij,...nj->...ni", cam.R,
                      P_world - cam.T[..., None, :])


def camera_to_world_frame(P_cam, cam: Camera):
    """Inverse of :func:`world_to_camera_frame`."""
    return _einsum("...ji,...nj->...ni", cam.R, P_cam) + cam.T[..., None, :]


def _distort(XX, k, p):
    """Apply radial+tangential distortion to normalized coords (..., N, 2)."""
    x, y = XX[..., 0], XX[..., 1]
    r2 = x * x + y * y
    radial = (1.0
              + k[..., 0:1] * r2
              + k[..., 1:2] * r2 * r2
              + k[..., 2:3] * r2 * r2 * r2)
    # reference: tan = p1*y + p2*x ; extra term outer([p2, p1], r2)
    tan = p[..., 0:1] * y + p[..., 1:2] * x
    x_d = x * (radial + tan) + p[..., 1:2] * r2
    y_d = y * (radial + tan) + p[..., 0:1] * r2
    return jnp.stack([x_d, y_d], axis=-1)


def project_point_radial(P_world, cam: Camera):
    """World points -> distorted pixel coords + depth.

    Mirrors reference ``project_point_radial`` (prep_h36m.py [M]).
    ``P_world``: (..., N, 3). Returns (pixels (..., N, 2), depth (..., N)).
    """
    X = world_to_camera_frame(P_world, cam)
    d = X[..., 2]
    XX = X[..., :2] / d[..., None]
    XXX = _distort(XX, cam.k, cam.p)
    proj = cam.f[..., None, :] * XXX + cam.c[..., None, :]
    return proj, d


def undistort_points(pixels, cam: Camera, iters: int = 5):
    """Distorted pixels -> ideal (pinhole) pixels, fixed-point inversion.

    The reference undistorts teacher 2D detections before DLT (SURVEY §3.2).
    Fixed-point: x_{n+1} = x_obs_normalized 'un-distorted' by re-evaluating
    the distortion at the current estimate; converges in ~5 iters for H36M
    distortion magnitudes. Fully batched, jit/vmap-safe (lax-free static loop).
    """
    obs = (pixels - cam.c[..., None, :]) / cam.f[..., None, :]
    x = obs
    for _ in range(iters):
        # invert: distorted = x*(radial+tan) + q*r2  =>
        # x = (obs - q*r2) / (radial + tan), evaluated at current x
        xx, yy = x[..., 0], x[..., 1]
        r2 = xx * xx + yy * yy
        radial = (1.0 + cam.k[..., 0:1] * r2 + cam.k[..., 1:2] * r2 * r2
                  + cam.k[..., 2:3] * r2 * r2 * r2)
        tan = cam.p[..., 0:1] * yy + cam.p[..., 1:2] * xx
        qx = cam.p[..., 1:2] * r2
        qy = cam.p[..., 0:1] * r2
        x = jnp.stack([
            (obs[..., 0] - qx) / (radial + tan),
            (obs[..., 1] - qy) / (radial + tan),
        ], axis=-1)
    return x * cam.f[..., None, :] + cam.c[..., None, :]


def normalized_camera_coords(pixels, cam: Camera):
    """Pixels -> normalized (K^-1) coords, no distortion handling."""
    return (pixels - cam.c[..., None, :]) / cam.f[..., None, :]


def pixel2cam(pixels, depth, cam: Camera):
    """Back-project pixels + absolute depth -> camera-frame 3D points.

    The integral-pose evaluation protocol (reference validate path,
    SURVEY §3.4 [M]): predicted (x, y) in IDEAL (undistorted) source-image
    pixels and absolute camera-frame depth are lifted to camera-frame mm
    via X = (u - cx)/fx * Z, Y = (v - cy)/fy * Z.

    pixels: (..., N, 2); depth: (..., N) absolute camera-frame Z (mm).
    Returns (..., N, 3).
    """
    xy = normalized_camera_coords(pixels, cam) * depth[..., None]
    return jnp.concatenate([xy, depth[..., None]], axis=-1)

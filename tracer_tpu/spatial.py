"""Host-side spatial geometry helpers: rotations and homogeneous transforms.

These run at scene-construction time (NumPy, not traced). Capability parity
with the reference's ``tracer/spatial_geometry.py`` (rotation generators,
frame composition); the implementation is original.
"""
from __future__ import annotations

import numpy as np


def general_axis_rotation(axis, ang: float) -> np.ndarray:
    """Rodrigues rotation matrix: rotate by ``ang`` (rad, right-hand rule)
    about the unit vector ``axis``. Returns a (3,3) array.
    """
    axis = np.asarray(axis, dtype=float)
    s, c = np.sin(ang), np.cos(ang)
    # Round like the reference does so that e.g. pi/2 gives exact zeros.
    s = np.round(s, decimals=14)
    c = np.round(c, decimals=14)
    K = np.array([
        [0.0, -axis[2], axis[1]],
        [axis[2], 0.0, -axis[0]],
        [-axis[1], axis[0], 0.0],
    ])
    return np.outer(axis, axis) * (1.0 - c) + np.eye(3) * c + K * s


def rotation_to_z(vecs) -> np.ndarray:
    """Rotation matrix (or stack of them) whose local Z axis is ``vecs``.

    The new X is chosen to lie in the original XY plane; if ``vecs`` is the
    Z axis itself the identity frame is kept. Accepts (3,) or (n,3); returns
    (3,3) or (n,3,3). Matches reference semantics
    (tracer/spatial_geometry.py:24).
    """
    v = np.atleast_2d(np.asarray(vecs, dtype=float))
    perp = np.stack([v[:, 1], -v[:, 0], np.zeros(v.shape[0])], axis=1)
    degenerate = np.all(perp == 0.0, axis=1)
    perp[degenerate] = np.array([1.0, 0.0, 0.0])
    perp /= np.linalg.norm(perp, axis=1, keepdims=True)
    mats = np.stack([perp, np.cross(v, perp), v], axis=2)
    return np.squeeze(mats)


def generate_transform(axis, angle: float, translation) -> np.ndarray:
    """Homogeneous 4x4 transform: rotation about ``axis`` by ``angle`` plus a
    translation (3-vector or (3,1) column).
    """
    rot = general_axis_rotation(axis, angle)
    t = np.asarray(translation, dtype=float).reshape(3, 1)
    return np.vstack((np.hstack((rot, t)), np.array([[0.0, 0.0, 0.0, 1.0]])))


def _homog(rot: np.ndarray) -> np.ndarray:
    out = np.eye(4)
    out[:3, :3] = rot
    return out


def rotx(ang: float) -> np.ndarray:
    """4x4 homogeneous rotation about the X axis."""
    return _homog(general_axis_rotation([1.0, 0.0, 0.0], ang))


def roty(ang: float) -> np.ndarray:
    """4x4 homogeneous rotation about the Y axis."""
    return _homog(general_axis_rotation([0.0, 1.0, 0.0], ang))


def rotz(ang: float) -> np.ndarray:
    """4x4 homogeneous rotation about the Z axis."""
    return _homog(general_axis_rotation([0.0, 0.0, 1.0], ang))


def translate(x: float = 0.0, y: float = 0.0, z: float = 0.0) -> np.ndarray:
    """4x4 homogeneous translation."""
    out = np.eye(4)
    out[:3, 3] = [x, y, z]
    return out


def invert_transform(frame: np.ndarray) -> np.ndarray:
    """Exact inverse of a rigid homogeneous transform (R, t) -> (R^T, -R^T t)."""
    rot = frame[:3, :3]
    t = frame[:3, 3]
    out = np.eye(4)
    out[:3, :3] = rot.T
    out[:3, 3] = -rot.T @ t
    return out

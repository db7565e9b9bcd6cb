"""Vector helper functions and AABB computation.

Capability parity with the reference's ray_trace_utils/vector_manipulations.py
(get_angle(s) :5/:25, rotate_z_to_normal :56, project_on_plane :76, AABB :92).
Row-vector (n,3) conventions; jnp-compatible where useful.
"""
from __future__ import annotations

import numpy as np

from .spatial import rotation_to_z


def get_angle(v1, v2) -> float:
    """Angle between two vectors [rad]."""
    v1 = np.asarray(v1, dtype=float).reshape(-1)
    v2 = np.asarray(v2, dtype=float).reshape(-1)
    c = np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2))
    return float(np.arccos(np.clip(c, -1.0, 1.0)))


def get_angles(v1s, v2s) -> np.ndarray:
    """Pairwise angles between rows of two (n,3) arrays."""
    v1s = np.asarray(v1s, dtype=float)
    v2s = np.asarray(v2s, dtype=float)
    c = np.sum(v1s * v2s, axis=-1) / (
        np.linalg.norm(v1s, axis=-1) * np.linalg.norm(v2s, axis=-1))
    return np.arccos(np.clip(c, -1.0, 1.0))


def rotate_z_to_normal(vecs, normals) -> np.ndarray:
    """Rotate vectors sampled about +Z into the frame(s) whose Z is
    ``normals``. vecs (n,3); normals (3,) or (n,3)."""
    vecs = np.atleast_2d(np.asarray(vecs, dtype=float))
    normals = np.asarray(normals, dtype=float)
    M = rotation_to_z(normals)
    if M.ndim == 2:
        return vecs @ M.T
    return np.einsum("nij,nj->ni", M, vecs)


def project_on_plane(points, normal, plane_point=None) -> np.ndarray:
    """Orthogonal projection of (n,3) points onto the plane through
    ``plane_point`` with unit ``normal``."""
    points = np.atleast_2d(np.asarray(points, dtype=float))
    normal = np.asarray(normal, dtype=float).reshape(3)
    normal = normal / np.linalg.norm(normal)
    if plane_point is None:
        plane_point = np.zeros(3)
    d = (points - plane_point) @ normal
    return points - d[:, None] * normal


def aabb(points) -> np.ndarray:
    """Axis-aligned bounding box of (n,3) points: rows [min, max] (2,3)."""
    points = np.atleast_2d(np.asarray(points, dtype=float))
    return np.stack([points.min(axis=0), points.max(axis=0)])


AABB = aabb

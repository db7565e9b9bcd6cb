"""Traced (jax.numpy) vector math used inside the trace kernels."""
from __future__ import annotations

import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """Unit vectors along ``axis``; zero vectors stay finite when eps>0.
    The eps branch is a double-where (not a maximum) so sqrt'(0) = inf
    cannot poison reverse-mode autodiff through masked lanes."""
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    if eps:
        good = n2 > eps * eps
        n = jnp.where(good, jnp.sqrt(jnp.where(good, n2, 1.0)), eps)
    else:
        n = jnp.sqrt(n2)
    return v / n


def dot(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jnp.sum(a * b, axis=axis)


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """Forward-identical to sqrt(maximum(x, 0)), but with a ZERO gradient
    on clamped lanes instead of sqrt'(0) = inf — reverse-mode autodiff
    (diff.trace_diff) would otherwise turn every masked miss/TIR lane
    into a NaN cotangent (the double-where pattern)."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def safe_arccos(c: jnp.ndarray) -> jnp.ndarray:
    """Forward-identical to arccos(clip(c, -1, 1)), but with a ZERO
    gradient at |c| >= 1 instead of the true (infinite) one-sided
    derivative — keeps exactly-normal-incidence lanes differentiable."""
    cc = jnp.clip(c, -1.0, 1.0)
    inner = jnp.abs(cc) < 1.0
    return jnp.where(inner, jnp.arccos(jnp.where(inner, cc, 0.0)),
                     jnp.where(cc > 0.0, 0.0, jnp.pi).astype(cc.dtype))


def rotation_to_z(vecs: jnp.ndarray) -> jnp.ndarray:
    """Batched frames whose Z axis is ``vecs`` (n,3) -> (n,3,3).

    New X lies in the original XY plane; identity when vecs == +Z.
    Traced analog of spatial.rotation_to_z (reference
    tracer/spatial_geometry.py:24), written branchlessly for XLA.
    """
    vx, vy, vz = vecs[..., 0], vecs[..., 1], vecs[..., 2]
    perp = jnp.stack([vy, -vx, jnp.zeros_like(vx)], axis=-1)
    # double-where sqrt guard: a normal along +-Z has perp == 0 and
    # sqrt'(0) = inf would poison reverse-mode autodiff (diff.trace_diff)
    nrm2 = jnp.sum(perp * perp, axis=-1, keepdims=True)
    singular = nrm2[..., 0] < 1e-24
    nrm = jnp.sqrt(jnp.where(singular[..., None], 1.0, nrm2))
    fallback = jnp.zeros_like(perp).at[..., 0].set(1.0)
    perp = jnp.where(singular[..., None], fallback, perp / nrm)
    ycol = jnp.cross(vecs, perp)
    # Columns are [perp, v x perp, v].
    return jnp.stack([perp, ycol, vecs], axis=-1)


def apply_rot(rot: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """rot @ v for rot (3,3) or (n,3,3) and vecs (n,3), expanded into
    elementwise VPU math. NEVER use `@`/einsum for these tiny products on
    the hot path: XLA routes them through the TPU MXU whose float32 matmul
    is bf16-rounded by default, which corrupts ray positions at meter scale
    (observed: centimeter-level hit errors on a 7 m scene)."""
    x, y, z = vecs[..., 0], vecs[..., 1], vecs[..., 2]
    return jnp.stack([
        rot[..., 0, 0] * x + rot[..., 0, 1] * y + rot[..., 0, 2] * z,
        rot[..., 1, 0] * x + rot[..., 1, 1] * y + rot[..., 1, 2] * z,
        rot[..., 2, 0] * x + rot[..., 2, 1] * y + rot[..., 2, 2] * z,
    ], axis=-1)


def rotate_to_normal(local_dirs: jnp.ndarray, normals: jnp.ndarray) -> jnp.ndarray:
    """Rotate direction vectors sampled about +Z into frames whose Z is
    ``normals``. Both (n,3); returns (n,3)."""
    M = rotation_to_z(normals)
    return apply_rot(M, local_dirs)


def transform_points(frame: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply homogeneous 4x4 ``frame`` (or batch (n,4,4)) to points (n,3)."""
    return apply_rot(frame[..., :3, :3], pts) + frame[..., :3, 3]


def transform_dirs(frame: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Apply the rotation part of ``frame`` to direction vectors (n,3)."""
    return apply_rot(frame[..., :3, :3], dirs)

"""Nearest-hit intersection kernel: one branchless quadric test for every
surface family.

Replaces the reference's per-surface Python dispatch (HOT LOOP 1,
tracer/tracer_engine.py:27-64 + tracer/quadric.py:32-113 +
tracer/flat_surface.py:16-62): surfaces live in a flat table; a scan over
surface blocks keeps a running (t_min, surface_id) per ray, so memory stays
O(block * n_rays) and XLA fuses the whole block into vector code.

Numerics follow the reference's conventions so results are comparable:
  * quadric roots via the numerically-stable q-formula (quadric.py:83-91)
  * linear (A==0) and B==0 special cases (quadric.py:79-86)
  * a discriminant threshold for grazing hits (quadric.py:58)
  * a positive-t threshold to avoid self-intersection (quadric.py:133).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import geometry as G
from ..mathutils import apply_rot


def aperture_mask(ap_type: jnp.ndarray, ap_params: jnp.ndarray,
                  pt: jnp.ndarray) -> jnp.ndarray:
    """Evaluate ANDed aperture constraints at local points.

    ap_type (C,), ap_params (C,6), pt (..., 3) -> bool (...).
    All constraint predicates are computed branchlessly and selected by id.
    """
    x, y, z = pt[..., 0], pt[..., 1], pt[..., 2]
    r2 = x * x + y * y
    ok = jnp.ones(x.shape, dtype=bool)
    for c in range(ap_type.shape[0]):
        t = ap_type[c]
        p = ap_params[c]
        # compute every predicate (cheap VPU math), select by type id
        rect = (jnp.abs(x) <= p[0]) & (jnp.abs(y) <= p[1])
        radial = (r2 >= p[0] * p[0]) & (r2 <= p[1] * p[1])
        zrange = (z >= p[0]) & (z <= p[1])
        ang = jnp.arctan2(y, x)
        ang = jnp.where(ang < 0.0, ang + 2.0 * jnp.pi, ang)
        angrange = (ang >= p[0]) & (ang <= p[1])
        xcut = x <= p[0]
        # hexagon, circumradius p0, two sides parallel to the y axis
        # (matches ref HexagonalParabolicDishGM._select_coords)
        hexa = (jnp.abs(x) <= jnp.sqrt(3.0) * p[0] / 2.0) & \
               (jnp.abs(y) <= p[0] - jnp.tan(jnp.pi / 6.0) * jnp.abs(x))
        # triangle via consistent edge cross products
        d1 = (p[2] - p[0]) * (y - p[1]) - (p[3] - p[1]) * (x - p[0])
        d2 = (p[4] - p[2]) * (y - p[3]) - (p[5] - p[3]) * (x - p[2])
        d3 = (p[0] - p[4]) * (y - p[5]) - (p[1] - p[5]) * (x - p[4])
        has_neg = (d1 < 0) | (d2 < 0) | (d3 < 0)
        has_pos = (d1 > 0) | (d2 > 0) | (d3 > 0)
        tri = ~(has_neg & has_pos)
        rect_hole = ~((jnp.abs(x - p[0]) <= p[2]) & (jnp.abs(y - p[1]) <= p[3]))
        dcx, dcy = x - p[0], y - p[1]
        circ_d2 = dcx * dcx + dcy * dcy
        circ_hole = circ_d2 > p[2] * p[2]
        circ = circ_d2 <= p[2] * p[2]
        dsz = z - p[2]
        sph = (dcx * dcx + dcy * dcy + dsz * dsz) <= p[3] * p[3]
        abshp = jnp.abs(p[0] * x + p[1] * y) <= p[2]

        preds = jnp.stack([
            jnp.ones_like(rect),       # AP_NONE
            rect, radial, zrange, angrange, xcut, hexa, tri,
            rect_hole, circ_hole, circ, sph, abshp,
            ~tri,                      # AP_TRIANGLE_HOLE
        ], axis=0)
        ok = ok & preds[t]
    return ok


def _surface_t(inv_frame: jnp.ndarray, quad: jnp.ndarray,
               ap_type: jnp.ndarray, ap_params: jnp.ndarray,
               pos: jnp.ndarray, dirs: jnp.ndarray,
               t_eps: float, disc_eps: float) -> jnp.ndarray:
    """Parametric hit distance of every ray against ONE surface.

    inv_frame (4,4), quad (10,), ap_type (C,), ap_params (C,6),
    pos/dirs (N,3). Returns t (N,), +inf on miss.
    """
    rot = inv_frame[:3, :3]
    trn = inv_frame[:3, 3]
    # apply_rot, not `@`: tiny matmuls must stay off the bf16-rounded MXU
    v = apply_rot(rot, pos) + trn    # local ray origins
    d = apply_rot(rot, dirs)         # local ray directions
    # Scale-relative self-intersection guard: in float32 the hit point of the
    # previous bounce carries O(|v| * eps_mach) error, so an absolute 1e-6
    # threshold (the reference's, for float64) lets rays re-hit their own
    # surface. Scale the threshold by the local ray-origin magnitude.
    t_min = t_eps * (1.0 + jnp.sqrt(jnp.sum(v * v, axis=-1)))

    axx, ayy, azz, axy, axz, ayz, bx, by, bz, c0 = [quad[i] for i in range(10)]

    def q_form(p, q2):
        # p^T A q2 with symmetric A
        return (axx * p[..., 0] * q2[..., 0] + ayy * p[..., 1] * q2[..., 1]
                + azz * p[..., 2] * q2[..., 2]
                + axy * (p[..., 0] * q2[..., 1] + p[..., 1] * q2[..., 0])
                + axz * (p[..., 0] * q2[..., 2] + p[..., 2] * q2[..., 0])
                + ayz * (p[..., 1] * q2[..., 2] + p[..., 2] * q2[..., 1]))

    def b_dot(p):
        return bx * p[..., 0] + by * p[..., 1] + bz * p[..., 2]

    A = q_form(d, d)
    B = 2.0 * (q_form(d, v) + b_dot(d))
    C = q_form(v, v) + 2.0 * b_dot(v) + c0

    inf = jnp.array(jnp.inf, dtype=pos.dtype)

    is_linear = A == 0.0
    is_b0 = B == 0.0

    # quadratic: stable q-formula
    disc = B * B - 4.0 * A * C
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    signB = jnp.where(B >= 0.0, 1.0, -1.0)
    q = -0.5 * (B + signB * sq)
    safeA = jnp.where(A == 0.0, 1.0, A)
    safeq = jnp.where(q == 0.0, 1.0, q)
    t_quad_0 = q / safeA
    t_quad_1 = C / safeq
    quad_ok = disc >= disc_eps

    # B == 0 (and A != 0): t = +-sqrt(-C/A)
    mCA = -C / safeA
    sqrt_mCA = jnp.sqrt(jnp.maximum(mCA, 0.0))
    b0_ok = mCA >= 0.0

    # linear (A == 0): single root
    safeB = jnp.where(B == 0.0, 1.0, B)
    t_lin = -C / safeB
    # parallel-ray threshold per ref flat_surface.py:39 (|dt| > 1e-7)
    lin_ok = jnp.abs(B) > 1e-7

    t0 = jnp.where(is_linear, t_lin,
                   jnp.where(is_b0, -sqrt_mCA, t_quad_0))
    t1 = jnp.where(is_linear, t_lin,
                   jnp.where(is_b0, sqrt_mCA, t_quad_1))
    root_ok = jnp.where(is_linear, lin_ok,
                        jnp.where(is_b0, b0_ok, quad_ok))

    def root_t(t):
        pt = v + t[..., None] * d
        ok = root_ok & (t > t_min) & jnp.isfinite(t)
        ok = ok & aperture_mask(ap_type, ap_params, pt)
        return jnp.where(ok, t, inf)

    return jnp.minimum(root_t(t0), root_t(t1))


def default_t_eps(dtype) -> float:
    """Relative positive-t threshold by precision: float32 needs a much
    larger self-intersection guard than the reference's float64 1e-6."""
    return 3e-4 if jnp.dtype(dtype).itemsize <= 4 else 1e-6


@functools.partial(jax.jit, static_argnames=("t_eps", "disc_eps", "block"))
def nearest_hit(scene, pos: jnp.ndarray, dirs: jnp.ndarray,
                t_eps: Optional[float] = None, disc_eps: float = 1e-6,
                block: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest surface hit per ray over the whole scene table.

    Returns (t, sid): t (N,) hit distance (+inf = escaped),
    sid (N,) int32 row index of the hit surface (-1 = escaped).
    ``block`` surfaces are tested per scan step (memory O(block*N)).
    t_eps defaults by dtype (see default_t_eps) and is scaled by the local
    ray-origin magnitude inside the kernel.
    """
    if t_eps is None:
        t_eps = default_t_eps(pos.dtype)
    S = scene.num_rows
    N = pos.shape[0]
    blk = min(block or 64, S)
    nb = -(-S // blk)
    pad = nb * blk - S

    def pad0(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    inv_frames = pad0(scene.inv_frame).reshape(nb, blk, 4, 4)
    quads = pad0(scene.quadric).reshape(nb, blk, 10)
    ap_t = pad0(scene.ap_type).reshape(nb, blk, -1)
    ap_p = pad0(scene.ap_params).reshape(nb, blk, -1, scene.ap_params.shape[-1])
    sids = pad0(jnp.arange(S, dtype=jnp.int32)).reshape(nb, blk)
    # padded rows have quad == 0 -> linear branch with B == 0 -> never hit

    per_surface = jax.vmap(
        lambda invf, qd, at, app: _surface_t(invf, qd, at, app, pos, dirs,
                                             t_eps, disc_eps))

    def body(carry, blk_data):
        t_best, sid_best = carry
        invf, qd, at, app, sid = blk_data
        t_blk = per_surface(invf, qd, at, app)            # (blk, N)
        i_min = jnp.argmin(t_blk, axis=0)                  # (N,)
        t_min = jnp.min(t_blk, axis=0)
        sid_min = sid[i_min]
        upd = t_min < t_best
        return (jnp.where(upd, t_min, t_best),
                jnp.where(upd, sid_min, sid_best)), None

    # full_like (not full): inherits the shard_map varying-axis tags of the
    # ray arrays, otherwise the scan carry types mismatch under a mesh.
    init = (jnp.full_like(pos[:, 0], jnp.inf),
            jnp.full_like(pos[:, 0], -1, dtype=jnp.int32))
    (t_best, sid_best), _ = jax.lax.scan(
        body, init, (inv_frames, quads, ap_t, ap_p, sids))
    sid_best = jnp.where(jnp.isfinite(t_best), sid_best, -1)
    return t_best, sid_best

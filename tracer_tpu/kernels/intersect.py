"""Nearest-hit intersection kernel, specialized per surface group.

Replaces the reference's per-surface Python dispatch (HOT LOOP 1,
tracer/tracer_engine.py:27-64 + tracer/quadric.py:32-113 +
tracer/flat_surface.py:16-62). The scene compiler sorts surfaces so rows
with the same aperture signature are contiguous (scene.py); for each group
this kernel emits *lean* code — only that group's aperture predicates are
evaluated, instead of a 13-way select per constraint per surface. Within a
group, a scan over blocks of surfaces keeps a running (t_min, surface_id)
per ray, so memory stays O(block * n_rays).

Numerics follow the reference's conventions so results are comparable:
  * quadric roots via the numerically-stable q-formula (quadric.py:83-91)
  * linear (A==0) and B==0 special cases (quadric.py:79-86)
  * discriminant threshold for grazing hits (quadric.py:58)
  * a positive-t threshold (quadric.py:133) — made scale-relative and
    dtype-aware here, because the reference's absolute 1e-6 lets float32
    rays re-hit their own surface at meter scale.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import geometry as G
from ..mathutils import apply_rot, safe_sqrt


def _constraint_pred(kind: int, p, x, y, z):
    """Predicate for ONE statically-known constraint type. p is (6,) params
    (per surface, broadcast against ray-shaped x/y/z)."""
    if kind == G.AP_NONE:
        return None
    if kind == G.AP_RECT:
        return (jnp.abs(x) <= p[..., 0]) & (jnp.abs(y) <= p[..., 1])
    if kind == G.AP_RADIAL:
        r2 = x * x + y * y
        return (r2 >= p[..., 0] ** 2) & (r2 <= p[..., 1] ** 2)
    if kind == G.AP_ZRANGE:
        return (z >= p[..., 0]) & (z <= p[..., 1])
    if kind == G.AP_ANGRANGE:
        ang = jnp.arctan2(y, x)
        ang = jnp.where(ang < 0.0, ang + 2.0 * jnp.pi, ang)
        return (ang >= p[..., 0]) & (ang <= p[..., 1])
    if kind == G.AP_XCUT:
        return x <= p[..., 0]
    if kind == G.AP_HEX:
        # circumradius p0, two sides parallel to the local y axis
        # (matches ref HexagonalParabolicDishGM._select_coords)
        return ((jnp.abs(x) <= jnp.sqrt(3.0) * p[..., 0] / 2.0)
                & (jnp.abs(y) <= p[..., 0]
                   - jnp.tan(jnp.pi / 6.0) * jnp.abs(x)))
    if kind in (G.AP_TRIANGLE, G.AP_TRIANGLE_HOLE):
        d1 = ((p[..., 2] - p[..., 0]) * (y - p[..., 1])
              - (p[..., 3] - p[..., 1]) * (x - p[..., 0]))
        d2 = ((p[..., 4] - p[..., 2]) * (y - p[..., 3])
              - (p[..., 5] - p[..., 3]) * (x - p[..., 2]))
        d3 = ((p[..., 0] - p[..., 4]) * (y - p[..., 5])
              - (p[..., 1] - p[..., 5]) * (x - p[..., 4]))
        has_neg = (d1 < 0) | (d2 < 0) | (d3 < 0)
        has_pos = (d1 > 0) | (d2 > 0) | (d3 > 0)
        inside = ~(has_neg & has_pos)
        return inside if kind == G.AP_TRIANGLE else ~inside
    if kind == G.AP_RECT_HOLE:
        return ~((jnp.abs(x - p[..., 0]) <= p[..., 2])
                 & (jnp.abs(y - p[..., 1]) <= p[..., 3]))
    if kind == G.AP_CIRC_HOLE:
        return ((x - p[..., 0]) ** 2 + (y - p[..., 1]) ** 2) > p[..., 2] ** 2
    if kind == G.AP_CIRC:
        return ((x - p[..., 0]) ** 2 + (y - p[..., 1]) ** 2) <= p[..., 2] ** 2
    if kind == G.AP_SPHERE:
        return ((x - p[..., 0]) ** 2 + (y - p[..., 1]) ** 2
                + (z - p[..., 2]) ** 2) <= p[..., 3] ** 2
    if kind == G.AP_ABS_HALFPLANE:
        return jnp.abs(p[..., 0] * x + p[..., 1] * y) <= p[..., 2]
    raise ValueError(f"unknown aperture constraint {kind}")


def aperture_mask_static(sig, ap_params, pt):
    """ANDed aperture constraints with a statically-known signature.
    ap_params (C,6) for one surface; pt (...,3) local points."""
    x, y, z = pt[..., 0], pt[..., 1], pt[..., 2]
    ok = None
    for c, kind in enumerate(sig):
        pred = _constraint_pred(kind, ap_params[c], x, y, z)
        if pred is None:
            continue
        ok = pred if ok is None else (ok & pred)
    if ok is None:
        return jnp.ones(x.shape, dtype=bool)
    return ok


def _surface_t(inv_frame, quad, ap_params, pos, dirs, t_eps, disc_eps, sig,
               flags=None):
    """Hit distance of every ray against ONE surface with static aperture
    signature ``sig``. Returns t (N,), +inf on miss. With ``flags`` (the
    row's optics flags), F_BACKSIDE_MISS rows reject rays arriving along
    local +Z — the bifacial-pair face selector."""
    rot = inv_frame[:3, :3]
    trn = inv_frame[:3, 3]
    # apply_rot, not `@`: tiny matmuls must stay off the bf16-rounded MXU
    v = apply_rot(rot, pos) + trn
    d = apply_rot(rot, dirs)
    # scale-relative self-intersection guard (see module docstring)
    t_min = t_eps * (1.0 + jnp.sqrt(jnp.sum(v * v, axis=-1)))

    axx, ayy, azz, axy, axz, ayz, bx, by, bz, c0 = [quad[i] for i in range(10)]

    def q_form(p, q2):
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

    disc = B * B - 4.0 * A * C
    sq = safe_sqrt(disc)   # gradable through miss/tangent clamps
    signB = jnp.where(B >= 0.0, 1.0, -1.0)
    q = -0.5 * (B + signB * sq)
    safeA = jnp.where(is_linear, 1.0, A)
    safeq = jnp.where(q == 0.0, 1.0, q)
    t_quad_0 = q / safeA
    t_quad_1 = C / safeq
    quad_ok = disc >= disc_eps

    mCA = -C / safeA
    sqrt_mCA = safe_sqrt(mCA)
    b0_ok = mCA >= 0.0

    safeB = jnp.where(is_b0, 1.0, B)
    t_lin = -C / safeB
    lin_ok = jnp.abs(B) > 1e-7   # parallel-ray cutoff, ref flat_surface.py:39

    t0 = jnp.where(is_linear, t_lin, jnp.where(is_b0, -sqrt_mCA, t_quad_0))
    t1 = jnp.where(is_linear, t_lin, jnp.where(is_b0, sqrt_mCA, t_quad_1))
    root_ok = jnp.where(is_linear, lin_ok, jnp.where(is_b0, b0_ok, quad_ok))

    def root_t(t):
        ok = root_ok & (t > t_min) & jnp.isfinite(t)
        if sig:  # evaluate apertures only when the group has any
            pt = v + t[..., None] * d
            ok = ok & aperture_mask_static(sig, ap_params, pt)
        return jnp.where(ok, t, inf)

    t_best = jnp.minimum(root_t(t0), root_t(t1))
    if flags is not None:
        from .. import materials as _M
        bmiss = (flags.astype(jnp.int32) & _M.F_BACKSIDE_MISS) != 0
        t_best = jnp.where(bmiss & (d[..., 2] > 0.0), inf, t_best)
    return t_best


def _use_pallas(pos) -> bool:
    if pos.dtype != jnp.float32:
        return False
    # TRACER_FORCE_PALLAS=1 routes the fast paths through the Pallas
    # kernels regardless of backend — combined with
    # pltpu.force_tpu_interpret_mode() this lets the CPU suite exercise
    # the megakernel code paths the hardware runs (slow; tests only).
    # CAVEAT: read at trace time inside jitted callers (_bounce_step)
    # and NOT part of the jit cache key — flipping it mid-process can
    # reuse a stale cached trace. Tests that toggle it must
    # jax.clear_caches() around the toggle (see
    # tests/test_interpret_megakernel.py's autouse fixture).
    import os
    if os.environ.get("TRACER_FORCE_PALLAS", "") == "1":
        return True
    # honor a jax.default_device(cpu) context (e.g. the culling pilot on a
    # TPU host): Pallas kernels only lower on accelerator backends
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, "platform", str(dd)) not in ("cpu",)
    return jax.default_backend() not in ("cpu",)


def _aperture_mask_dynamic(ap_type, ap_params, pt):
    """ANDed aperture constraints with PER-RAY constraint types: evaluates
    every predicate and selects by type id. Used by the Kd-accelerated
    candidate path, where each ray tests its own surface row so the
    signature cannot be specialized statically. ap_type (N,C) int,
    ap_params (N,C,6), pt (N,3)."""
    x, y, z = pt[..., 0], pt[..., 1], pt[..., 2]
    ok = jnp.ones(x.shape, dtype=bool)
    for c in range(ap_type.shape[1]):
        tid = ap_type[:, c]
        p = ap_params[:, c]
        sel = jnp.ones(x.shape, dtype=bool)
        for kind in (G.AP_RECT, G.AP_RADIAL, G.AP_ZRANGE, G.AP_ANGRANGE,
                     G.AP_XCUT, G.AP_HEX, G.AP_TRIANGLE, G.AP_TRIANGLE_HOLE,
                     G.AP_RECT_HOLE, G.AP_CIRC_HOLE, G.AP_CIRC, G.AP_SPHERE,
                     G.AP_ABS_HALFPLANE):
            pred = _constraint_pred(kind, p, x, y, z)
            sel = jnp.where(tid == kind, pred, sel)
        ok = ok & sel
    return ok


@jax.custom_vjp
def _take_rows(table, idx):
    """jnp.take(axis=0) whose BACKWARD is a one-hot matmul instead of a
    scatter-add: XLA serializes big scatter-adds on TPU (~hundreds of ms
    at 1M rays — measured dropping the diff-gradient benchmark from 13.8
    to 1.7 Mrays/s), while the (S, N) x (N, K) accumulation rides the
    MXU. Forward is a plain gather. For very large row tables the one-hot
    would not fit, so the backward falls back to the scatter there (the
    differentiable paths trace small scenes)."""
    return jnp.take(table, idx, axis=0)


def _take_rows_fwd(table, idx):
    # residuals must be JAX types: a zero-width marker carries the
    # table's static row count and dtype into the backward rule
    marker = jnp.zeros((table.shape[0], 0), dtype=table.dtype)
    return jnp.take(table, idx, axis=0), (idx, marker)


def _take_rows_bwd(res, g):
    idx, marker = res
    S = marker.shape[0]
    shape = (S,) + g.shape[1:]
    if S > 2048:   # one-hot would not fit; rare (diff scenes are small)
        acc = jnp.zeros(shape, dtype=g.dtype).at[idx].add(g)
        return acc.astype(marker.dtype), None
    onehot = (idx[:, None] == jnp.arange(S)[None, :]).astype(g.dtype)
    gt = g.reshape(g.shape[0], -1)
    acc = jax.lax.dot_general(onehot, gt, (((0,), (0,)), ((), ())),
                              precision=jax.lax.Precision.HIGHEST)
    return acc.reshape(shape).astype(marker.dtype), None


_take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


@functools.partial(jax.jit, static_argnames=("t_eps", "disc_eps"))
def _candidate_t(scene, rows, pos, dirs, t_eps: float, disc_eps: float):
    """Hit distance of each ray against ITS OWN candidate row (rows (N,)
    int32, -1 = no candidate -> +inf). Per-ray row data is gathered, the
    quadric solved with per-ray coefficients, apertures evaluated
    dynamically. This is the building block of the Kd-accelerated path:
    ray i only ever pays for the surfaces its traversal returned."""
    s = jnp.maximum(rows, 0)
    invf = _take_rows(scene.inv_frame, s)
    quad = _take_rows(scene.quadric, s)
    ap_t = jnp.take(scene.ap_type, s, axis=0)      # int: no cotangent
    ap_p = _take_rows(scene.ap_params, s)

    rot = invf[:, :3, :3]
    trn = invf[:, :3, 3]
    v = apply_rot(rot, pos) + trn
    d = apply_rot(rot, dirs)
    t_min = t_eps * (1.0 + jnp.sqrt(jnp.sum(v * v, axis=-1)))

    q = [quad[:, i] for i in range(10)]
    axx, ayy, azz, axy, axz, ayz, bx, by, bz, c0 = q

    def q_form(p, r2):
        return (axx * p[..., 0] * r2[..., 0] + ayy * p[..., 1] * r2[..., 1]
                + azz * p[..., 2] * r2[..., 2]
                + axy * (p[..., 0] * r2[..., 1] + p[..., 1] * r2[..., 0])
                + axz * (p[..., 0] * r2[..., 2] + p[..., 2] * r2[..., 0])
                + ayz * (p[..., 1] * r2[..., 2] + p[..., 2] * r2[..., 1]))

    def b_dot(p):
        return bx * p[..., 0] + by * p[..., 1] + bz * p[..., 2]

    A = q_form(d, d)
    B = 2.0 * (q_form(d, v) + b_dot(d))
    C = q_form(v, v) + 2.0 * b_dot(v) + c0

    inf = jnp.array(jnp.inf, dtype=pos.dtype)
    is_linear = A == 0.0
    is_b0 = B == 0.0
    disc = B * B - 4.0 * A * C
    sq = safe_sqrt(disc)   # gradable through miss/tangent clamps
    signB = jnp.where(B >= 0.0, 1.0, -1.0)
    qq = -0.5 * (B + signB * sq)
    safeA = jnp.where(is_linear, 1.0, A)
    safeq = jnp.where(qq == 0.0, 1.0, qq)
    mCA = -C / safeA
    sqrt_mCA = safe_sqrt(mCA)
    safeB = jnp.where(is_b0, 1.0, B)
    t_lin = -C / safeB
    t0 = jnp.where(is_linear, t_lin,
                   jnp.where(is_b0, -sqrt_mCA, qq / safeA))
    t1 = jnp.where(is_linear, t_lin,
                   jnp.where(is_b0, sqrt_mCA, C / safeq))
    root_ok = jnp.where(is_linear, jnp.abs(B) > 1e-7,
                        jnp.where(is_b0, mCA >= 0.0, disc >= disc_eps))

    def root_t(t):
        ok = root_ok & (t > t_min) & jnp.isfinite(t)
        pt = v + t[..., None] * d
        ok = ok & _aperture_mask_dynamic(ap_t, ap_p, pt)
        return jnp.where(ok, t, inf)

    t = jnp.minimum(root_t(t0), root_t(t1))
    # bifacial face selector: F_BACKSIDE_MISS rows reject local +Z arrivals
    from .. import materials as _M
    fl = jnp.take(scene.opt_flags, s, axis=0)
    bmiss = (fl.astype(jnp.int32) & _M.F_BACKSIDE_MISS) != 0
    t = jnp.where(bmiss & (d[..., 2] > 0.0), inf, t)
    return jnp.where(rows >= 0, t, inf)


@functools.partial(jax.jit, static_argnames=("t_eps", "disc_eps"))
def nearest_hit_candidates(scene, cand, pos, dirs,
                           t_eps: Optional[float] = None,
                           disc_eps: float = 1e-6):
    """Nearest hit over PER-RAY candidate lists (the Kd-tree accelerated
    path, analog of the reference's 'lightweight' accel mode consumed at
    tracer/tracer_engine.py:195-207). cand (N, K) int32 rows per ray,
    padded with -1. Returns (t, sid) like nearest_hit."""
    if t_eps is None:
        t_eps = default_t_eps(pos.dtype)
    t_best = jnp.full_like(pos[:, 0], jnp.inf)
    sid_best = jnp.full_like(pos[:, 0], -1, dtype=jnp.int32)
    for k in range(cand.shape[1]):
        rows = cand[:, k]
        t = _candidate_t(scene, rows, pos, dirs, t_eps, disc_eps)
        upd = t < t_best
        t_best = jnp.where(upd, t, t_best)
        sid_best = jnp.where(upd, rows, sid_best)
    sid_best = jnp.where(jnp.isfinite(t_best), sid_best, -1)
    return t_best, sid_best


def pallas_rows_fit(scene) -> bool:
    """Whether the packed (K, S) rows table fits the 1 MB SMEM next to the
    kernels' misc scalar-prefetch arrays — INCLUDING the shared spectral
    table, which also rides SMEM (a scene with thousands of n,k samples
    can overflow with few rows). Beyond ~6k rows it does not; the
    brute-force Pallas kernels then hand off to the jnp path, and the
    culled megakernel ships per-segment row SHARDS instead
    (culling.seg_row_ids)."""
    from .pallas_intersect import ROW_F

    def pad(x: int) -> int:
        return -(-x // 128) * 128
    K = ROW_F + 6 * scene.ap_params.shape[1]
    S = scene.ap_params.shape[0]
    n_tab = int(scene.spectral_wl.shape[0])
    misc = 2 * pad(max(n_tab, 2)) * 4 + 64 * 1024
    return K * pad(S) * 4 + misc <= (1 << 20)


def nearest_hit_aux(scene, pos, dirs, t_eps=None, disc_eps: float = 1e-6,
                    block=None, need_local: bool = True,
                    force_jnp: bool = False):
    """Like nearest_hit, but on the Pallas path also returns the winner's
    shading data (normal/local/up_dot/kind/flags/p0/p1) carried through the
    kernel, letting the shade pass skip its per-ray row gather. Returns
    (t, sid, aux_or_None). need_local=False skips carrying the local hit
    point (3 selects/surface) when no per-bounce records are kept.
    force_jnp=True pins the pure-jnp path regardless of backend — required
    by reverse-mode autodiff (diff.trace_diff), which cannot flow through
    the Pallas kernels."""
    if t_eps is None:
        t_eps = default_t_eps(pos.dtype)
    if not force_jnp and _use_pallas(pos) and pallas_rows_fit(scene):
        from .pallas_intersect import nearest_hit_pallas, pack_rows
        return nearest_hit_pallas(pack_rows(scene), pos, dirs, scene.groups,
                                  t_eps, disc_eps, need_local=need_local,
                                  backside_miss="bifacial"
                                  in scene.features)
    # use_pallas=False, not None: nearest_hit re-decides the dispatch
    # otherwise, and on TPU it would pick the Pallas kernel right back —
    # force_jnp callers (reverse-mode autodiff) cannot flow through it
    t, sid = nearest_hit(scene, pos, dirs, t_eps=t_eps, disc_eps=disc_eps,
                         block=block,
                         use_pallas=False if force_jnp else None)
    return t, sid, None


def default_t_eps(dtype) -> float:
    """Relative positive-t threshold by precision: float32 needs a much
    larger self-intersection guard than the reference's float64 1e-6."""
    return 3e-4 if jnp.dtype(dtype).itemsize <= 4 else 1e-6


def _group_nearest(scene, start, end, sig, pos, dirs, t_eps, disc_eps,
                   block, carry):
    """Fold one contiguous surface group into the running (t, sid) carry."""
    Sg = end - start
    blk = min(block, Sg)
    nb = -(-Sg // blk)
    pad = nb * blk - Sg

    def prep(a):
        a = a[start:end]
        if pad:
            a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        return a.reshape((nb, blk) + a.shape[1:])

    inv_frames = prep(scene.inv_frame)
    quads = prep(scene.quadric)
    ap_p = prep(scene.ap_params)
    flags = prep(scene.opt_flags)
    sids = prep(jnp.arange(scene.num_rows, dtype=jnp.int32))
    # padded rows have quad == 0 -> linear branch with B == 0 -> never hit

    per_surface = jax.vmap(
        lambda invf, qd, app, fl: _surface_t(invf, qd, app, pos, dirs,
                                             t_eps, disc_eps, sig,
                                             flags=fl))

    def body(c, blk_data):
        t_best, sid_best = c
        invf, qd, app, fl, sid = blk_data
        t_blk = per_surface(invf, qd, app, fl)             # (blk, N)
        if blk == 1:
            t_min, sid_min = t_blk[0], sid[0]
        else:
            i_min = jnp.argmin(t_blk, axis=0)
            t_min = jnp.min(t_blk, axis=0)
            sid_min = sid[i_min]
        upd = t_min < t_best
        return (jnp.where(upd, t_min, t_best),
                jnp.where(upd, sid_min, sid_best)), None

    if nb == 1:
        carry, _ = body(carry, (inv_frames[0], quads[0], ap_p[0], flags[0],
                                sids[0]))
        return carry
    carry, _ = jax.lax.scan(body, carry,
                            (inv_frames, quads, ap_p, flags, sids))
    return carry


@functools.partial(jax.jit, static_argnames=("t_eps", "disc_eps", "block",
                                             "use_pallas"))
def nearest_hit(scene, pos: jnp.ndarray, dirs: jnp.ndarray,
                t_eps: Optional[float] = None, disc_eps: float = 1e-6,
                block: Optional[int] = None,
                use_pallas: Optional[bool] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest surface hit per ray over the whole scene table.

    Returns (t, sid): t (N,) hit distance (+inf = escaped), sid (N,) int32
    row of the hit surface (-1 = escaped). Surfaces are processed in
    compile-time aperture-signature groups; within a group, ``block``
    surfaces per scan step (memory O(block * N)).
    """
    if t_eps is None:
        t_eps = default_t_eps(pos.dtype)
    block = block or 16

    # TPU + float32: use the Pallas kernel (single HBM pass, all
    # intermediates in VMEM). The jnp path below stays as the float64/CPU
    # oracle and the fallback for exotic backends, for scenes whose rows
    # table exceeds SMEM, and for callers forcing it (use_pallas=False —
    # e.g. the culled driver's jnp drain on multi-k-row scenes).
    if use_pallas is None:
        use_pallas = _use_pallas(pos) and pallas_rows_fit(scene)
    if use_pallas:
        from .pallas_intersect import nearest_hit_pallas, pack_rows
        t, sid, _aux = nearest_hit_pallas(pack_rows(scene), pos, dirs,
                                          scene.groups, t_eps, disc_eps,
                                          backside_miss="bifacial"
                                          in scene.features)
        return t, sid

    # full_like: inherits shard_map varying-axis tags of the ray arrays
    carry = (jnp.full_like(pos[:, 0], jnp.inf),
             jnp.full_like(pos[:, 0], -1, dtype=jnp.int32))
    if not scene.groups:
        raise ValueError("SceneTable.groups missing — compile with "
                         "scene.compile_scene")
    for (start, end, sig, _tag) in scene.groups:
        carry = _group_nearest(scene, start, end, sig, pos, dirs,
                               t_eps, disc_eps, block, carry)
    t_best, sid_best = carry
    sid_best = jnp.where(jnp.isfinite(t_best), sid_best, -1)
    return t_best, sid_best

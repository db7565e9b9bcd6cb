"""Pallas TPU kernel for nearest-hit intersection.

The hot op of the whole framework (SURVEY §7: replaces the reference's HOT
LOOP 1 and the per-ray Python Kd traversal). Rays are tiled into VMEM as
(sublane, 128-lane) blocks; the kernel loops over the scene's surfaces with
all per-ray intermediates resident in vector registers/VMEM, so HBM traffic
is one read of the ray components and one write of (t, sid) per call —
speed-of-light for a memory-bound pass, VPU-bound once S is large.

One pallas_call per aperture-signature group (the signature is static, so
only that group's aperture predicates are compiled). The (t, sid) running
minimum is carried across group calls via input/output aliasing.

float32 only (TPU). The jnp reference path in intersect.py remains the
float64/CPU oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import geometry as G

# ray tile: (SUB, 128) f32 — 8 live (SUB,128) arrays stay well inside VMEM
# Ray-tile shape. SUB=24 (3 native f32 (8,128) registers) won a sweep on
# v5e over {8,16,24,32,40,64,128,256,512}: small blocks keep the ~18 VMEM
# buffers tiny so the pipeline double-buffers deeply across grid steps,
# while the in-kernel loop over surface rows still gives each block plenty
# of arithmetic per byte. 8->95, 16->143, 24->152-156, 32->144, 64->128,
# 256->107 Mrays/s on the NSTTF benchmark.
SUB = 24
LANE = 128
TILE = SUB * LANE

# packed surface row layout (see pack_rows)
ROW_INV_ROT = 0      # 9 floats, row-major R^T
ROW_INV_TRN = 9      # 3 floats
ROW_QUAD = 12        # 10 floats
ROW_KIND = 22        # optics kind*1024 + flags (as float; both small ints)
ROW_P0 = 23          # first SEVEN optics params (p2 = spectral-row sigma;
                     # p2/p3 = Cook-Torrance m_k / R_lam; p4..p6 =
                     # piecewise-Lambertian wl-chunk start / len / grid
                     # start for the bilinear (theta, wl) absorptance)
ROW_AP = 30          # C*6 floats of aperture params
ROW_F = 30           # + 6*C

# carried per-ray state: t, sid, global normal (3), local hit point (3),
# up-component of ray dir, optics kind*1024+flags, p0, p1 of the winner.
# With need_local=False (streaming: no per-bounce records) the local hit
# point is not carried, saving 3 selects per surface iteration.
N_STATE = 12
N_STATE_NOLOCAL = 9


def pack_rows(scene) -> "jnp.ndarray":
    """Pack per-surface data into one (ROW_F + 6*C, S) float array (traced;
    XLA hoists it out of trace loops). TRANSPOSED layout — surfaces on the
    last axis: SMEM scalar-prefetch buffers pad the minor dimension to 128
    elements, so an (S, K) table would cost S*512 bytes of the 1 MB SMEM
    (OOM beyond ~1.5k surfaces) while (K, S) costs K*ceil(S, 128)*4."""
    S = scene.num_rows
    p = scene.opt_params[:, 0:7]
    # IAM rows leave a param column free on their supported bases: mirror
    # a_r (p4) into p2 for reflective / Lambertian / semi-Lambertian bases
    # and into p3 for LambertianSpecular (whose p2 holds the
    # specular-branch slope sigma), so the fused epilogue finds it in the
    # extra_q carry (scene.compile_scene tags any other IAM base — or a
    # Martin-Ruiz exponent c != 1 — "iam_nonmirror" and the engine keeps
    # those scenes off the fused paths)
    f_iam = (scene.opt_flags & 4) != 0                   # F_IAM
    k = scene.opt_kind
    mirror2 = f_iam & ((k == 1) | (k == 2) | (k == 4))
    mirror3 = f_iam & (k == 3)
    p = p.at[:, 2].set(jnp.where(mirror2, scene.opt_params[:, 4], p[:, 2]))
    p = p.at[:, 3].set(jnp.where(mirror3, scene.opt_params[:, 4], p[:, 3]))
    return jnp.concatenate([
        scene.inv_frame[:, :3, :3].reshape(S, 9),
        scene.inv_frame[:, :3, 3],
        scene.quadric,
        (scene.opt_kind * 1024 + scene.opt_flags)[:, None]
        .astype(jnp.float32),
        p,
        scene.ap_params.reshape(S, -1),
    ], axis=1).astype(jnp.float32).T


def _ap_ok_static(sig, rp, x, y, z):
    """Static-signature aperture mask inside the kernel. rp is the packed
    row slice starting at ROW_AP; x/y/z are (SUB,128) local hit coords."""
    ok = None

    def AND(a, b):
        return b if a is None else (a & b)

    for c, kind in enumerate(sig):
        p = [rp[ROW_AP + 6 * c + j] for j in range(6)]
        if kind == G.AP_NONE:
            continue
        elif kind == G.AP_RECT:
            ok = AND(ok, (jnp.abs(x) <= p[0]) & (jnp.abs(y) <= p[1]))
        elif kind == G.AP_RADIAL:
            r2 = x * x + y * y
            ok = AND(ok, (r2 >= p[0] * p[0]) & (r2 <= p[1] * p[1]))
        elif kind == G.AP_ZRANGE:
            ok = AND(ok, (z >= p[0]) & (z <= p[1]))
        elif kind == G.AP_ANGRANGE:
            ang = jnp.arctan2(y, x)
            ang = jnp.where(ang < 0.0, ang + 2.0 * np.pi, ang)
            ok = AND(ok, (ang >= p[0]) & (ang <= p[1]))
        elif kind == G.AP_XCUT:
            ok = AND(ok, x <= p[0])
        elif kind == G.AP_HEX:
            ok = AND(ok, (jnp.abs(x) <= np.sqrt(3.0) / 2.0 * p[0])
                     & (jnp.abs(y) <= p[0] - np.tan(np.pi / 6.0) * jnp.abs(x)))
        elif kind in (G.AP_TRIANGLE, G.AP_TRIANGLE_HOLE):
            d1 = (p[2] - p[0]) * (y - p[1]) - (p[3] - p[1]) * (x - p[0])
            d2 = (p[4] - p[2]) * (y - p[3]) - (p[5] - p[3]) * (x - p[2])
            d3 = (p[0] - p[4]) * (y - p[5]) - (p[1] - p[5]) * (x - p[4])
            inside = ~(((d1 < 0) | (d2 < 0) | (d3 < 0))
                       & ((d1 > 0) | (d2 > 0) | (d3 > 0)))
            ok = AND(ok, inside if kind == G.AP_TRIANGLE else ~inside)
        elif kind == G.AP_RECT_HOLE:
            ok = AND(ok, ~((jnp.abs(x - p[0]) <= p[2])
                           & (jnp.abs(y - p[1]) <= p[3])))
        elif kind == G.AP_CIRC_HOLE:
            ok = AND(ok, ((x - p[0]) ** 2 + (y - p[1]) ** 2) > p[2] * p[2])
        elif kind == G.AP_CIRC:
            ok = AND(ok, ((x - p[0]) ** 2 + (y - p[1]) ** 2) <= p[2] * p[2])
        elif kind == G.AP_SPHERE:
            ok = AND(ok, ((x - p[0]) ** 2 + (y - p[1]) ** 2
                          + (z - p[2]) ** 2) <= p[3] * p[3])
        elif kind == G.AP_ABS_HALFPLANE:
            ok = AND(ok, jnp.abs(p[0] * x + p[1] * y) <= p[2])
        else:
            raise ValueError(f"unknown aperture constraint {kind}")
    return ok


def _interp_row_table(wl, start, length, tabx_ref, taby_ref, n_tab: int):
    """Exact gather-free piecewise-linear interpolation of one row's chunk
    [start, start+length) of the shared spectral table (SMEM), evaluated
    per lane: one pass over the (small, static-length) table with scalar
    in-segment guards — Mosaic has no per-lane gathers, but accumulating
    masked segment contributions is pure VPU math. Out-of-range clamps to
    the chunk edges (same semantics as shade._interp_segment)."""
    lo_i = start
    hi_i = start + length - 1
    x_lo, y_lo = tabx_ref[lo_i], taby_ref[lo_i]
    x_hi, y_hi = tabx_ref[hi_i], taby_ref[hi_i]
    acc = jnp.where(wl < x_lo, y_lo, jnp.where(wl >= x_hi, y_hi, 0.0))

    def seg(k, acc):
        in_seg = (k >= lo_i) & (k < hi_i)          # scalar guard
        x0, x1 = tabx_ref[k], tabx_ref[k + 1]
        y0, y1 = taby_ref[k], taby_ref[k + 1]
        m = (wl >= x0) & (wl < x1)
        w = (wl - x0) / jnp.where(x1 == x0, 1.0, x1 - x0)
        val = y0 + jnp.clip(w, 0.0, 1.0) * (y1 - y0)
        g = jnp.where(in_seg, 1.0, 0.0)
        return acc + g * jnp.where(m, val, 0.0)

    return jax.lax.fori_loop(0, n_tab - 1, seg, acc)


def _acos_poly(x):
    """arccos on [0, 1] via the Abramowitz-Stegun 4.4.45 8-term
    polynomial: |err| <= 2e-8 rad, far below any absorptance-table
    resolution — Mosaic lowers neither acos nor atan2."""
    p = jnp.float32(-0.0012624911)
    p = p * x + 0.0066700901
    p = p * x - 0.0170881256
    p = p * x + 0.0308918810
    p = p * x - 0.0501743046
    p = p * x + 0.0889789874
    p = p * x - 0.2145988016
    p = p * x + 1.5707963050
    return jnp.sqrt(jnp.maximum(1.0 - x, 0.0)) * p


def _interp2_row_table(th, wl, th_start, T, wl_start, W, grid_start,
                       tabx_ref, taby_ref):
    """Gather-free per-lane BILINEAR interpolation on a (T, W) grid packed
    into the shared spectral table: axis values live in tabx at
    [th_start, th_start+T) and [wl_start, wl_start+W); grid values
    row-major (theta-major) in taby from grid_start. Starts/lengths are
    SCALARS (from the winner row), th/wl are lane vectors. Nested fori
    with dynamic scalar bounds — (T-1)*(W-1) iterations, each a handful
    of masked VPU ops (same trick as _interp_row_table; the grid corner
    reads are scalar SMEM indexing). Queries clamp to the grid edges
    (matches shade._interp2_segment)."""
    th_lo, th_hi = tabx_ref[th_start], tabx_ref[th_start + T - 1]
    wl_lo, wl_hi = tabx_ref[wl_start], tabx_ref[wl_start + W - 1]
    th_q = jnp.clip(th, th_lo, th_hi)
    wl_q = jnp.clip(wl, wl_lo, wl_hi)

    def row(i, acc):
        tx0, tx1 = tabx_ref[th_start + i], tabx_ref[th_start + i + 1]
        # top-edge segments close their upper bound so clamped queries
        # landing exactly on the edge still match one cell
        m_th = (th_q >= tx0) & ((th_q < tx1)
                                | ((tx1 == th_hi) & (th_q <= tx1)))
        wt = jnp.clip((th_q - tx0)
                      / jnp.where(tx1 == tx0, 1.0, tx1 - tx0), 0.0, 1.0)
        base = grid_start + i * W

        def col(j, acc):
            wx0, wx1 = tabx_ref[wl_start + j], tabx_ref[wl_start + j + 1]
            m = m_th & (wl_q >= wx0) & ((wl_q < wx1)
                                        | ((wx1 == wl_hi)
                                           & (wl_q <= wx1)))
            ww = jnp.clip((wl_q - wx0)
                          / jnp.where(wx1 == wx0, 1.0, wx1 - wx0),
                          0.0, 1.0)
            g00 = taby_ref[base + j]
            g01 = taby_ref[base + j + 1]
            g10 = taby_ref[base + W + j]
            g11 = taby_ref[base + W + j + 1]
            val = ((1.0 - wt) * ((1.0 - ww) * g00 + ww * g01)
                   + wt * ((1.0 - ww) * g10 + ww * g11))
            return acc + jnp.where(m, val, 0.0)

        return jax.lax.fori_loop(0, W - 1, col, acc)

    return jax.lax.fori_loop(0, T - 1, row, jnp.zeros_like(th_q))


def _surface_body(sig, base_sid, t_eps, disc_eps, tag, need_local,
                  rows_ref, rays, lists_ref=None, block=None,
                  col_offset=0,
                  spectral=False, wl=None, tabx_ref=None, taby_ref=None,
                  n_tab=0, extra_q=False, conductor=False,
                  piecewise=False, refr_disp=False, backside_miss=False):
    """Per-surface fori body shared by the plain and fused group kernels:
    running (t, sid) min plus the winner's shading data (global geometric
    normal, optionally local hit point, up-component, optics
    kind*1024+flags and first two params) — carrying these removes the
    per-ray surface-row gather from the shade pass (~12 ms/Mray for random
    gathers of 34-float rows).

    ``tag`` is the group's compile-time quadric class (scene.compile_scene
    group tags): "flat" (plane z=0 — t = -v_z/d_z, no quadratic solve,
    ~3x fewer flops), "parab" (only axx/ayy/bz/c0 nonzero — paraboloids
    and parabolic troughs, the curved-heliostat workhorse), "sphere"
    (axx=ayy=azz, no cross/linear terms), or "quadric" (general
    10-coefficient solve). The specialized ABC/gradient forms cut the
    per-row coefficient products ~3x for parab/sphere groups.

    With ``lists_ref`` (+ ``block``), the loop index is indirected through
    the per-block candidate list (SMEM): s = lists_ref[i, block] — the
    relevancy-culling fast path (culling.build_block_culling).

    ``extra_q`` appends (q2, q3) = winner's raw (p2, p3) to the carry —
    needed by four-parameter optics kinds (Cook-Torrance: alpha, m_n,
    m_k, R_lam). With ``conductor``, K_FRESNEL_CONDUCTOR rows instead
    fill (q2, q3) with n2(wl), k2(wl) interpolated from their chunk
    [p1, p1+p2) / [p1+p2, p1+2*p2) of the shared spectral table (scalar
    lax.cond, so non-conductor rows skip the interpolation); without a
    wavelength thread (wl=None) the lookup still lands on the single
    entry of constant-index chunks. With ``piecewise``,
    K_LAMBERTIAN_PIECEWISE rows fill q2 with the directional absorptance
    interpolated at this candidate's incidence angle (1-D over the theta
    chunk [p0, p0+p1), or bilinear over the (theta, wl) grid when p5 > 0)
    and q3 with the specular probability (constant p2, or interpolated
    from the chunk at p3 when p3 >= 0) — ref piecewise family
    optics_callables.py:331-491."""
    flat = tag == "flat"
    parab = tag == "parab"
    sphere = tag == "sphere"
    px, py, pz, dx, dy, dz = rays
    big = jnp.float32(np.inf)

    if True:
        def body(s_i, carry):
            s = (lists_ref[s_i + col_offset, block]
                 if lists_ref is not None else s_i)
            if extra_q:
                carry, (q2_b, q3_b) = carry[:-2], carry[-2:]
            if need_local:
                (t_best, sid_best, ngx_b, ngy_b, ngz_b, plx_b, ply_b,
                 plz_b, upd_b, kf_b, q0_b, q1_b) = carry
            else:
                (t_best, sid_best, ngx_b, ngy_b, ngz_b,
                 upd_b, kf_b, q0_b, q1_b) = carry
            r = [rows_ref[k, s] for k in range(ROW_F + 6 * len(sig))]

            vz = r[6] * px + r[7] * py + r[8] * pz + r[11]
            ddz = r[6] * dx + r[7] * dy + r[8] * dz

            if flat:
                safeB = jnp.where(ddz == 0.0, 1.0, ddz)
                t_hit = -vz / safeB
                root_ok = jnp.abs(ddz) > 1e-7  # ref flat_surface.py:39
                vx = r[0] * px + r[1] * py + r[2] * pz + r[9]
                vy = r[3] * px + r[4] * py + r[5] * pz + r[10]
                ddx = r[0] * dx + r[1] * dy + r[2] * dz
                ddy = r[3] * dx + r[4] * dy + r[5] * dz
                # L1-norm scale guard (>= L2, safe; saves a sqrt)
                t_thr = t_eps * (1.0 + jnp.abs(vx) + jnp.abs(vy)
                                 + jnp.abs(vz))
                hx = vx + t_hit * ddx
                hy = vy + t_hit * ddy
                hz = jnp.zeros_like(hx)
                ok = root_ok & (t_hit > t_thr)
                if sig:
                    ap = _ap_ok_static(sig, r, hx, hy, hz)
                    if ap is not None:
                        ok = ok & ap
                t_surf = jnp.where(ok, t_hit, big)
                # global geometric normal of the plane = R e_z = row 2 of
                # the stored inverse rotation (R^T)
                gx = jnp.full_like(px, r[6])
                gy = jnp.full_like(px, r[7])
                gz = jnp.full_like(px, r[8])
            else:
                vx = r[0] * px + r[1] * py + r[2] * pz + r[9]
                vy = r[3] * px + r[4] * py + r[5] * pz + r[10]
                ddx = r[0] * dx + r[1] * dy + r[2] * dz
                ddy = r[3] * dx + r[4] * dy + r[5] * dz
                q = r[ROW_QUAD:ROW_QUAD + 10]
                axx, ayy, azz, axy, axz, ayz, bx, by, bz, c0 = q

                if parab:
                    # axis-aligned paraboloid/trough: azz = cross = bx =
                    # by = 0 (compile-time class) — ~3x fewer products
                    A = axx * ddx * ddx + ayy * ddy * ddy
                    B = 2.0 * (axx * ddx * vx + ayy * ddy * vy + bz * ddz)
                    C = (axx * vx * vx + ayy * vy * vy
                         + 2.0 * bz * vz + c0)
                elif sphere:
                    # axx = ayy = azz, no cross/linear terms
                    A = axx * (ddx * ddx + ddy * ddy + ddz * ddz)
                    B = 2.0 * axx * (ddx * vx + ddy * vy + ddz * vz)
                    C = axx * (vx * vx + vy * vy + vz * vz) + c0
                else:
                    A = (axx * ddx * ddx + ayy * ddy * ddy
                         + azz * ddz * ddz
                         + 2.0 * (axy * ddx * ddy + axz * ddx * ddz
                                  + ayz * ddy * ddz))
                    B = 2.0 * (axx * ddx * vx + ayy * ddy * vy
                               + azz * ddz * vz
                               + axy * (ddx * vy + ddy * vx)
                               + axz * (ddx * vz + ddz * vx)
                               + ayz * (ddy * vz + ddz * vy)
                               + bx * ddx + by * ddy + bz * ddz)
                    C = (axx * vx * vx + ayy * vy * vy + azz * vz * vz
                         + 2.0 * (axy * vx * vy + axz * vx * vz
                                  + ayz * vy * vz)
                         + 2.0 * (bx * vx + by * vy + bz * vz) + c0)

                is_lin = A == 0.0
                is_b0 = B == 0.0
                disc = B * B - 4.0 * A * C
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                qq = -0.5 * (B + jnp.where(B >= 0.0, 1.0, -1.0) * sq)
                safeA = jnp.where(is_lin, 1.0, A)
                safeq = jnp.where(qq == 0.0, 1.0, qq)
                mCA = -C / safeA
                sqrt_mCA = jnp.sqrt(jnp.maximum(mCA, 0.0))
                safeB = jnp.where(is_b0, 1.0, B)
                t_lin = -C / safeB

                t0 = jnp.where(is_lin, t_lin,
                               jnp.where(is_b0, -sqrt_mCA, qq / safeA))
                t1 = jnp.where(is_lin, t_lin,
                               jnp.where(is_b0, sqrt_mCA, C / safeq))
                # logical ops, not jnp.where on bools: Mosaic can't lower
                # select_n over i1 vectors
                root_ok = ((is_lin & (jnp.abs(B) > 1e-7))
                           | (~is_lin & is_b0 & (mCA >= 0.0))
                           | (~is_lin & ~is_b0 & (disc >= disc_eps)))

                # scale-relative self-intersection guard
                t_min_thr = t_eps * (1.0 + jnp.sqrt(vx * vx + vy * vy
                                                    + vz * vz))

                def root_t(t):
                    ok = root_ok & (t > t_min_thr)
                    if sig:
                        hhx = vx + t * ddx
                        hhy = vy + t * ddy
                        hhz = vz + t * ddz
                        ap = _ap_ok_static(sig, r, hhx, hhy, hhz)
                        if ap is not None:
                            ok = ok & ap
                    return jnp.where(ok, t, big)

                ta = root_t(t0)
                tb = root_t(t1)
                t_surf = jnp.minimum(ta, tb)
                if backside_miss:
                    # bifacial face selector (F_BACKSIDE_MISS, bit 4 of
                    # the flags word): local +Z arrivals MISS this row —
                    # its pi-flipped twin carries the other face's optics
                    bm = jnp.mod(jnp.floor(r[ROW_KIND] * (1.0 / 16.0)),
                                 2.0) >= 1.0
                    t_surf = jnp.where(bm & (ddz > 0.0), big, t_surf)
                hx = vx + t_surf * ddx
                hy = vy + t_surf * ddy
                hz = vz + t_surf * ddz
                # local quadric gradient at the hit -> global via R = (inv)^T
                if parab:
                    glx = axx * hx
                    gly = ayy * hy
                    glz = bz
                elif sphere:
                    glx = axx * hx
                    gly = axx * hy
                    glz = axx * hz
                else:
                    glx = (axx * hx + axy * hy + axz * hz + bx)
                    gly = (axy * hx + ayy * hy + ayz * hz + by)
                    glz = (axz * hx + ayz * hy + azz * hz + bz)
                gx = r[0] * glx + r[3] * gly + r[6] * glz
                gy = r[1] * glx + r[4] * gly + r[7] * glz
                gz = r[2] * glx + r[5] * gly + r[8] * glz

            upd = t_surf < t_best
            t_best = jnp.where(upd, t_surf, t_best)
            sid_best = jnp.where(upd, s + base_sid, sid_best)
            ngx_b = jnp.where(upd, gx, ngx_b)
            ngy_b = jnp.where(upd, gy, ngy_b)
            ngz_b = jnp.where(upd, gz, ngz_b)
            upd_b = jnp.where(upd, ddz, upd_b)
            kf_b = jnp.where(upd, r[ROW_KIND], kf_b)
            if spectral:
                # q0 carries the EFFECTIVE absorptivity: exact per-lane
                # wavelength interpolation for K_REFLECT_SPECTRAL rows
                # (whose p0/p1 are table start/len, sigma in p2), the
                # constant p0 otherwise. q1 carries the row's sigma.
                is_spec = jnp.floor(r[ROW_KIND] * (1.0 / 1024.0)) == 5.0
                start = r[ROW_P0].astype(jnp.int32)
                length = r[ROW_P0 + 1].astype(jnp.int32)
                q0_new = jax.lax.cond(
                    is_spec,
                    lambda: _interp_row_table(wl, start, length,
                                              tabx_ref, taby_ref, n_tab),
                    lambda: jnp.full_like(px, r[ROW_P0]))
                q1_new = jnp.where(is_spec, r[ROW_P0 + 2], r[ROW_P0 + 1])
                if refr_disp:
                    # DISPERSIVE K_REFRACTIVE rows (materials.
                    # refractive_material; ref Refractive
                    # optics_callables.py:726): p3 = chunk start of the
                    # two n(wl) segments in the shared table, p4/p5
                    # their lengths. q0/q1 then carry the per-lane
                    # n1(wl)/n2(wl) the Fresnel epilogue consumes in
                    # place of the constant p0/p1 fallback.
                    is_rd = ((jnp.floor(r[ROW_KIND] * (1.0 / 1024.0))
                              == 6.0) & (r[ROW_P0 + 5] > 0.0))
                    q1_arr = q1_new * jnp.ones_like(px)

                    def rd_q():
                        st_r = r[ROW_P0 + 3].astype(jnp.int32)
                        L1_r = r[ROW_P0 + 4].astype(jnp.int32)
                        L2_r = r[ROW_P0 + 5].astype(jnp.int32)
                        return (_interp_row_table(wl, st_r, L1_r,
                                                  tabx_ref, taby_ref,
                                                  n_tab),
                                _interp_row_table(wl, st_r + L1_r, L2_r,
                                                  tabx_ref, taby_ref,
                                                  n_tab))

                    q0_new, q1_new = jax.lax.cond(
                        is_rd, rd_q, lambda: (q0_new, q1_arr))
                q0_b = jnp.where(upd, q0_new, q0_b)
                q1_b = jnp.where(upd, q1_new, q1_b)
            else:
                q0_b = jnp.where(upd, r[ROW_P0], q0_b)
                q1_b = jnp.where(upd, r[ROW_P0 + 1], q1_b)
            extra = ()
            if extra_q:
                if conductor or piecewise:
                    wl_c = wl if wl is not None else jnp.zeros_like(px)

                    def default_q():
                        return (jnp.full_like(px, r[ROW_P0 + 2]),
                                jnp.full_like(px, r[ROW_P0 + 3]))
                    q_fn = default_q
                    if piecewise:
                        def lpw_q():
                            # incidence angle against THIS candidate's
                            # normal (g may be an unnormalized gradient)
                            gn = jax.lax.rsqrt(jnp.maximum(
                                gx * gx + gy * gy + gz * gz, 1e-30))
                            cosc = jnp.clip(
                                jnp.abs(dx * gx + dy * gy + dz * gz) * gn,
                                0.0, 1.0)
                            thv = _acos_poly(cosc)
                            th_st = r[ROW_P0].astype(jnp.int32)
                            L_t = r[ROW_P0 + 1].astype(jnp.int32)
                            W_t = r[ROW_P0 + 5].astype(jnp.int32)
                            abs_pw = jax.lax.cond(
                                W_t > 0,
                                lambda: _interp2_row_table(
                                    thv, wl_c, th_st, L_t,
                                    r[ROW_P0 + 4].astype(jnp.int32), W_t,
                                    r[ROW_P0 + 6].astype(jnp.int32),
                                    tabx_ref, taby_ref),
                                lambda: _interp_row_table(
                                    thv, th_st, L_t, tabx_ref, taby_ref,
                                    n_tab))
                            spec_p = jax.lax.cond(
                                r[ROW_P0 + 3] >= 0.0,
                                lambda: _interp_row_table(
                                    thv, r[ROW_P0 + 3].astype(jnp.int32),
                                    L_t, tabx_ref, taby_ref, n_tab),
                                lambda: jnp.full_like(px, r[ROW_P0 + 2]))
                            return abs_pw, spec_p
                        inner_pw = q_fn

                        def piecewise_q(inner=inner_pw):
                            is_lpw = (jnp.floor(r[ROW_KIND]
                                                * (1.0 / 1024.0)) == 11.0)
                            return jax.lax.cond(is_lpw, lpw_q, inner)
                        q_fn = piecewise_q
                    if conductor:
                        inner_fc = q_fn

                        def conductor_q(inner=inner_fc):
                            is_fc = (jnp.floor(r[ROW_KIND]
                                               * (1.0 / 1024.0)) == 10.0)
                            st_c = r[ROW_P0 + 1].astype(jnp.int32)
                            L_c = r[ROW_P0 + 2].astype(jnp.int32)
                            return jax.lax.cond(
                                is_fc,
                                lambda: (_interp_row_table(
                                    wl_c, st_c, L_c, tabx_ref, taby_ref,
                                    n_tab),
                                         _interp_row_table(
                                    wl_c, st_c + L_c, L_c, tabx_ref,
                                    taby_ref, n_tab)),
                                inner)
                        q_fn = conductor_q
                    q2n, q3n = q_fn()
                else:
                    q2n = r[ROW_P0 + 2]
                    q3n = r[ROW_P0 + 3]
                extra = (jnp.where(upd, q2n, q2_b),
                         jnp.where(upd, q3n, q3_b))
            if need_local:
                plx_b = jnp.where(upd, hx, plx_b)
                ply_b = jnp.where(upd, hy, ply_b)
                plz_b = jnp.where(upd, hz, plz_b)
                return (t_best, sid_best, ngx_b, ngy_b, ngz_b, plx_b,
                        ply_b, plz_b, upd_b, kf_b, q0_b, q1_b) + extra
            return (t_best, sid_best, ngx_b, ngy_b, ngz_b,
                    upd_b, kf_b, q0_b, q1_b) + extra

    return body


def _make_kernel(sig, n_surf: int, base_sid: int, t_eps: float,
                 disc_eps: float, tag: str, need_local: bool = True,
                 backside_miss: bool = False):
    """Plain group kernel: fori over surfaces, state carried in/out via
    aliased buffers so multiple groups chain."""
    n_state = N_STATE if need_local else N_STATE_NOLOCAL

    def kernel(rows_ref, px_ref, py_ref, pz_ref, dx_ref, dy_ref, dz_ref,
               *state_refs):
        ins = state_refs[:n_state]
        outs = state_refs[n_state:]
        rays = (px_ref[:], py_ref[:], pz_ref[:],
                dx_ref[:], dy_ref[:], dz_ref[:])
        body = _surface_body(sig, base_sid, t_eps, disc_eps, tag,
                             need_local, rows_ref, rays,
                             backside_miss=backside_miss)
        carry = jax.lax.fori_loop(
            0, n_surf, body, tuple(ref[:] for ref in ins))
        for ref, val in zip(outs, carry):
            ref[:] = val

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("groups", "t_eps", "disc_eps",
                                    "need_local", "backside_miss"))
def nearest_hit_pallas(rows: jnp.ndarray, pos: jnp.ndarray,
                       dirs: jnp.ndarray, groups, t_eps: float,
                       disc_eps: float = 1e-6, need_local: bool = True,
                       backside_miss: bool = False):
    """Nearest hit over all surface groups. rows is the packed, transposed
    (K, S) table (pack_rows); groups a static tuple of (start, end, sig,
    tag). Rays
    (N,3) f32. Returns (t, sid, aux) with aux the winner's shading data:
    dict(normal (N,3) unnormalized global gradient, local (N,3), up_dot
    (N,), kind (N,) i32, flags (N,) i32, p0, p1)."""
    n = pos.shape[0]
    n_pad = -(-n // TILE) * TILE
    pad = n_pad - n

    comps = []
    for a in (pos, dirs):
        for k in range(3):
            c = a[:, k]
            if pad:
                c = jnp.pad(c, (0, pad), constant_values=1.0)
            comps.append(c.reshape(n_pad // LANE, LANE))

    nb = n_pad // TILE
    n_state = N_STATE if need_local else N_STATE_NOLOCAL
    shape2 = (n_pad // LANE, LANE)
    state = [jnp.full(shape2, jnp.inf, dtype=jnp.float32),     # t
             jnp.full(shape2, -1, dtype=jnp.int32)]            # sid
    state += [jnp.zeros(shape2, dtype=jnp.float32)
              for _ in range(n_state - 2)]

    def ray_idx(i, s_ref):  # grid index first, then scalar-prefetch refs
        return (i, 0)

    ray_spec = pl.BlockSpec((SUB, LANE), ray_idx, memory_space=pltpu.VMEM)

    for (start, end, sig, tag) in groups:
        kernel = _make_kernel(sig, end - start, start, t_eps, disc_eps,
                              tag=tag, need_local=need_local,
                              backside_miss=backside_miss)
        # surface rows ride in SMEM (scalar prefetch): per-surface scalar
        # reads are far cheaper there than VMEM vector-lane extracts
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[ray_spec] * (6 + n_state),
            out_specs=tuple([ray_spec] * n_state),
        )
        state = list(pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                            for a in state),
            input_output_aliases={7 + i: i for i in range(n_state)},
        )(rows[:, start:end], *comps, *state))

    flat = [a.reshape(n_pad)[:n] for a in state]
    t, sid = flat[0], flat[1]
    sid = jnp.where(jnp.isfinite(t), sid, -1)
    if need_local:
        local = jnp.stack(flat[5:8], axis=1)
        rest = flat[8:]
    else:
        local = jnp.zeros((n, 3), dtype=jnp.float32)
        rest = flat[5:]
    kf = rest[1].astype(jnp.int32)
    aux = dict(
        normal=jnp.stack(flat[2:5], axis=1),
        local=local,
        up_dot=rest[0],
        kind=kf // 1024,
        flags=kf % 1024,
        p0=rest[2],
        p1=rest[3],
    )
    return t, sid, aux


# ---------------------------------------------------------------------------
# Fused bounce kernel for pure-specular scenes (the heliostat-field class of
# workloads): intersect + reflect + slope error + one-sided kill in ONE
# kernel, so the ray state makes a single HBM round trip per bounce. Used
# when every surface is K_REFLECT (kernels/../engine gates on the scene's
# static kinds_present). RNG comes from the per-core Pallas PRNG.
# ---------------------------------------------------------------------------

def media_flags(media):
    """(any attenuation, any scattering) of a static media pair — the
    single source for the kernel compile gates (scat output presence,
    attenuation code) and the engine's accounting/scat-mask conditions,
    so the kernel output layout and its consumers cannot desynchronize."""
    if media is None:
        return False, False
    return (any(a_m > 0.0 for (a_m, _, _) in media[0]),
            any(s_m > 0.0 for (_, s_m, _) in media[0]))


def _make_shade_epilogue(bivar, one_sided: bool, slope: bool,
                         lambertian: bool = False,
                         ambient_att: float = 0.0,
                         refractive: bool = False,
                         cook_torrance: bool = False,
                         lam_specular: bool = False,
                         semi_lambertian: bool = False,
                         transparent: bool = False,
                         conductor: bool = False,
                         iam: bool = False,
                         periodic: bool = False,
                         piecewise: bool = False,
                         refr_frost: bool = False,
                         refr_split: bool = False,
                         ambient_scat: float = 0.0,
                         ambient_g: float = 0.0,
                         media=None):
    """Reflect + slope error + one-sided kill on the carried winner data.
    The per-core PRNG must already be seeded by the caller.

    ``bivar`` is three-state: True (every slope-error surface uses the
    bivariate tan-Gaussian model), False (all radial), or "mixed" — the
    error model is then selected per lane from the carried flags word
    (F_BIVAR bit), matching shade.py:205's per-surface selection.

    ``lambertian`` additionally compiles the diffuse branch: lanes whose
    winner kind is K_LAMBERTIAN leave in a cosine-weighted direction about
    the (unperturbed) shading normal, within the surface's ang_range
    (carried as q1), matching shade.py's d_lambert.

    ``ambient_att`` > 0 compiles Beer-Lambert attenuation of every hit
    segment in a homogeneous ambient medium (the engine recovers the
    medium loss from e_before - absorbed - e_out, so no extra output).

    ``refractive`` compiles the Fresnel-interface branch: lanes whose
    winner kind is K_REFRACTIVE toggle between the carried n1/n2
    (q0/q1) against their per-lane index ``ri``, Russian-roulette
    between reflection (w.p. the unpolarized Fresnel R, forced on TIR)
    and vector-Snell refraction about the UNPERTURBED normal, carry no
    interface absorption, and update ri on crossing — the megakernel
    twin of shade.py's K_REFRACTIVE branch (ref RefractiveHomogenous
    optics_callables.py:1186, single-ray mode :1254). The epilogue then
    takes/returns the extra ``ri`` lane component.

    ``cook_torrance`` compiles the microfacet-BDRF branch: lanes whose
    winner kind is K_COOK_TORRANCE sample a Beckmann half-vector about
    the unperturbed normal, reflect about it, and weight the survival
    energy by the importance-sampling throughput R_lam*F*G*|d.h| /
    (|n.d||n.h|) with the conductor Fresnel F of the carried complex
    index m_n + i m_k (q1/q2) — the megakernel twin of shade.py's
    K_COOK_TORRANCE branch (ref BDRF_Cook_Torrance_isotropic
    optics_callables.py:630). Needs the four-parameter carry
    (q2_b/q3_b = m_k/R_lam; alpha rides in q0, m_n in q1).

    ``lam_specular`` compiles K_LAMBERTIAN_SPECULAR lanes (specularity in
    q1, slope sigma in q2 — needs the four-parameter carry): w.p. q1 the
    (slope-perturbed) specular reflection, else full-hemisphere
    cosine-weighted diffuse (ref LambertianSpecular :553).
    ``semi_lambertian`` compiles K_SEMI_LAMBERTIAN lanes (ang_range in
    q1): diffuse below ang_range incidence, specular at glancing (ref
    SemiLambertian :506). ``transparent`` passes K_TRANSPARENT lanes
    through undeflected (ref Transparent :93).

    ``conductor`` compiles K_FRESNEL_CONDUCTOR lanes (needs the
    four-parameter carry: n1 in q0, n2(wl)/k2(wl) in q2/q3 from the
    surface loop's in-kernel interpolation): specular reflection about
    the unperturbed normal with the randomly-polarized Fresnel-conductor
    absorptivity 1 - (R_p + R_s)/2 — the megakernel twin of shade.py's
    K_FRESNEL_CONDUCTOR branch (ref FresnelConductorHomogenous
    optics_callables.py:1523, optics.fresnel_to_attenuating inlined in
    real arithmetic). ``iam`` multiplies the winner absorptivity of
    F_IAM-flagged lanes by the Martin-Ruiz modifier
    (1-exp(-cos/a_r))/(1-exp(-1/a_r)) with a_r carried in q2 (pack_rows
    mirrors p4 there for reflective/Lambertian bases; ref IAM :271).
    ``periodic`` compiles K_PERIODIC lanes (period in q0): teleport along
    the flipped normal, direction and energy unchanged (ref
    PeriodicBoundary :690).

    ``piecewise`` compiles K_LAMBERTIAN_PIECEWISE lanes (needs the
    four-parameter carry: the surface loop interpolates the directional
    absorptance into q2 and the specular probability into q3 at each
    candidate's own incidence angle): w.p. q3 the specular reflection
    (no slope error — the ref piecewise family has none), else
    full-hemisphere cosine diffuse; absorbs q2 (ref
    optics_callables.py:331-491).

    ``ambient_scat`` > 0 compiles VOLUMETRIC SCATTERING in a homogeneous
    ambient participating medium (the megakernel twin of the engine's
    general-path volumetrics, engine.py _bounce_step; ref Scattering
    optics_callables.py:946): each round samples an exponential free path
    -ln(u)/sigma_s per lane; lanes whose free path ends before their
    surface hit (or that would have escaped) scatter there instead —
    position moves to the event point, the direction redraws from the
    Henyey-Greenstein phase function with static asymmetry ``ambient_g``,
    Beer-Lambert attenuation (``ambient_att``) applies over the traversed
    distance, and NO surface absorption occurs. The epilogue then returns
    an extra trailing ``scat`` mask; the kernel reports scattered live
    lanes as sid == -2 (alive, no surface). The exponential free path is
    memoryless, so re-sampling every round is statistically identical to
    the reference's remaining-path carry-over (optics.py:214).

    ``media`` compiles PER-SURFACE-TOGGLED volumetric media (the
    megakernel twin of the general path's per-ray (att, scat, g) bundle
    state; ref Absorbant/Scattering used as volume boundaries through
    RefractiveHomogenous's medium tuple, optics_callables.py:861-1036,
    materials.absorbant_interface/scattering_interface). It is a static
    pair ``(media_tab, media_rows)``: ``media_tab[k] = (att, scat, g)``
    of medium id k (id 0 = the ambient medium — the caller folds the
    spec's ambient coefficients there, and the static
    ``ambient_att``/``ambient_scat`` are IGNORED); ``media_rows`` maps
    each K_REFRACTIVE row sid to its (side-1 id, side-2 id). The
    epilogue then takes per-lane ``mid`` (medium id, f32) and the winner
    ``sid_b``, draws free paths / HG angles / Beer-Lambert with the
    LANE's medium, toggles ``mid`` on interface crossings (index-matched
    interfaces compare ids, the id twin of shade.py's tuple compare),
    and returns the new ``mid`` between the refraction-index and scat
    outputs. Requires ``refractive``.

    ``refr_split`` compiles TRUE ENERGY SPLITTING for F_SPLIT-flagged
    refractive rows (bit 3 of the flags word; materials single_ray=False,
    ref Refractive optics_callables.py:732): instead of Russian roulette,
    the primary lane always takes the refracted branch at (1-R) E and the
    reflected branch leaves with R E through four extra trailing outputs
    (s_e, s_dx, s_dy, s_dz) for the engine's overflow machinery
    (_trace_streaming_general). On TIR R = 1: all energy leaves on the
    reflected secondary and the primary dies. Non-F_SPLIT refractive
    rows in the same scene keep rouletting. The kernel twin of
    shade.py's split_mode branch. Requires ``refractive``."""
    if refr_split:
        assert refractive, "refr_split rides the refractive epilogue"
    media_tab = media_rows = None
    media_att_on, media_scat_on = media_flags(media)
    if media is not None:
        assert refractive, "media mode rides the refractive epilogue"
        media_tab, media_rows = media

    def epilogue(t_b, ng_x, ng_y, ng_z, upd_b, kf_b, q0_b, q1_b,
                 px, py, pz, dx, dy, dz, e_in, ri=None,
                 q2_b=None, q3_b=None, mid=None, sid_b=None):
        hit = jnp.isfinite(t_b)
        t_safe = jnp.where(hit, t_b, 0.0)
        hx = px + t_safe * dx
        hy = py + t_safe * dy
        hz = pz + t_safe * dz

        # shading normal: normalize carried gradient, flip against the ray
        g2 = ng_x * ng_x + ng_y * ng_y + ng_z * ng_z
        rinv = jax.lax.rsqrt(jnp.maximum(g2, 1e-30))
        cos_g = dx * ng_x + dy * ng_y + dz * ng_z
        flip = jnp.where(cos_g > 0.0, -rinv, rinv)
        nx, ny, nz = ng_x * flip, ng_y * flip, ng_z * flip
        n0x, n0y, n0z = nx, ny, nz   # pre-slope-error shading normal

        def rot_about(ax_x, ax_y, ax_z, ex, ey, ez):
            """Rotate a +Z-sampled vector into the frame whose Z is the
            given axis (branchless rotation_to_z)."""
            pn = jnp.sqrt(jnp.maximum(ax_x * ax_x + ax_y * ax_y, 1e-30))
            sing = pn < 1e-6
            perp_x = jnp.where(sing, 1.0, ax_y / pn)
            perp_y = jnp.where(sing, 0.0, -ax_x / pn)
            yc_x = -ax_z * perp_y
            yc_y = ax_z * perp_x
            yc_z = ax_x * perp_y - ax_y * perp_x
            mx = ex * perp_x + ey * yc_x + ez * ax_x
            my = ex * perp_y + ey * yc_y + ez * ax_y
            mz = ey * yc_z + ez * ax_z
            mr = jax.lax.rsqrt(jnp.maximum(mx * mx + my * my + mz * mz,
                                           1e-30))
            return mx * mr, my * mr, mz * mr

        m_att = m_scat = m_g = nmid = None
        if media is not None:
            # per-lane medium values from the lane's medium id (masked
            # accumulation over the small static table — no gathers)
            m_att = jnp.zeros_like(px)
            m_scat = jnp.zeros_like(px)
            m_g = jnp.zeros_like(px)
            for k_m, (a_m, s_m, g_m) in enumerate(media_tab):
                sel_m = mid == jnp.float32(k_m)
                m_att = jnp.where(sel_m, jnp.float32(a_m), m_att)
                m_scat = jnp.where(sel_m, jnp.float32(s_m), m_scat)
                m_g = jnp.where(sel_m, jnp.float32(g_m), m_g)
            nmid = mid

        scat = None
        if (ambient_scat > 0.0 and media is None) or media_scat_on:
            # exponential free path in the lane's medium; preempts the
            # surface hit when shorter (and catches would-be escapes:
            # t_b = +inf there, so free < t_b almost surely)
            u_f = _kernel_uniform(px.shape)
            logu = -jnp.log(jnp.maximum(u_f, jnp.float32(1e-12)))
            if media is not None:
                scat_able = m_scat > 0.0
                free = jnp.where(
                    scat_able,
                    logu / jnp.where(scat_able, m_scat, 1.0),
                    jnp.float32(np.inf))
            else:
                free = logu * jnp.float32(1.0 / ambient_scat)
            scat = free < t_b
            # Henyey-Greenstein polar angle about the travel direction
            u_s = _kernel_uniform(px.shape)
            u_p = _kernel_uniform(px.shape)
            if media is not None:
                # per-lane asymmetry: branchless general HG inverse CDF
                sg = u_s * 2.0 - 1.0
                iso = jnp.abs(m_g) < 1e-9
                safe_g = jnp.where(iso, 1.0, m_g)
                frac = (1.0 - m_g * m_g) / (1.0 + m_g * sg)
                cos_sc = jnp.where(
                    iso, sg,
                    jnp.clip((1.0 + m_g * m_g - frac * frac)
                             * (0.5 / safe_g), -1.0, 1.0))
            else:
                g = float(ambient_g)
                if abs(g) < 1e-9:
                    cos_sc = u_s * 2.0 - 1.0
                else:
                    sg = u_s * 2.0 - 1.0
                    frac = jnp.float32(1.0 - g * g) \
                        / (1.0 + jnp.float32(g) * sg)
                    cos_sc = (jnp.float32(1.0 + g * g) - frac * frac) \
                        * jnp.float32(0.5 / g)
                    cos_sc = jnp.clip(cos_sc, -1.0, 1.0)
            sin_sc = jnp.sqrt(jnp.maximum(1.0 - cos_sc * cos_sc, 0.0))
            s_sp, c_sp = _sincos_turns(u_p)
            sdx, sdy, sdz = rot_about(dx, dy, dz,
                                      sin_sc * c_sp, sin_sc * s_sp, cos_sc)

        is_refr = None
        if refractive:
            is_refr = jnp.floor(kf_b * (1.0 / 1024.0)) == 6.0
        is_ct = None
        if cook_torrance:
            is_ct = jnp.floor(kf_b * (1.0 / 1024.0)) == 9.0
        is_fc = None
        if conductor:
            is_fc = jnp.floor(kf_b * (1.0 / 1024.0)) == 10.0
        is_lpw = None
        if piecewise:
            is_lpw = jnp.floor(kf_b * (1.0 / 1024.0)) == 11.0
        if slope:
            def uniform():
                return _kernel_uniform(px.shape)
            u1, u2 = uniform(), uniform()
            rr = jnp.sqrt(-2.0 * jnp.log(u1))
            s_bm, c_bm = _sincos_turns(u2)
            nrm1 = rr * c_bm
            sigma = q1_b
            if lambertian:
                # Lambertian lanes carry ang_range in q1, not a slope
                # sigma; their direction is replaced below anyway
                is_lam_s = jnp.floor(kf_b * (1.0 / 1024.0)) == 2.0
                sigma = jnp.where(is_lam_s, 0.0, sigma)
            if refractive:
                # refractive lanes carry n2 in q1, not a slope sigma;
                # FROSTED interfaces (ref Refractive sigma=...,
                # optics_callables.py:732) carry their sigma in q2 (p2)
                # and perturb the interface normal like the host path's
                # n_eff (shade.py) — rows without F_BIVAR draw the
                # radial model, exactly the reference's normal(th)/phi
                sigma = jnp.where(is_refr,
                                  q2_b if refr_frost else 0.0, sigma)
            if cook_torrance:
                # Cook-Torrance lanes carry m_n in q1, not a slope sigma
                sigma = jnp.where(is_ct, 0.0, sigma)
            if lam_specular:
                # LambertianSpecular carries specularity in q1; its slope
                # sigma (for the specular branch) rides in q2 (p2)
                is_ls_s = jnp.floor(kf_b * (1.0 / 1024.0)) == 3.0
                sigma = jnp.where(is_ls_s, q2_b, sigma)
            if semi_lambertian:
                # SemiLambertian carries ang_range in q1, no slope error
                is_sl_s = jnp.floor(kf_b * (1.0 / 1024.0)) == 4.0
                sigma = jnp.where(is_sl_s, 0.0, sigma)
            if conductor:
                # conductor lanes carry their table start in q1, no
                # slope error (ref FresnelConductorHomogenous has none)
                sigma = jnp.where(is_fc, 0.0, sigma)
            if piecewise:
                # piecewise lanes carry their table length in q1, no
                # slope error (the ref piecewise family has none)
                sigma = jnp.where(is_lpw, 0.0, sigma)
            if bivar in (True, "mixed"):
                nrm2 = rr * s_bm
                s_tx, c_tx = _sincos_rad(nrm1 * sigma)
                s_ty, c_ty = _sincos_rad(nrm2 * sigma)
                # tan = s/c; the polynomial cos can land on EXACTLY 0 at
                # odd quarter-turns (unlike correctly-rounded cos), and
                # inf * rsqrt(inf) below would poison the slab with NaN —
                # clip to tan(~89.99994 deg), far beyond any physical
                # slope error (s and c are never both 0, so no 0/0)
                tx = jnp.clip(s_tx / c_tx, -1e6, 1e6)
                ty = jnp.clip(s_ty / c_ty, -1e6, 1e6)
                bvz = jax.lax.rsqrt(1.0 + tx * tx + ty * ty)
                bvx, bvy = tx * bvz, ty * bvz
            if bivar in (False, "mixed"):
                u3 = uniform()
                s_th, c_th = _sincos_rad(nrm1 * sigma)
                s_ph, c_ph = _sincos_turns(u3)
                rdx, rdy, rdz = s_th * c_ph, s_th * s_ph, c_th
            if bivar == "mixed":
                # per-lane error model from the carried flags word:
                # F_BIVAR is bit 1, so (kf mod 4) >= 2 tests exactly it
                is_bv = jnp.mod(kf_b, 4.0) >= 2.0
                ex = jnp.where(is_bv, bvx, rdx)
                ey = jnp.where(is_bv, bvy, rdy)
                ez = jnp.where(is_bv, bvz, rdz)
            elif bivar:
                ex, ey, ez = bvx, bvy, bvz
            else:
                ex, ey, ez = rdx, rdy, rdz
            # rotate the error vector into the frame whose z is the normal
            nx, ny, nz = rot_about(nx, ny, nz, ex, ey, ez)

        dn = dx * nx + dy * ny + dz * nz
        rx = dx - 2.0 * dn * nx
        ry = dy - 2.0 * dn * ny
        rz = dz - 2.0 * dn * nz

        nri = ri
        q0_eff = q0_b
        if refractive:
            # Fresnel interface about the (possibly slope-perturbed)
            # flipped normal (c1 = d.n < 0) — identical to n0 unless the
            # row is frosted (sigma forced to 0 otherwise). Mirrors
            # optics.refractions/fresnel and the shade.py nearest-match
            # medium toggle exactly (shade.py uses n_eff the same way).
            n1s, n2s = q0_b, q1_b
            in1 = jnp.abs(ri - n1s) <= jnp.abs(ri - n2s)
            if media is not None:
                # index-matched interfaces (n1 == n2: pure volume
                # boundaries, materials.absorbant_interface) cannot
                # toggle on the index — compare the lane's medium id to
                # the winner row's side-1 id instead (the id twin of
                # shade.py's per-component medium-tuple compare)
                mid1_l = jnp.zeros_like(px)
                mid2_l = jnp.zeros_like(px)
                for (s_r, i1_r, i2_r) in media_rows:
                    sel_r = sid_b == s_r
                    mid1_l = jnp.where(sel_r, jnp.float32(i1_r), mid1_l)
                    mid2_l = jnp.where(sel_r, jnp.float32(i2_r), mid2_l)
                # logical ops, not jnp.where on bools: Mosaic can't lower
                # select_n over i1 vectors (it round-trips through i8 and
                # fails on the i8->i1 trunci)
                idx_diff = jnp.abs(n1s - n2s) > 1e-9
                in1 = (idx_diff & in1) | (~idx_diff & (mid == mid1_l))
            n_next = jnp.where(in1, n2s, n1s)
            safe_ri = jnp.where(ri == 0.0, 1.0, ri)
            safe_nx = jnp.where(n_next == 0.0, 1.0, n_next)
            nrat = safe_nx / safe_ri                  # n2/n1
            c1 = dx * nx + dy * ny + dz * nz
            refr_ok = c1 * c1 >= 1.0 - nrat * nrat
            inv_nr = 1.0 / nrat
            cos2 = jnp.sqrt(jnp.maximum(
                1.0 - (1.0 - c1 * c1) * inv_nr * inv_nr, 0.0))
            sgn = jnp.where(c1 < 0.0, -1.0, 1.0)
            tx = (dx - c1 * nx) * inv_nr + nx * cos2 * sgn
            ty = (dy - c1 * ny) * inv_nr + ny * cos2 * sgn
            tz = (dz - c1 * nz) * inv_nr + nz * cos2 * sgn
            # unpolarized Fresnel R (optics.fresnel); R = 1 on TIR
            cos1a = jnp.abs(c1)
            under = 1.0 - (safe_ri / safe_nx) ** 2 * (1.0 - cos1a * cos1a)
            bar = jnp.sqrt(jnp.maximum(under, 0.0))
            Rs = ((safe_ri * cos1a - safe_nx * bar)
                  / (safe_ri * cos1a + safe_nx * bar)) ** 2
            Rp = ((safe_ri * bar - safe_nx * cos1a)
                  / (safe_ri * bar + safe_nx * cos1a)) ** 2
            R = jnp.where(refr_ok & (under >= 0.0), 0.5 * (Rs + Rp), 1.0)
            go_reflect = _kernel_uniform(px.shape) <= R
            r_split = None
            if refr_split:
                # F_SPLIT rows (flags bit 3): the primary always takes
                # the refracted branch; the reflected branch leaves with
                # R E through the dedicated split outputs (on TIR R = 1,
                # so the primary keeps zero energy and dies) — the
                # kernel twin of shade.py's split_mode branch. Save the
                # pure reflected direction before `crossed` overwrites
                # it with the refracted one.
                split_b = is_refr & hit & (jnp.mod(kf_b, 16.0) >= 8.0)
                s_rdx, s_rdy, s_rdz = rx, ry, rz
                go_reflect = go_reflect & ~split_b
                r_split = jnp.where(split_b, R, 0.0)
            crossed = is_refr & hit & ~go_reflect
            rx = jnp.where(crossed, tx, rx)
            ry = jnp.where(crossed, ty, ry)
            rz = jnp.where(crossed, tz, rz)
            nri = jnp.where(crossed, n_next, ri)
            if media is not None:
                # crossing lanes pick up the entered medium's id
                nmid = jnp.where(crossed,
                                 jnp.where(in1, mid2_l, mid1_l), mid)
            # no interface absorption: Russian roulette keeps full energy
            q0_eff = jnp.where(is_refr, 0.0, q0_b)

        if cook_torrance:
            # Beckmann-sampled microfacet reflection about the unperturbed
            # normal n0; throughput weight R_lam*F*G*|d.h|/(|n.d||n.h|)
            # (shade.py's K_COOK_TORRANCE branch, verbatim math). Rays
            # reflected below the surface (d_ct.n <= 0) are absorbed.
            alpha_ct, mn_ct, mk_ct, rl_ct = q0_b, q1_b, q2_b, q3_b
            u_ct = _kernel_uniform(px.shape)
            u_pc = _kernel_uniform(px.shape)
            tan2 = -alpha_ct * alpha_ct * jnp.log(u_ct)
            cos_h = jax.lax.rsqrt(1.0 + tan2)
            sin_h = jnp.sqrt(jnp.maximum(1.0 - cos_h * cos_h, 0.0))
            s_pc, c_pc = _sincos_turns(u_pc)
            hvx, hvy, hvz = rot_about(n0x, n0y, n0z,
                                      sin_h * c_pc, sin_h * s_pc, cos_h)
            d_h = dx * hvx + dy * hvy + dz * hvz
            cdx = dx - 2.0 * d_h * hvx
            cdy = dy - 2.0 * d_h * hvy
            cdz = dz - 2.0 * d_h * hvz
            v_dot_h = jnp.abs(d_h)
            n_dot_v = jnp.maximum(
                jnp.abs(dx * n0x + dy * n0y + dz * n0z), 1e-6)
            n_dot_h = jnp.maximum(
                jnp.abs(hvx * n0x + hvy * n0y + hvz * n0z), 1e-6)
            n_dot_l = cdx * n0x + cdy * n0y + cdz * n0z
            # conductor Fresnel at the half-vector angle (n1 = 1), inlined
            # real-arithmetic fresnel_to_attenuating (optics.py:39):
            # cos th1 = |d.h|, sin^2 = 1 - cos^2, tan = sin/cos
            c1f = jnp.clip(v_dot_h, 1e-6, 1.0)
            s1sq = 1.0 - c1f * c1f
            bq = mn_ct * mn_ct - mk_ct * mk_ct - s1sq
            aq = jnp.sqrt(bq * bq + 4.0 * (mn_ct * mk_ct) ** 2)
            pq = jnp.sqrt(jnp.maximum(0.5 * (aq + bq), 0.0))
            qq_f = jnp.sqrt(jnp.maximum(0.5 * (aq - bq), 0.0))
            R_s = (((c1f - pq) ** 2 + qq_f * qq_f)
                   / ((c1f + pq) ** 2 + qq_f * qq_f))
            st = s1sq / c1f   # sin*tan
            R_p = (((pq - st) ** 2 + qq_f * qq_f)
                   / ((pq + st) ** 2 + qq_f * qq_f)) * R_s
            F_ct = 0.5 * (R_p + R_s)
            vh_s = jnp.maximum(v_dot_h, 1e-6)
            G_ct = jnp.minimum(1.0, jnp.minimum(
                2.0 * n_dot_h * n_dot_v / vh_s,
                2.0 * n_dot_h * jnp.abs(n_dot_l) / vh_s))
            w_ct = rl_ct * F_ct * G_ct * v_dot_h / (n_dot_v * n_dot_h)
            w_ct = jnp.where(n_dot_l > 0.0, jnp.clip(w_ct, 0.0, 1.0), 0.0)
            rx = jnp.where(is_ct, cdx, rx)
            ry = jnp.where(is_ct, cdy, ry)
            rz = jnp.where(is_ct, cdz, rz)
            q0_eff = jnp.where(is_ct, 1.0 - w_ct, q0_eff)

        if conductor:
            # randomly-polarized Fresnel reflectance against the complex
            # index n2 + i k2 relative to the outside n1 (q0), evaluated
            # at the winner's incidence cosine about the UNPERTURBED
            # normal; direction is the default specular reflection
            # (sigma = 0 above). Real-arithmetic twin of
            # optics.fresnel_to_attenuating (Modest ch.2):
            # s1 = n1 sin(th1), st = s1 tan(th1) = s1sq / (n1 cos th1).
            n1c = jnp.where(q0_b > 0.0, q0_b, 1.0)
            cfc = jnp.clip(jnp.abs(dx * n0x + dy * n0y + dz * n0z),
                           1e-6, 1.0)
            n2c, k2c = q2_b, q3_b
            s1sq = n1c * n1c * (1.0 - cfc * cfc)
            bqc = n2c * n2c - k2c * k2c - s1sq
            aqc = jnp.sqrt(bqc * bqc + 4.0 * (n2c * k2c) ** 2)
            pqc = jnp.sqrt(jnp.maximum(0.5 * (aqc + bqc), 0.0))
            qqc = jnp.sqrt(jnp.maximum(0.5 * (aqc - bqc), 0.0))
            c1c = n1c * cfc
            R_sc = (((c1c - pqc) ** 2 + qqc * qqc)
                    / ((c1c + pqc) ** 2 + qqc * qqc))
            stc = s1sq / c1c
            R_pc = (((pqc - stc) ** 2 + qqc * qqc)
                    / ((pqc + stc) ** 2 + qqc * qqc)) * R_sc
            R_c = jnp.clip(0.5 * (R_pc + R_sc), 0.0, 1.0)
            q0_eff = jnp.where(is_fc, 1.0 - R_c, q0_eff)

        if piecewise:
            # winner absorptance was interpolated at the incidence angle
            # inside the surface loop (q2)
            q0_eff = jnp.where(is_lpw, q2_b, q0_eff)

        if iam:
            # Martin-Ruiz incidence-angle modifier on F_IAM lanes (bit 2
            # of the flags word: kf mod 8 >= 4); a_r rides in q2 — except
            # on LambertianSpecular bases, whose q2 holds the
            # specular-branch sigma, so pack_rows mirrors their a_r to q3.
            # ``iam`` may carry the scene's STATIC Martin-Ruiz exponent c
            # (a float; True == 1.0, compile_scene guarantees one value
            # per fused scene): c != 1 bakes cos^c = exp(c ln cos) —
            # Mosaic lowers exp/log but not pow (ref optics_callables.py
            # :271-329, the c parameter round 4 only applied on the
            # general path)
            has_iam = jnp.mod(kf_b, 8.0) >= 4.0
            cosi = jnp.abs(dx * n0x + dy * n0y + dz * n0z)
            c_exp = 1.0 if iam is True else float(iam)
            if c_exp != 1.0:
                cosi = jnp.exp(c_exp
                               * jnp.log(jnp.maximum(cosi, 1e-30)))
            a_raw = q2_b
            if lam_specular:
                a_raw = jnp.where(
                    jnp.floor(kf_b * (1.0 / 1024.0)) == 3.0, q3_b, a_raw)
            a_r = jnp.where(a_raw > 0.0, a_raw, 1.0)
            iam_f = ((1.0 - jnp.exp(-cosi / a_r))
                     / (1.0 - jnp.exp(-1.0 / a_r)))
            q0_eff = jnp.where(has_iam, q0_eff * iam_f, q0_eff)

        if lambertian or lam_specular or semi_lambertian or piecewise:
            # cosine-weighted diffuse about the unperturbed normal within
            # ang_range (shade.py d_lambert; ref Lambertian :143) —
            # shared by the pure-Lambertian lanes, the diffuse branch of
            # LambertianSpecular (full hemisphere), and the
            # below-ang_range branch of SemiLambertian
            kq = jnp.floor(kf_b * (1.0 / 1024.0))
            ul1 = _kernel_uniform(px.shape)
            ul2 = _kernel_uniform(px.shape)
            sin_cap, cos_cap = _sincos_rad(q1_b)
            if lam_specular:
                sin_cap = jnp.where(kq == 3.0, 1.0, sin_cap)
            if piecewise:
                # piecewise q1 is the table length; diffuse branch is
                # full-hemisphere (ref pillbox ang_range = pi/2)
                sin_cap = jnp.where(kq == 11.0, 1.0, sin_cap)
            sinsq = sin_cap * jnp.sqrt(ul1)
            s_pl, c_pl = _sincos_turns(ul2)
            lz = jnp.sqrt(jnp.maximum(1.0 - sinsq * sinsq, 0.0))
            ldx, ldy, ldz = rot_about(n0x, n0y, n0z,
                                      sinsq * c_pl, sinsq * s_pl, lz)
            go_diff = jnp.zeros_like(hit)
            if lambertian:
                go_diff = go_diff | (kq == 2.0)
            if lam_specular:
                # w.p. specularity (q1) keep the specular reflection
                u_ch = _kernel_uniform(px.shape)
                go_diff = go_diff | ((kq == 3.0) & (u_ch >= q1_b))
            if semi_lambertian:
                # incidence angle <= ang_range  <=>  cos >= cos(ang_range)
                # (Mosaic has no acos lowering; cos is monotone on [0, pi])
                cos_in = jnp.abs(dx * n0x + dy * n0y + dz * n0z)
                go_diff = go_diff | ((kq == 4.0) & (cos_in >= cos_cap))
            if piecewise:
                # w.p. the interpolated specular probability (q3) keep
                # the specular reflection, else diffuse
                u_pw = _kernel_uniform(px.shape)
                go_diff = go_diff | ((kq == 11.0) & (u_pw >= q3_b))
            rx = jnp.where(go_diff, ldx, rx)
            ry = jnp.where(go_diff, ldy, ry)
            rz = jnp.where(go_diff, ldz, rz)

        if transparent:
            # pass through undeflected, no surface absorption (q0 = 0 by
            # construction for K_TRANSPARENT rows)
            is_tr = jnp.floor(kf_b * (1.0 / 1024.0)) == 0.0
            rx = jnp.where(is_tr, dx, rx)
            ry = jnp.where(is_tr, dy, ry)
            rz = jnp.where(is_tr, dz, rz)

        if periodic:
            # teleport by the period (q0) along the flipped-against-ray
            # shading normal, direction unchanged, no absorption — the
            # megakernel twin of shade.py's K_PERIODIC branch (ref
            # PeriodicBoundary optics_callables.py:690)
            is_pd = jnp.floor(kf_b * (1.0 / 1024.0)) == 7.0
            hx = jnp.where(is_pd, hx + q0_b * n0x, hx)
            hy = jnp.where(is_pd, hy + q0_b * n0y, hy)
            hz = jnp.where(is_pd, hz + q0_b * n0z, hz)
            rx = jnp.where(is_pd, dx, rx)
            ry = jnp.where(is_pd, dy, ry)
            rz = jnp.where(is_pd, dz, rz)
            q0_eff = jnp.where(is_pd, 0.0, q0_eff)

        e_att = e_in
        if (ambient_att > 0.0 and media is None) or media_att_on:
            travel = t_safe
            att_on = hit
            if scat is not None:
                travel = jnp.where(scat, free, t_safe)
                att_on = hit | scat
            coeff = (m_att if media is not None
                     else jnp.float32(ambient_att))
            e_att = jnp.where(att_on,
                              e_in * jnp.exp(-coeff * travel), e_in)
        e_out = e_att * (1.0 - q0_eff)
        if one_sided:
            # F_ONE_SIDED is bit 0 of the flags word (kind*1024 + flags,
            # 1024 even): (kf mod 2) >= 1 extracts exactly that bit, so
            # two-sided surfaces with other flags set (e.g. F_BIVAR) are
            # NOT killed on back-face hits (matches shade.py's
            # `flags & M.F_ONE_SIDED` test)
            kill = (jnp.mod(kf_b, 2.0) >= 1.0) & (upd_b > 0.0)
            e_out = jnp.where(kill, 0.0, e_out)
        # surface absorption only; ambient loss = e_in - e_att stays
        # implicit (engine: medium = e_before - absorbed - e_out on hits)
        absorbed = jnp.where(hit, e_att - e_out, 0.0)

        npx = jnp.where(hit, hx, px)
        npy = jnp.where(hit, hy, py)
        npz = jnp.where(hit, hz, pz)
        ndx = jnp.where(hit, rx, dx)
        ndy = jnp.where(hit, ry, dy)
        ndz = jnp.where(hit, rz, dz)
        ne = jnp.where(hit, e_out, e_in)
        if scat is not None:
            # scattering preempts the surface interaction: move to the
            # event point, take the HG direction, keep the attenuated
            # energy, absorb nothing at a surface
            npx = jnp.where(scat, px + free * dx, npx)
            npy = jnp.where(scat, py + free * dy, npy)
            npz = jnp.where(scat, pz + free * dz, npz)
            ndx = jnp.where(scat, sdx, ndx)
            ndy = jnp.where(scat, sdy, ndy)
            ndz = jnp.where(scat, sdz, ndz)
            ne = jnp.where(scat, e_att, ne)
            absorbed = jnp.where(scat, 0.0, absorbed)
            if refractive:
                nri = jnp.where(scat, ri, nri)
            if media is not None:
                # a scattering event stays inside the lane's medium
                nmid = jnp.where(scat, mid, nmid)
        if refr_split:
            # the reflected branch's share of the post-interaction
            # energy; a scattering event preempts the surface hit, so
            # no secondary is emitted there (ne already reset to e_att)
            s_e = jnp.where(hit, ne * r_split, 0.0)
            if scat is not None:
                s_e = jnp.where(scat, 0.0, s_e)
            ne = ne - s_e
        outs = (npx, npy, npz, ndx, ndy, ndz, ne, absorbed)
        if refractive:
            outs = outs + (nri,)
        if media is not None:
            outs = outs + (nmid,)
        if scat is not None:
            outs = outs + (scat,)
        if refr_split:
            outs = outs + (s_e, s_rdx, s_rdy, s_rdz)
        return outs

    return epilogue


# --- PRNG indirection (tests only) ------------------------------------
# JAX's TPU interpret mode (pltpu.force_tpu_interpret_mode) stubs
# prng_random_bits to ZEROS (jax/_src/pallas/mosaic/interpret/
# interpret_pallas_call.py: "TODO: Implement this properly"), which would
# silently break every stochastic path when the CPU suite exercises the
# megakernels.  With TRACER_INTERPRET_PRNG=1 the kernels instead draw from
# a murmur3-finalizer hash of (lane index, armed seed, trace-time draw
# counter) built from plain jnp ops the interpreter executes faithfully.
# Every draw site sits at kernel-body top level (once per round, never
# inside an in-kernel loop), so the trace-time counter gives each draw a
# distinct stream; the seed operand varies per round/block on the host
# side.  uint32 arithmetic is fine here because this branch never lowers
# through Mosaic.  Statistically adequate for test-scale MC only.
#
# CAVEATS (accepted for test-only infrastructure): the armed seed is a
# live tracer stored in module state — kernel construction must not be
# concurrent (the suite is single-threaded), and the reference lingers
# after the trace completes (harmless unless jax_check_tracer_leaks is
# on).  Like TRACER_FORCE_PALLAS, the env switch is read at trace time
# and is NOT part of the jit cache key: tests toggling it must
# jax.clear_caches() around the toggle.
_interp_prng = {"seed": None, "salt": 0}


def _interp_prng_on() -> bool:
    import os
    return os.environ.get("TRACER_INTERPRET_PRNG", "") == "1"


def _prng_seed(x) -> None:
    """pltpu.prng_seed, or (TRACER_INTERPRET_PRNG=1) arm the hash PRNG."""
    if _interp_prng_on():
        _interp_prng["seed"] = x
        _interp_prng["salt"] = 0
        return
    pltpu.prng_seed(x)


def _interp_uniform(shape):
    _interp_prng["salt"] += 1
    idx = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    for d in range(1, len(shape)):
        idx = (idx * jnp.uint32(shape[d])
               + jax.lax.broadcasted_iota(jnp.uint32, shape, d))
    x = (idx * jnp.uint32(0x9E3779B9)
         + _interp_prng["seed"].astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
         + jnp.uint32(_interp_prng["salt"] * 0x27D4EB2F & 0xFFFFFFFF))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return ((x >> 8).astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12)


def _kernel_uniform(shape):
    """Uniform (0,1] from the per-core PRNG. 24-bit mantissa path; Mosaic
    lacks uint32->f32 casts so reinterpret the shifted bits as int32."""
    if _interp_prng_on():
        return _interp_uniform(shape)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32) >> 8
    return (pltpu.bitcast(bits, jnp.int32).astype(jnp.float32)
            * (1.0 / (1 << 24)) + 1e-12)


def _sincos_turns(t):
    """(sin, cos) of 2*pi*t — ``t`` in TURNS — via branchless quarter-wave
    cephes-style minimax polynomials (max abs error ~6e-8, below f32
    round-off of the downstream physics). Mosaic lowers jnp.sin/cos
    through a generic radian range reduction that costs ~2x this PAIR;
    the regen sampling + shade epilogues draw 2-6 angles per lane per
    round, which is most of the fixed VPU cost that bounds the few-
    surface configs (round-3 verdict item 8). Sampling in turns also
    skips the 2*pi multiply most call sites used to feed jnp.sin/cos."""
    tf = t * 4.0
    q = jnp.round(tf)
    z = (tf - q) * jnp.float32(np.pi / 2.0)     # |z| <= pi/4
    z2 = z * z
    sz = ((jnp.float32(-1.9515295891e-4) * z2
           + jnp.float32(8.3321608736e-3)) * z2
          + jnp.float32(-1.6666654611e-1)) * z2 * z + z
    cz = (((jnp.float32(2.4433157e-5) * z2
            + jnp.float32(-1.3887316e-3)) * z2
           + jnp.float32(4.1666645683e-2)) * z2
          - jnp.float32(0.5)) * z2 + jnp.float32(1.0)
    qm = q - 4.0 * jnp.floor(q * 0.25)          # quadrant mod 4: 0..3
    sq = (jnp.where(qm == 1.0, 1.0, 0.0)
          - jnp.where(qm == 3.0, 1.0, 0.0))
    cq = (jnp.where(qm == 0.0, 1.0, 0.0)
          - jnp.where(qm == 2.0, 1.0, 0.0))
    return sz * cq + cz * sq, cz * cq - sz * sq


def _sincos_rad(x):
    """(sin, cos) of ``x`` radians via _sincos_turns."""
    return _sincos_turns(x * jnp.float32(1.0 / (2.0 * np.pi)))


def _sample_disk_buie(spec, shape, cell=None, frame=None,
                      want_aureole=False):
    """In-kernel disk/rect + Buie-sunshape source sampling (all parameters
    are static Python floats baked into the kernel; cf.
    sources.buie_sunshape). Returns the 6 fresh ray components.

    With ``cell`` the position is stratified to this grid block's
    equal-area cell of the source — the basis of per-block relevancy
    culling (every ray in block b starts in cell b): for a disk source
    cell = (a0, a1, th0, th1) area-fraction/angle bounds
    (culling.disk_cells); for a rect source (spec[15] marker, ref
    oblique_solar_rect_bundle sources.py:268) cell = (x0, x1, y0, y1)
    local-frame coordinate bounds (culling.rect_cells scaled by w, h).

    With ``frame`` (a (21,) f32 SMEM ref or array: center xyz, row-major
    position rotation, row-major direction rotation) the source POSE is
    a traced kernel operand instead of baked constants — the spec's
    center/rot slots hold None (engine._spec_frame_split) and a re-aimed
    source (annual sun sweeps, analysis/annual.py) reuses one compiled
    executable. Shape and distribution parameters (radius, CSR
    polynomial, wavelength band) stay static.

    Specs may carry two optional trailing fields (see
    sources.buie_sunshape_pallas_spec): a (wl_lo, wl_hi) band — a 7th
    returned component then samples per-ray wavelengths uniformly in the
    band — and the ambient attenuation coefficient (consumed by the
    epilogue, not here)."""
    (cx, cy, cz, rot, radius, e_ray, coeffs, disc_end,
     gamma, kappa, integ_sum, theta_tot, theta_dni) = spec[:13]
    wl_band = spec[13] if len(spec) > 13 else None
    rect = spec[15] if len(spec) > 15 else None
    if frame is not None:
        cx, cy, cz = frame[0], frame[1], frame[2]
        rot = tuple(frame[3 + i] for i in range(9))
        drot = tuple(frame[12 + i] for i in range(9))
    else:
        drot = rot
        if rect is not None and rect[2] is not None:
            # oblique rect sources carry a separate direction frame (rays
            # leave along rays_rot's +z, positions lie in rot's xy plane)
            drot = rect[2]
    u1, u2, u3, u4 = (_kernel_uniform(shape) for _ in range(4))
    # position on the source disc/rect (or this block's cell of it)
    if rect is not None:
        w_src, h_src, rays_rot = rect
        if cell is not None:
            x0, x1, y0, y1 = cell
            lx = x0 + u1 * (x1 - x0)
            ly = y0 + u2 * (y1 - y0)
        else:
            lx = (u1 - 0.5) * w_src
            ly = (u2 - 0.5) * h_src
    elif cell is not None:
        a0, a1, th0, th1 = cell
        rr = radius * jnp.sqrt(a0 + u1 * (a1 - a0))
        s_v, c_v = _sincos_rad(th0 + u2 * (th1 - th0))
        lx, ly = rr * c_v, rr * s_v
    else:
        rr = radius * jnp.sqrt(u1)
        s_v, c_v = _sincos_turns(u2)
        lx, ly = rr * c_v, rr * s_v
    fpx = rot[0] * lx + rot[1] * ly + cx
    fpy = rot[3] * lx + rot[4] * ly + cy
    fpz = rot[6] * lx + rot[7] * ly + cz
    # Buie polar angle: polynomial inverse CDF of the solar disc
    u = jnp.minimum(u3 / disc_end, 1.0)
    acc = jnp.full(shape, coeffs[0], dtype=jnp.float32)
    for c in coeffs[1:]:
        acc = acc * u + c
    theta = jnp.sqrt(u) * acc
    if gamma is not None:  # circumsolar aureole (u3 >= disc_end)
        # fold the static scalars in Python: an np.float64 intermediate
        # (np.exp) would promote the whole direction computation to f64
        # when x64 is enabled (CPU interpret tests)
        c_aur = float((gamma + 2.0) / (10.0 ** (3.0 * gamma)
                                       * float(np.exp(kappa))) * integ_sum
                      - theta_dni ** (gamma + 2.0))
        base = (u3 - 1.0) * c_aur + u3 * float(theta_tot ** (gamma + 2.0))
        th_aur = jnp.exp(jnp.log(jnp.maximum(base, 1e-30))
                         * (1.0 / (gamma + 2.0)))
        theta = jnp.where(u3 >= disc_end, th_aur, theta)
    s_t, c_t = _sincos_rad(theta)
    s_d, c_d = _sincos_turns(u4)
    ax, ay, az = s_t * c_d, s_t * s_d, c_t
    fdx = drot[0] * ax + drot[1] * ay + drot[2] * az
    fdy = drot[3] * ax + drot[4] * ay + drot[5] * az
    fdz = drot[6] * ax + drot[7] * ay + drot[8] * az
    out = (fpx, fpy, fpz, fdx, fdy, fdz)
    if wl_band is not None:
        u5 = _kernel_uniform(shape)
        wl = wl_band[0] + u5 * (wl_band[1] - wl_band[0])
        out = out + (wl,)
    if want_aureole:
        # lanes drawn into the circumsolar aureole (u3 >= disc_end,
        # theta > theta_dni — ~2% of Buie energy): the culled path parks
        # them at birth so its corridors can be sized to the solar DISC
        # cone instead of the 10x-wider full sunshape (culling.py
        # park_aureole)
        aur = (jnp.full(shape, False) if gamma is None
               else u3 >= disc_end)
        out = out + (aur,)
    return out


def _make_fused_kernel(groups, t_eps, disc_eps,
                       bivar, one_sided, slope, lambertian=False,
                       source_spec=None, spectral=False, n_tab=0,
                       ambient_att=0.0, refractive=False,
                       cook_torrance=False, lam_specular=False,
                       semi_lambertian=False, transparent=False,
                       conductor=False, iam=False, periodic=False,
                       piecewise=False, ambient_scat=0.0, ambient_g=0.0,
                       refr_disp=False, refr_frost=False,
                       refr_split=False,
                       backside_miss=False, media=None,
                       traced_frame=False):
    """Fused intersect + shade-epilogue kernel: one HBM round trip of the
    ray state per bounce. Runs one specialized fori per aperture-signature
    group over the shared (t, sid, winner) carry, so multi-group scenes
    (e.g. quadric dish + flat receiver) stay on the fast path. With a
    source_spec, dead lanes (energy <= 0) are regenerated from the source
    in-kernel when the regen flag (2nd scalar prefetch) is set; with
    ``traced_frame`` the source POSE comes from the srcf scalar-prefetch
    operand instead of spec constants (see _sample_disk_buie).

    ``spectral`` additionally threads a per-lane wavelength through the
    kernel (8th ray component, sampled from the source band at regen) and
    evaluates K_REFLECT_SPECTRAL rows' absorptance by exact piecewise-
    linear interpolation of the shared spectral table (SMEM prefetch).
    ``ambient_att`` compiles Beer-Lambert attenuation of each hit segment.
    ``refractive`` threads a per-lane refraction index (fresh rays start
    at 1.0) and compiles the Fresnel-interface epilogue branch.
    ``cook_torrance``/``lam_specular`` carry the winner's (p2, p3)
    through the surface loop and compile the corresponding epilogue
    branches; ``semi_lambertian``/``transparent`` compile theirs on the
    two-parameter carry."""
    extra_q = (cook_torrance or lam_specular or conductor or iam
               or piecewise or refr_frost)
    _, media_scat = media_flags(media)
    epi = _make_shade_epilogue(bivar, one_sided, slope, lambertian,
                               ambient_att, refractive=refractive,
                               cook_torrance=cook_torrance,
                               lam_specular=lam_specular,
                               semi_lambertian=semi_lambertian,
                               transparent=transparent,
                               conductor=conductor, iam=iam,
                               periodic=periodic, piecewise=piecewise,
                               refr_frost=refr_frost,
                               refr_split=refr_split,
                               ambient_scat=ambient_scat,
                               ambient_g=ambient_g, media=media)
    has_mid = media is not None

    def kernel(seed_ref, regen_ref, tabx_ref, taby_ref, srcf_ref, rows_ref,
               *io):
        n_in = 7 + int(spectral) + int(refractive) + int(has_mid)
        ins, outs_ref = io[:n_in], io[n_in:]
        px_ref, py_ref, pz_ref, dx_ref, dy_ref, dz_ref, e_ref = ins[:7]
        k = 7
        wl_ref = ins[k] if spectral else None
        k += int(spectral)
        ri_ref = ins[k] if refractive else None
        k += int(refractive)
        mid_ref = ins[k] if has_mid else None
        (npx_ref, npy_ref, npz_ref, ndx_ref, ndy_ref, ndz_ref,
         ne_ref) = outs_ref[:7]
        k = 7
        nwl_ref = outs_ref[k] if spectral else None
        k += int(spectral)
        nri_ref = outs_ref[k] if refractive else None
        k += int(refractive)
        nmid_ref = outs_ref[k] if has_mid else None
        k += int(has_mid)
        sid_ref, abs_ref = outs_ref[k], outs_ref[k + 1]
        split_refs = outs_ref[k + 2:k + 6] if refr_split else None

        _prng_seed(seed_ref[0] + pl.program_id(0))
        px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        e = e_ref[:]
        wl = wl_ref[:] if spectral else None
        ri = ri_ref[:] if refractive else None
        mid = mid_ref[:] if has_mid else None

        if source_spec is not None:
            do = (e <= 0.0) & (regen_ref[0] > 0)
            f = _sample_disk_buie(source_spec, px.shape,
                                  frame=srcf_ref if traced_frame else None)
            e_ray = jnp.float32(source_spec[5])
            px = jnp.where(do, f[0], px)
            py = jnp.where(do, f[1], py)
            pz = jnp.where(do, f[2], pz)
            dx = jnp.where(do, f[3], dx)
            dy = jnp.where(do, f[4], dy)
            dz = jnp.where(do, f[5], dz)
            e = jnp.where(do, e_ray, e)
            if spectral and len(f) > 6:
                wl = jnp.where(do, f[6], wl)
            if refractive:
                ri = jnp.where(do, 1.0, ri)   # fresh rays start in air
            if has_mid:
                mid = jnp.where(do, 0.0, mid)  # ... in the ambient medium

        rays = (px, py, pz, dx, dy, dz)
        big = jnp.float32(np.inf)
        zero = jnp.zeros_like(px)
        carry = (jnp.full_like(px, big),
                 jnp.full_like(px, -1, dtype=jnp.int32),
                 zero, zero, zero, zero, zero, zero, zero)
        if extra_q:
            carry = carry + (zero, zero)
        for (start, end, sig, tag) in groups:
            body = _surface_body(sig, 0, t_eps, disc_eps,
                                 tag, False, rows_ref, rays,
                                 spectral=spectral, wl=wl,
                                 tabx_ref=tabx_ref, taby_ref=taby_ref,
                                 n_tab=n_tab, extra_q=extra_q,
                                 conductor=conductor, piecewise=piecewise,
                                 refr_disp=refr_disp,
                                 backside_miss=backside_miss)
            carry = jax.lax.fori_loop(start, end, body, carry)
        q2_b = q3_b = None
        if extra_q:
            carry, (q2_b, q3_b) = carry[:-2], carry[-2:]
        (t_b, sid_b, ngx, ngy, ngz, upd_b, kf_b, q0_b, q1_b) = carry

        outs = epi(t_b, ngx, ngy, ngz, upd_b, kf_b, q0_b,
                   q1_b, px, py, pz, dx, dy, dz, e, ri=ri,
                   q2_b=q2_b, q3_b=q3_b, mid=mid, sid_b=sid_b)
        npx, npy, npz, ndx, ndy, ndz, ne, absorbed = outs[:8]
        npx_ref[:] = npx
        npy_ref[:] = npy
        npz_ref[:] = npz
        ndx_ref[:] = ndx
        ndy_ref[:] = ndy
        ndz_ref[:] = ndz
        ne_ref[:] = ne
        if spectral:
            nwl_ref[:] = wl
        k_e = 8
        if refractive:
            nri_ref[:] = outs[k_e]
            k_e += 1
        if has_mid:
            nmid_ref[:] = outs[k_e]
            k_e += 1
        # mask stale lanes: only lanes carrying energy report hits
        live = e > 0.0
        if (ambient_scat > 0.0 and not has_mid) or media_scat:
            # scattered live lanes report sid == -2: alive, no surface
            scat_m = outs[k_e]
            sid_ref[:] = jnp.where(
                live & scat_m, jnp.int32(-2),
                jnp.where(jnp.isfinite(t_b) & live, sid_b,
                          jnp.int32(-1)))
        else:
            sid_ref[:] = jnp.where(jnp.isfinite(t_b) & live, sid_b, -1)
        abs_ref[:] = jnp.where(live, absorbed, 0.0)
        if refr_split:
            # (s_e, s_dx, s_dy, s_dz) are the last four epilogue outputs
            s_e_k, s_dx_k, s_dy_k, s_dz_k = outs[-4:]
            split_refs[0][:] = jnp.where(live, s_e_k, 0.0)
            split_refs[1][:] = s_dx_k
            split_refs[2][:] = s_dy_k
            split_refs[3][:] = s_dz_k

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("groups", "t_eps", "disc_eps", "bivar",
                                    "one_sided", "slope", "lambertian",
                                    "source_spec", "ambient_att",
                                    "cook_torrance", "lam_specular",
                                    "semi_lambertian", "transparent",
                                    "conductor", "iam", "periodic",
                                    "piecewise", "ambient_scat",
                                    "ambient_g", "refr_disp",
                                    "refr_frost", "refr_split",
                                    "backside_miss", "media"))
def bounce_reflect_pallas(rows, seed, pos, dirs, energy, groups,
                          t_eps: float, disc_eps: float = 1e-6,
                          bivar: bool = True, one_sided: bool = True,
                          slope: bool = True, lambertian: bool = False,
                          source_spec=None, regen=None,
                          wavelength=None, spectral_tab=None,
                          ambient_att: float = 0.0, ref_index=None,
                          cook_torrance: bool = False,
                          lam_specular: bool = False,
                          semi_lambertian: bool = False,
                          transparent: bool = False,
                          conductor: bool = False, iam: bool = False,
                          periodic: bool = False,
                          piecewise: bool = False,
                          ambient_scat: float = 0.0,
                          ambient_g: float = 0.0,
                          refr_disp: bool = False,
                          refr_frost: bool = False,
                          refr_split: bool = False,
                          backside_miss: bool = False,
                          medium_id=None, media=None, src_frame=None):
    """Fused intersect+shade bounce for K_REFLECT / K_LAMBERTIAN /
    K_REFLECT_SPECTRAL / K_REFRACTIVE scenes (any number of
    aperture-signature groups).

    ``refr_disp`` (needs both spectral and refractive modes) compiles the
    dispersive-interface branch: K_REFRACTIVE rows with n(wl) tables
    (materials.refractive_material) interpolate per-lane n1/n2 in the
    candidate loop and the Fresnel epilogue consumes them.
    ``refr_frost`` compiles frosted interfaces (ref Refractive sigma,
    optics_callables.py:732): refractive lanes draw a slope-error
    perturbation with their p2 sigma (via the q2 carry) and the Fresnel/
    Snell branch uses the perturbed normal.

    Returns (new_pos, new_dir, new_energy, sid, absorbed
    [, new_wavelength][, new_ref_index]); non-hit lanes pass their state
    through unchanged (the engine masks them). With a static source_spec
    and a regen flag array (1,), dead lanes are refilled from the source
    before intersecting (streaming megakernel). Passing ``wavelength``
    (N,) and ``spectral_tab`` (L, 2) enables the spectral mode: per-lane
    wavelengths thread through the kernel and spectral rows interpolate
    their absorptance exactly. Passing ``ref_index`` (N,) enables the
    refractive mode: per-lane indices thread through and K_REFRACTIVE
    rows Russian-roulette between Fresnel reflection and Snell
    refraction (regenerated lanes restart at index 1.0). With
    ``refr_split`` (requires the refractive mode), F_SPLIT rows split
    instead of rouletting and the return tuple gains a trailing
    ``(s_e, s_dir)`` pair — the reflected branch's energy (0 where no
    split happened) and its (N, 3) direction. Passing
    ``medium_id`` (N, f32) plus the static ``media`` pair (see
    _make_shade_epilogue) enables per-surface-toggled volumetric media:
    the lane's medium id threads through and is returned after the
    refraction index."""
    spectral = wavelength is not None
    refractive = ref_index is not None
    has_mid = medium_id is not None
    if has_mid != (media is not None):
        raise ValueError("medium_id and media must be passed together")
    n = pos.shape[0]
    n_pad = -(-n // TILE) * TILE
    pad = n_pad - n

    comps = []
    for a in (pos, dirs):
        for k in range(3):
            c = a[:, k]
            if pad:
                c = jnp.pad(c, (0, pad), constant_values=1.0)
            comps.append(c.reshape(n_pad // LANE, LANE))
    for extra, on in ((energy, True), (wavelength, spectral),
                      (ref_index, refractive), (medium_id, has_mid)):
        if not on:
            continue
        c = extra
        if pad:
            c = jnp.pad(c, (0, pad))
        comps.append(c.reshape(n_pad // LANE, LANE))

    nb = n_pad // TILE

    def ray_idx(i, seed_ref, regen_ref, tabx_ref, taby_ref, srcf_ref,
                rows_ref):
        return (i, 0)

    if regen is None:
        regen = jnp.zeros((1,), dtype=jnp.int32)
    if spectral_tab is None:
        tabx = jnp.zeros((2,), dtype=jnp.float32)
        taby = jnp.zeros((2,), dtype=jnp.float32)
    else:
        tabx = spectral_tab[:, 0].astype(jnp.float32)
        taby = spectral_tab[:, 1].astype(jnp.float32)
    # source-pose scalar operand (center, position rot, direction rot):
    # traced when given so re-aimed sources share one executable
    srcf = (jnp.zeros((21,), dtype=jnp.float32) if src_frame is None
            else src_frame.astype(jnp.float32))

    n_io = 7 + int(spectral) + int(refractive) + int(has_mid)
    ray_spec = pl.BlockSpec((SUB, LANE), ray_idx, memory_space=pltpu.VMEM)
    kernel = _make_fused_kernel(groups, t_eps, disc_eps, bivar=bivar,
                                one_sided=one_sided, slope=slope,
                                lambertian=lambertian,
                                source_spec=source_spec,
                                spectral=spectral, n_tab=tabx.shape[0],
                                ambient_att=ambient_att,
                                refractive=refractive,
                                cook_torrance=cook_torrance,
                                lam_specular=lam_specular,
                                semi_lambertian=semi_lambertian,
                                transparent=transparent,
                                conductor=conductor, iam=iam,
                                periodic=periodic, piecewise=piecewise,
                                ambient_scat=ambient_scat,
                                ambient_g=ambient_g,
                                refr_disp=refr_disp,
                                refr_frost=refr_frost,
                                refr_split=refr_split,
                                backside_miss=backside_miss,
                                media=media,
                                traced_frame=src_frame is not None)
    n_out = n_io + 2 + (4 if refr_split else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,   # seed, regen, spec table x/y, srcf, rows
        grid=(nb,),
        in_specs=[ray_spec] * n_io,
        out_specs=tuple([ray_spec] * n_out),
    )
    shape2 = (n_pad // LANE, LANE)
    out_shapes = tuple([jax.ShapeDtypeStruct(shape2, jnp.float32)] * n_io
                       + [jax.ShapeDtypeStruct(shape2, jnp.int32),
                          jax.ShapeDtypeStruct(shape2, jnp.float32)]
                       + [jax.ShapeDtypeStruct(shape2, jnp.float32)] * 4
                       * int(refr_split))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
    )(seed, regen, tabx, taby, srcf, rows, *comps)

    flat_outs = [a.reshape(n_pad)[:n] for a in outs]
    new_pos = jnp.stack(flat_outs[0:3], axis=1)
    new_dir = jnp.stack(flat_outs[3:6], axis=1)
    new_e = flat_outs[6]
    k = 7
    res = [new_pos, new_dir, new_e]
    sid_abs = [flat_outs[n_io], flat_outs[n_io + 1]]
    res.extend(sid_abs)
    if spectral:
        res.append(flat_outs[k])
        k += 1
    if refractive:
        res.append(flat_outs[k])
        k += 1
    if has_mid:
        res.append(flat_outs[k])
    if refr_split:
        s_e = flat_outs[n_io + 2]
        s_dir = jnp.stack(flat_outs[n_io + 3:n_io + 6], axis=1)
        res.extend([s_e, s_dir])
    return tuple(res)


# ---------------------------------------------------------------------------
# Relevancy-culled fused bounce kernel: like bounce_reflect_pallas, but each
# grid block (a) regenerates its dead lanes from ITS OWN equal-area source
# cell up to its exact outstanding quota, and (b) intersects only the
# surfaces in its static candidate list (SMEM indirection), computed by
# culling.build_block_culling to provably cover every reachable surface.
# This is the TPU replacement for running the reference's Kd-tree inside
# the bounce loop (accel_tree.py:213) and its per-bounce relevancy culling
# (tracer_engine.py:251-264): candidate sets are static, so no host sync.
# ---------------------------------------------------------------------------

def _dead_lane_rank(dead_f):
    """Exclusive row-major rank of each dead lane within its (SUB, LANE)
    tile: # dead lanes strictly before it. Built from two triangular
    matmuls — counts are small integers, exact on the bf16-rounded MXU."""
    sub, lane = dead_f.shape
    jj = jax.lax.broadcasted_iota(jnp.int32, (lane, lane), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (lane, lane), 1)
    tri_excl = (jj < kk).astype(jnp.float32)      # strictly-lower triangle
    intra = jnp.dot(dead_f, tri_excl, preferred_element_type=jnp.float32)
    row_tot = jnp.sum(dead_f, axis=1, keepdims=True)        # (SUB, 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (sub, sub), 1)
    tri_rows = (ii < ll).astype(jnp.float32)
    row_pref = jnp.dot(row_tot.reshape(1, sub), tri_rows,
                       preferred_element_type=jnp.float32).reshape(sub, 1)
    return intra + row_pref


def _make_fused_kernel_culled(group_specs, t_eps, disc_eps, bivar,
                              one_sided, slope, source_spec,
                              lambertian: bool = False,
                              spectral: bool = False, n_tab: int = 0,
                              ambient_att: float = 0.0,
                              conductor: bool = False, iam: bool = False,
                              backside_miss: bool = False,
                              park_aureole: bool = False):
    """Culled group kernel: per-block candidate-list fori loops (one
    specialized loop per aperture-signature group, group_specs =
    ((sig, flat, col_offset), ...)) + per-block cell-stratified
    regeneration with EXACT emission budgets + reflect epilogue.
    remaining_ref[b] is this block's outstanding quota: only the
    first remaining_ref[b] dead lanes (row-major) regenerate, so every
    equal-area source cell emits exactly its quota — per-block overshoot
    would otherwise correlate with local survival rate and bias the
    spatial emission density by up to TILE/quota.

    ``spectral``/``n_tab``/``ambient_att`` mirror _make_fused_kernel: a
    per-lane wavelength rides as an extra ray component (sampled from the
    source band at regeneration), K_REFLECT_SPECTRAL rows interpolate
    their absorptance from the SMEM table, and hit segments Beer-Lambert
    attenuate in the ambient medium. ``conductor``/``iam`` mirror
    _make_fused_kernel too (both are direction-preserving, so the
    corridor analysis is unaffected; they ride the extra_q carry).

    active_ref[b] == 0 marks a block with nothing to do this round (quota
    spent, no live unparked lane): it skips the candidate loops and the
    epilogue entirely and passes its ray state through. Without the skip
    the EMISSION TAIL — the last rounds where a few slow cells finish
    their quotas — costs a full slab of candidate-loop work per round
    even though almost every block is idle (round-3 verdict item 5)."""
    extra_q = conductor or iam
    epi = _make_shade_epilogue(bivar, one_sided, slope, lambertian,
                               ambient_att, conductor=conductor, iam=iam)

    def kernel(seed_ref, remaining_ref, active_ref, lists_ref, counts_ref,
               cells_ref, cellb_ref, tabx_ref, taby_ref, rows_ref, *io):
        if spectral:
            (px_ref, py_ref, pz_ref, dx_ref, dy_ref, dz_ref, e_ref, wl_ref,
             npx_ref, npy_ref, npz_ref, ndx_ref, ndy_ref, ndz_ref,
             ne_ref, nwl_ref, sid_ref, abs_ref) = io
        else:
            (px_ref, py_ref, pz_ref, dx_ref, dy_ref, dz_ref, e_ref,
             npx_ref, npy_ref, npz_ref, ndx_ref, ndy_ref, ndz_ref,
             ne_ref, sid_ref, abs_ref) = io
        b = pl.program_id(0)

        @pl.when(active_ref[b] == 0)
        def _idle_passthrough():
            # dead lanes stay dead, parked lanes' results are discarded
            # by the caller anyway — write-through is exact
            npx_ref[:] = px_ref[:]
            npy_ref[:] = py_ref[:]
            npz_ref[:] = pz_ref[:]
            ndx_ref[:] = dx_ref[:]
            ndy_ref[:] = dy_ref[:]
            ndz_ref[:] = dz_ref[:]
            ne_ref[:] = e_ref[:]
            if spectral:
                nwl_ref[:] = wl_ref[:]
            sid_ref[:] = jnp.full(px_ref.shape, -1, dtype=jnp.int32)
            abs_ref[:] = jnp.zeros(px_ref.shape, dtype=jnp.float32)

        @pl.when(active_ref[b] != 0)
        def _active_body():
            # global block id: distinct PRNG stream per block, invariant
            # to how blocks shard over devices (several blocks may serve
            # the same source cell — load balancing — so streams key on
            # the block)
            cell = cells_ref[b]
            _prng_seed(seed_ref[0] + cell)
            px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
            dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
            e = e_ref[:]
            wl = wl_ref[:] if spectral else None

            dead = e <= 0.0
            rank = _dead_lane_rank(dead.astype(jnp.float32))
            do = dead & (rank < remaining_ref[b].astype(jnp.float32))
            bounds = (cellb_ref[0, b], cellb_ref[1, b],
                      cellb_ref[2, b], cellb_ref[3, b])
            f = _sample_disk_buie(source_spec, px.shape, cell=bounds,
                                  want_aureole=park_aureole)
            aur = None
            if park_aureole:
                # lanes born into the circumsolar aureole trace their
                # FIRST segment normally (the first-segment sweep covers
                # the full sunshape cone) but may not ride the disc-cone
                # specular closure afterwards: survivors of their first
                # bounce are marked by an ENCODED sid (-(sid+16)) so the
                # engine parks them for the exact full-scene drain.
                # Parking only survivors (~0.2% of refills) keeps the
                # slab from silting up with frozen lanes — parking at
                # birth (~2.2%) starved emission and biased the source
                # density on long runs.
                aur = f[-1] & do
                f = f[:-1]
            e_ray = jnp.float32(source_spec[5])
            px = jnp.where(do, f[0], px)
            py = jnp.where(do, f[1], py)
            pz = jnp.where(do, f[2], pz)
            dx = jnp.where(do, f[3], dx)
            dy = jnp.where(do, f[4], dy)
            dz = jnp.where(do, f[5], dz)
            e = jnp.where(do, e_ray, e)
            if spectral and len(f) > 6:
                wl = jnp.where(do, f[6], wl)

            rays = (px, py, pz, dx, dy, dz)
            big = jnp.float32(np.inf)
            zero = jnp.zeros_like(px)
            carry = (jnp.full_like(px, big),
                     jnp.full_like(px, -1, dtype=jnp.int32),
                     zero, zero, zero, zero, zero, zero, zero)
            if extra_q:
                carry = carry + (zero, zero)
            for g, (sig, tag, off) in enumerate(group_specs):
                body = _surface_body(sig, 0, t_eps, disc_eps, tag, False,
                                     rows_ref, rays, lists_ref=lists_ref,
                                     block=b, col_offset=off,
                                     spectral=spectral, wl=wl,
                                     tabx_ref=tabx_ref, taby_ref=taby_ref,
                                     n_tab=n_tab, extra_q=extra_q,
                                     conductor=conductor,
                                     backside_miss=backside_miss)
                carry = jax.lax.fori_loop(0, counts_ref[g, b], body, carry)
            q2_b = q3_b = None
            if extra_q:
                carry, (q2_b, q3_b) = carry[:-2], carry[-2:]
            (t_b, sid_b, ngx, ngy, ngz, upd_b, kf_b, q0_b, q1_b) = carry

            outs = epi(t_b, ngx, ngy, ngz, upd_b, kf_b, q0_b,
                       q1_b, px, py, pz, dx, dy, dz, e,
                       q2_b=q2_b, q3_b=q3_b)
            npx, npy, npz, ndx, ndy, ndz, ne, absorbed = outs
            sid_out = jnp.where(jnp.isfinite(t_b) & (e > 0.0), sid_b, -1)
            if park_aureole:
                # aureole-born lanes bounce normally; a HIT is flagged by
                # the encoded sid (engine decodes -(sid+16), accounts
                # the bounce, and parks the survivor)
                sid_out = jnp.where(aur & (sid_out >= 0),
                                    -sid_out - 16, sid_out)
            npx_ref[:] = npx
            npy_ref[:] = npy
            npz_ref[:] = npz
            ndx_ref[:] = ndx
            ndy_ref[:] = ndy
            ndz_ref[:] = ndz
            ne_ref[:] = ne
            if spectral:
                nwl_ref[:] = wl
            sid_ref[:] = sid_out
            abs_ref[:] = jnp.where(e > 0.0, absorbed, 0.0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("groups", "group_offsets", "t_eps",
                                    "disc_eps", "bivar",
                                    "one_sided", "slope", "lambertian",
                                    "source_spec", "ambient_att",
                                    "conductor", "iam", "backside_miss",
                                    "park_aureole"))
def bounce_reflect_culled_pallas(rows, lists, counts, cells, cell_bounds,
                                 seed, remaining, active,
                                 pos, dirs, energy, groups,
                                 group_offsets, t_eps: float,
                                 disc_eps: float = 1e-6, bivar=True,
                                 one_sided: bool = True, slope: bool = True,
                                 lambertian: bool = False,
                                 source_spec=None,
                                 wavelength=None, spectral_tab=None,
                                 ambient_att: float = 0.0,
                                 conductor: bool = False,
                                 iam: bool = False,
                                 backside_miss: bool = False,
                                 park_aureole: bool = False):
    """Relevancy-culled fused bounce (pure-specular/Lambertian scenes,
    any number of aperture-signature groups — one specialized candidate
    loop per group over its static column segment of ``lists``).

    rows      packed transposed (K, S) surface table (pack_rows) — ALL rows
    lists     (nb, sum(W_g)) int32 per-block candidate row ids, one column
              segment per group starting at group_offsets[g] (culling)
    counts    (nb, G) int32 valid entries per block per group
    cells     (nb,) int32 GLOBAL block id of each block (PRNG stream key) —
              arange(nb) single-device; a shard of the global arange when
              the block grid is sharded over a mesh (parallel.py)
    cell_bounds (nb, 4) f32 per-block source-disk cell [a0, a1, th0, th1]
              (culling.disk_cells; the same shard as lists/cells)
    remaining (nb,) int32 outstanding emission quota per block; exactly
              min(remaining[b], #dead lanes) rays regenerate in block b
    active    (nb,) int32; 0 = the block has no work this round (quota
              spent, no live unparked lane) and passes its state through
              without tracing — the emission-tail skip

    With ``wavelength`` (N,) + ``spectral_tab`` (L, 2), per-lane
    wavelengths thread through the kernel (regenerated lanes sample the
    source band) and K_REFLECT_SPECTRAL rows interpolate their
    absorptance exactly; returns an extra new_wavelength.
    ``ambient_att`` > 0 Beer-Lambert attenuates every hit segment.

    The ray count must be exactly nb * TILE (block b <-> source cell b)."""
    spectral = wavelength is not None
    # rows may be a per-segment row SHARD (culling.seg_row_ids): fewer
    # columns than the global groups span, with lists carrying LOCAL ids
    assert groups[0][0] == 0 and groups[-1][1] >= rows.shape[1]
    assert len(group_offsets) == len(groups) == counts.shape[1]
    group_specs = tuple(
        (sig, tag, off)
        for (start, end, sig, tag), off in zip(groups, group_offsets))
    n = pos.shape[0]
    nb = lists.shape[0]
    if n != nb * TILE:
        raise ValueError(f"ray count {n} != nb*TILE = {nb * TILE}")

    comps = []
    for a in (pos, dirs):
        for k in range(3):
            comps.append(a[:, k].reshape(n // LANE, LANE))
    comps.append(energy.reshape(n // LANE, LANE))
    if spectral:
        comps.append(wavelength.reshape(n // LANE, LANE))

    if spectral_tab is None:
        tabx = jnp.zeros((2,), dtype=jnp.float32)
        taby = jnp.zeros((2,), dtype=jnp.float32)
    else:
        tabx = spectral_tab[:, 0].astype(jnp.float32)
        taby = spectral_tab[:, 1].astype(jnp.float32)

    def ray_idx(i, seed_ref, remaining_ref, active_ref, lists_ref,
                counts_ref, cells_ref, cellb_ref, tabx_ref, taby_ref,
                rows_ref):
        return (i, 0)

    n_io = 8 if spectral else 7
    ray_spec = pl.BlockSpec((SUB, LANE), ray_idx, memory_space=pltpu.VMEM)
    kernel = _make_fused_kernel_culled(group_specs, t_eps, disc_eps,
                                       bivar=bivar,
                                       one_sided=one_sided, slope=slope,
                                       source_spec=source_spec,
                                       lambertian=lambertian,
                                       spectral=spectral,
                                       n_tab=tabx.shape[0],
                                       ambient_att=ambient_att,
                                       conductor=conductor, iam=iam,
                                       backside_miss=backside_miss,
                                       park_aureole=park_aureole)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        # seed, quotas, active, lists, counts, ids, bounds, table x/y, rows
        num_scalar_prefetch=10,
        grid=(nb,),
        in_specs=[ray_spec] * n_io,
        out_specs=tuple([ray_spec] * (n_io + 2)),
    )
    shape2 = (n // LANE, LANE)
    out_shapes = tuple([jax.ShapeDtypeStruct(shape2, jnp.float32)] * n_io
                       + [jax.ShapeDtypeStruct(shape2, jnp.int32),
                          jax.ShapeDtypeStruct(shape2, jnp.float32)])
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
    )(seed, remaining, active, lists.T, counts.T, cells, cell_bounds.T,
      tabx, taby, rows, *comps)

    flat_outs = [a.reshape(n) for a in outs]
    new_pos = jnp.stack(flat_outs[0:3], axis=1)
    new_dir = jnp.stack(flat_outs[3:6], axis=1)
    if spectral:
        return (new_pos, new_dir, flat_outs[6], flat_outs[8], flat_outs[9],
                flat_outs[7])
    return new_pos, new_dir, flat_outs[6], flat_outs[7], flat_outs[8]

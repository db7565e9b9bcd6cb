"""Shading kernel: apply each surface's optics to its hit rays, branchlessly.

Replaces the reference's per-surface optics callables (HOT LOOP 2,
tracer/tracer_engine.py:218-264 dispatching into optics_callables.py):
every interaction law is computed for every ray with vector ops and the
result selected by the surface's optics kind — classic TPU-style predication
(the extra VPU flops are free next to HBM traffic).

Randomness comes from explicit jax.random keys (one per bounce), replacing
the reference's global numpy RNG, which makes traces reproducible per shard.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import materials as M
from ..mathutils import apply_rot, dot, normalize, rotate_to_normal
from ..optics import reflections, refractions, fresnel


class ShadeResult(NamedTuple):
    out_pos: jnp.ndarray       # (N,3) next-segment origin (global)
    out_dir: jnp.ndarray       # (N,3) next-segment direction
    out_energy: jnp.ndarray    # (N,)
    out_ref_index: jnp.ndarray  # (N,)
    absorbed: jnp.ndarray      # (N,) energy deposited on the hit surface
    local_pt: jnp.ndarray      # (N,3) hit point in surface-local coords
    normal: jnp.ndarray        # (N,3) shading normal (global, against ray)
    backside: jnp.ndarray      # (N,) bool, hit arrived along local +Z


def _interp_segment(x, start, length, tab_x, tab_y):
    """Per-ray linear interpolation inside a [start, start+length) slice of a
    shared table. Out-of-range clamps to the slice edge values."""
    start = start.astype(jnp.int32)
    length = jnp.maximum(length.astype(jnp.int32), 1)
    n_tab = tab_x.shape[0]
    # binary search bounded to the slice via masked compare
    idx = jnp.arange(n_tab)
    in_seg = (idx[None, :] >= start[:, None]) & (idx[None, :] < (start + length)[:, None])
    xs = jnp.where(in_seg, tab_x[None, :], jnp.inf)
    # number of slice entries <= x  (per ray)
    k = jnp.sum(xs <= x[:, None], axis=1)
    lo = jnp.clip(start + k - 1, start, start + length - 1)
    hi = jnp.clip(start + k, start, start + length - 1)
    x0, x1 = tab_x[lo], tab_x[hi]
    y0, y1 = tab_y[lo], tab_y[hi]
    w = jnp.where(x1 == x0, 0.0, (x - x0) / jnp.where(x1 == x0, 1.0, x1 - x0))
    return y0 + jnp.clip(w, 0.0, 1.0) * (y1 - y0)


def shade(scene, sid: jnp.ndarray, t: jnp.ndarray, pos: jnp.ndarray,
          dirs: jnp.ndarray, energy: jnp.ndarray, wavelength: jnp.ndarray,
          ref_index: jnp.ndarray, key: jax.Array) -> ShadeResult:
    """Shade all rays against their hit surfaces (sid >= 0 assumed valid;
    escaped rays get arbitrary-but-finite outputs which the engine masks)."""
    n = pos.shape[0]
    s = jnp.maximum(sid, 0)

    take = lambda a: jnp.take(a, s, axis=0)
    frame = take(scene.frame)
    inv_frame = take(scene.inv_frame)
    quad = take(scene.quadric)
    kind = take(scene.opt_kind)
    flags = take(scene.opt_flags)
    prm = take(scene.opt_params)

    t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
    hit_g = pos + t_safe[:, None] * dirs

    rot_inv = inv_frame[:, :3, :3]
    # apply_rot, not einsum: keep tiny matmuls off the bf16-rounded MXU
    p_l = apply_rot(rot_inv, hit_g) + inv_frame[:, :3, 3]
    d_l = apply_rot(rot_inv, dirs)

    # gradient of the quadric at the local hit point = 2(A p + b)
    axx, ayy, azz = quad[:, 0], quad[:, 1], quad[:, 2]
    axy, axz, ayz = quad[:, 3], quad[:, 4], quad[:, 5]
    bx, by, bz = quad[:, 6], quad[:, 7], quad[:, 8]
    x, y, z = p_l[:, 0], p_l[:, 1], p_l[:, 2]
    grad = jnp.stack([
        axx * x + axy * y + axz * z + bx,
        axy * x + ayy * y + ayz * z + by,
        axz * x + ayz * y + azz * z + bz,
    ], axis=1)
    n_l = normalize(grad, eps=1e-30)

    rot = frame[:, :3, :3]
    n_geom = apply_rot(rot, n_l)
    cos_geom = dot(dirs, n_geom)
    # shading normal opposes the incoming ray (ref quadric/flat normal flip)
    ns = jnp.where(cos_geom[:, None] > 0.0, -n_geom, n_geom)
    # one-sidedness references the local +Z ("up", ref surface.py/up()):
    up = rot[:, :, 2]
    backside = dot(dirs, up) > 0.0

    # --- random draws shared by all laws -----------------------------------
    k_phi, k_u, k_th, k_tx, k_spec = jax.random.split(key, 5)
    phi = jax.random.uniform(k_phi, (n,), dtype=pos.dtype,
                             minval=0.0, maxval=2.0 * jnp.pi)
    u1 = jax.random.uniform(k_u, (n,), dtype=pos.dtype)
    nrm1 = jax.random.normal(k_th, (n,), dtype=pos.dtype)
    nrm2 = jax.random.normal(k_tx, (n,), dtype=pos.dtype)
    u_choice = jax.random.uniform(k_spec, (n,), dtype=pos.dtype)

    # --- effective absorptivity (incl. IAM and spectral variants) ----------
    absorptivity = prm[:, 0]
    spectral = kind == M.K_REFLECT_SPECTRAL
    spec_abs = _interp_segment(wavelength, prm[:, 0], prm[:, 1],
                               scene.spectral_wl, scene.spectral_ab)
    absorptivity = jnp.where(spectral, spec_abs, absorptivity)
    # Martin-Ruiz IAM (ref optics_callables.py:271):
    cos_aoi = jnp.abs(dot(dirs, ns))
    a_r = jnp.where(prm[:, 4] > 0.0, prm[:, 4], 1.0)
    iam_f = (1.0 - jnp.exp(-cos_aoi / a_r)) / (1.0 - jnp.exp(-1.0 / a_r))
    has_iam = (flags & M.F_IAM) != 0
    absorptivity = jnp.where(has_iam, absorptivity * iam_f, absorptivity)

    # --- perturbed normal for slope error (ref RealReflective :214) --------
    sigma = jnp.where(kind == M.K_REFLECT, prm[:, 1], prm[:, 2])
    bivar = (flags & M.F_BIVAR) != 0
    th = nrm1 * sigma
    radial_err = jnp.stack([jnp.sin(th) * jnp.cos(phi),
                            jnp.sin(th) * jnp.sin(phi),
                            jnp.cos(th)], axis=1)
    tanx = jnp.tan(nrm1 * sigma)
    tany = jnp.tan(nrm2 * sigma)
    ez = 1.0 / jnp.sqrt(1.0 + tanx**2 + tany**2)
    bivar_err = jnp.stack([tanx * ez, tany * ez, ez], axis=1)
    err = jnp.where(bivar[:, None], bivar_err, radial_err)
    n_pert = normalize(rotate_to_normal(err, ns), eps=1e-30)
    n_eff = jnp.where((sigma > 0.0)[:, None], n_pert, ns)

    # --- candidate interactions ---------------------------------------------
    d_reflect = reflections(dirs, n_eff)

    # cosine-weighted ("pillbox") diffuse within ang_range about the normal
    ang_range = prm[:, 1]
    sinsq = jnp.sin(ang_range) * jnp.sqrt(u1)
    d_lamb_local = jnp.stack([jnp.cos(phi) * sinsq, jnp.sin(phi) * sinsq,
                              jnp.sqrt(jnp.maximum(1.0 - sinsq**2, 0.0))],
                             axis=1)
    d_lambert = rotate_to_normal(d_lamb_local, ns)
    # full-hemisphere variant (for LambertianSpecular's diffuse branch)
    sinsq_h = jnp.sqrt(u1)
    d_hemi = rotate_to_normal(
        jnp.stack([jnp.cos(phi) * sinsq_h, jnp.sin(phi) * sinsq_h,
                   jnp.sqrt(jnp.maximum(1.0 - sinsq_h**2, 0.0))], axis=1), ns)

    # refraction against the toggled medium (ref RefractiveHomogenous :1186)
    n1_s, n2_s = prm[:, 0], prm[:, 1]
    n_cur = ref_index
    n_next = jnp.where(jnp.abs(n_cur - n1_s) < 1e-9, n2_s, n1_s)
    refr_ok, d_refract = refractions(n_cur, n_next, dirs, n_eff)
    R = fresnel(dirs, n_eff, n_cur, n_next)
    R = jnp.where(refr_ok, R, 1.0)
    go_reflect = u_choice <= R

    # --- select by kind ------------------------------------------------------
    is_transparent = kind == M.K_TRANSPARENT
    is_reflect = (kind == M.K_REFLECT) | spectral
    is_lambert = kind == M.K_LAMBERTIAN
    is_lspec = kind == M.K_LAMBERTIAN_SPECULAR
    is_semi = kind == M.K_SEMI_LAMBERTIAN
    is_refr = kind == M.K_REFRACTIVE
    is_periodic = kind == M.K_PERIODIC

    # LambertianSpecular: specular w.p. specularity (p1), diffuse otherwise
    lspec_spec = u_choice < prm[:, 1]
    d_lspec = jnp.where(lspec_spec[:, None], d_reflect, d_hemi)
    # SemiLambertian: specular at glancing incidence, diffuse otherwise
    ang_in = jnp.arccos(jnp.clip(cos_aoi, -1.0, 1.0))
    semi_glancing = ang_in > prm[:, 1]
    d_semi = jnp.where(semi_glancing[:, None], d_reflect, d_lambert)

    d_refr_sel = jnp.where(go_reflect[:, None], d_reflect, d_refract)

    out_dir = d_reflect
    out_dir = jnp.where(is_transparent[:, None], dirs, out_dir)
    out_dir = jnp.where(is_lambert[:, None], d_lambert, out_dir)
    out_dir = jnp.where(is_lspec[:, None], d_lspec, out_dir)
    out_dir = jnp.where(is_semi[:, None], d_semi, out_dir)
    out_dir = jnp.where(is_refr[:, None], d_refr_sel, out_dir)
    out_dir = jnp.where(is_periodic[:, None], dirs, out_dir)
    out_dir = normalize(out_dir, eps=1e-30)

    # energy: most kinds multiply by (1 - absorptivity); refractive Russian
    # roulette and transparent/periodic keep it; one-sided kills backside hits
    keep = is_transparent | is_refr | is_periodic
    out_energy = jnp.where(keep, energy, energy * (1.0 - absorptivity))
    one_sided = (flags & M.F_ONE_SIDED) != 0
    out_energy = jnp.where(one_sided & backside, 0.0, out_energy)

    out_ref_index = jnp.where(is_refr & ~go_reflect, n_next, n_cur)

    out_pos = hit_g
    period = prm[:, 0]
    out_pos = jnp.where(is_periodic[:, None],
                        hit_g + period[:, None] * ns, out_pos)

    absorbed = energy - out_energy

    return ShadeResult(out_pos, out_dir, out_energy, out_ref_index,
                       absorbed, p_l, ns, backside)

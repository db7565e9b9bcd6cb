"""Shading kernel: apply each surface's optics to its hit rays, branchlessly.

Replaces the reference's per-surface optics callables (HOT LOOP 2,
tracer/tracer_engine.py:218-264 dispatching into optics_callables.py).
Interaction laws are computed with vector ops and selected by surface
optics kind — TPU-style predication — but the kernel is *specialized at
compile time* on the scene's static metadata (kinds_present / features):
laws and RNG draws for optics absent from the scene are never emitted.

Per-ray surface data comes from ONE packed row table. For small scenes the
"gather" is a fused where-select chain (TPU gathers of (4,4) frames from
HBM were the dominant bounce cost — ~100 ms/Mray); large scenes use a
single contiguous gather of the packed row.

Randomness comes from explicit jax.random keys (one per bounce), replacing
the reference's global numpy RNG, which makes traces reproducible per shard.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import materials as M
from ..mathutils import (apply_rot, dot, normalize, rotate_to_normal,
                         safe_arccos, safe_sqrt)
from ..optics import reflections, refractions, fresnel


class ShadeResult(NamedTuple):
    out_pos: jnp.ndarray       # (N,3) next-segment origin (global)
    out_dir: jnp.ndarray       # (N,3) next-segment direction
    out_energy: jnp.ndarray    # (N,)
    out_ref_index: jnp.ndarray  # (N,)
    out_medium: tuple          # (att, scat, g) each (N,) — entered medium
    absorbed: jnp.ndarray      # (N,) energy deposited on the hit surface
    local_pt: jnp.ndarray      # (N,3) hit point in surface-local coords
    normal: jnp.ndarray        # (N,3) shading normal (global, against ray)
    backside: jnp.ndarray      # (N,) bool, hit arrived along local +Z
    split: Optional[tuple] = None  # energy-splitting interfaces only:
    #   (mask (N,) bool, secondary energy (N,), reflected dir (N,3))


_SELECT_GATHER_MAX = 64


def _gather_rows(table: jnp.ndarray, sid: jnp.ndarray) -> jnp.ndarray:
    """Per-ray rows of a (S,K) table. For small S, a where-select chain that
    XLA fuses into one elementwise pass (table rows become constants),
    avoiding TPU HBM gathers; otherwise one contiguous dynamic gather."""
    S = table.shape[0]
    if S <= _SELECT_GATHER_MAX:
        out = jnp.broadcast_to(table[0], sid.shape + table.shape[1:])
        for s in range(1, S):
            out = jnp.where((sid == s)[..., None], table[s], out)
        return out
    return jnp.take(table, sid, axis=0)


def _interp_segment(x, start, length, tab_x, tab_y):
    """Per-ray linear interpolation inside a [start, start+length) slice of a
    shared table. Out-of-range clamps to the slice edge values."""
    start = start.astype(jnp.int32)
    length = jnp.maximum(length.astype(jnp.int32), 1)
    n_tab = tab_x.shape[0]
    idx = jnp.arange(n_tab)
    in_seg = (idx[None, :] >= start[:, None]) & (idx[None, :] < (start + length)[:, None])
    xs = jnp.where(in_seg, tab_x[None, :], jnp.inf)
    k = jnp.sum(xs <= x[:, None], axis=1)
    lo = jnp.clip(start + k - 1, start, start + length - 1)
    hi = jnp.clip(start + k, start, start + length - 1)
    x0, x1 = tab_x[lo], tab_x[hi]
    y0, y1 = tab_y[lo], tab_y[hi]
    w = jnp.where(x1 == x0, 0.0, (x - x0) / jnp.where(x1 == x0, 1.0, x1 - x0))
    return y0 + jnp.clip(w, 0.0, 1.0) * (y1 - y0)


# optics kinds whose parameters beyond p0/p1 are needed by shade; scenes
# restricted to the others can run entirely from the intersect kernel's
# carried aux data (no per-ray row gather at all)
_EXTENDED_PARAM_KINDS = {M.K_LAMBERTIAN_SPECULAR, M.K_REFLECT_SPECTRAL,
                         M.K_REFRACTIVE, M.K_COOK_TORRANCE,
                         M.K_FRESNEL_CONDUCTOR, M.K_LAMBERTIAN_PIECEWISE}


def _interp2_segment(th, wl, th_start, T, wl_start, W, grid_start,
                     tab_x, tab_y):
    """Per-ray bilinear interpolation on a (T, W) grid packed into the
    shared table: axis values live in tab_x at [th_start, th_start+T) and
    [wl_start, wl_start+W); grid values row-major in tab_y from
    grid_start. All starts/lengths are per-ray."""
    def axis_locate(x, start, length):
        start = start.astype(jnp.int32)
        length = jnp.maximum(length.astype(jnp.int32), 1)
        idx = jnp.arange(tab_x.shape[0])
        in_seg = ((idx[None, :] >= start[:, None])
                  & (idx[None, :] < (start + length)[:, None]))
        xs = jnp.where(in_seg, tab_x[None, :], jnp.inf)
        k = jnp.sum(xs <= x[:, None], axis=1)
        lo = jnp.clip(start + k - 1, start, start + length - 2)
        x0, x1 = tab_x[lo], tab_x[lo + 1]
        w = jnp.where(x1 == x0, 0.0,
                      (x - x0) / jnp.where(x1 == x0, 1.0, x1 - x0))
        return lo - start, jnp.clip(w, 0.0, 1.0), length

    i, wt, T_i = axis_locate(th, th_start, T)
    j, ww, W_i = axis_locate(wl, wl_start, W)
    base = grid_start.astype(jnp.int32) + i * W_i + j
    g00 = tab_y[base]
    g01 = tab_y[base + 1]
    g10 = tab_y[base + W_i]
    g11 = tab_y[base + W_i + 1]
    return ((1 - wt) * ((1 - ww) * g00 + ww * g01)
            + wt * ((1 - ww) * g10 + ww * g11))


def shade(scene, sid: jnp.ndarray, t: jnp.ndarray, pos: jnp.ndarray,
          dirs: jnp.ndarray, energy: jnp.ndarray, wavelength: jnp.ndarray,
          ref_index: jnp.ndarray, key: jax.Array,
          medium=None, aux=None, split_mode: bool = False) -> ShadeResult:
    """Shade all rays against their hit surfaces (sid >= 0 assumed valid;
    escaped rays get arbitrary-but-finite outputs which the engine masks).

    aux - optional winner shading data carried out of the Pallas intersect
    kernel (see pallas_intersect.nearest_hit_pallas): replaces the per-ray
    surface-row gathers here."""
    n = pos.shape[0]
    s = jnp.maximum(sid, 0)
    kinds = set(scene.kinds_present) or {M.K_REFLECT}
    features = set(scene.features)
    S = scene.num_rows
    n_prm = scene.opt_params.shape[1]

    t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
    hit_g = pos + t_safe[:, None] * dirs

    needs_full_prm = bool(kinds & _EXTENDED_PARAM_KINDS) \
        or "iam" in features
    if aux is not None:
        p_l = aux["local"]
        n_geom = normalize(aux["normal"], eps=1e-30)
        kind, flags = aux["kind"], aux["flags"]
        backside = aux["up_dot"] > 0.0
        if needs_full_prm:
            prm = _gather_rows(scene.opt_params, s)
        else:
            prm = jnp.zeros((n, n_prm), dtype=pos.dtype)
            prm = prm.at[:, 0].set(aux["p0"]).at[:, 1].set(aux["p1"])
    else:
        # ---- packed per-surface row: rot(9) trn(3) quadric(10) params ----
        packed = jnp.concatenate([
            scene.frame[:, :3, :3].reshape(S, 9),
            scene.frame[:, :3, 3],
            scene.quadric,
            scene.opt_params,
        ], axis=1)
        row = _gather_rows(packed, s)
        rot = row[:, 0:9].reshape(n, 3, 3)
        trn = row[:, 9:12]
        quad = row[:, 12:22]
        prm = row[:, 22:22 + n_prm]

        ints = jnp.stack([scene.opt_kind, scene.opt_flags], axis=1)
        introw = _gather_rows(ints, s)
        kind, flags = introw[:, 0], introw[:, 1]

        # local coordinates: p_l = R^T (p - t0)
        rel = hit_g - trn
        p_l = jnp.stack([
            rot[:, 0, 0] * rel[:, 0] + rot[:, 1, 0] * rel[:, 1] + rot[:, 2, 0] * rel[:, 2],
            rot[:, 0, 1] * rel[:, 0] + rot[:, 1, 1] * rel[:, 1] + rot[:, 2, 1] * rel[:, 2],
            rot[:, 0, 2] * rel[:, 0] + rot[:, 1, 2] * rel[:, 1] + rot[:, 2, 2] * rel[:, 2],
        ], axis=1)

        # quadric gradient at the local hit point = 2(A p + b)
        x, y, z = p_l[:, 0], p_l[:, 1], p_l[:, 2]
        grad = jnp.stack([
            quad[:, 0] * x + quad[:, 3] * y + quad[:, 4] * z + quad[:, 6],
            quad[:, 3] * x + quad[:, 1] * y + quad[:, 5] * z + quad[:, 7],
            quad[:, 4] * x + quad[:, 5] * y + quad[:, 2] * z + quad[:, 8],
        ], axis=1)
        n_l = normalize(grad, eps=1e-30)
        n_geom = apply_rot(rot, n_l)
        backside = (dirs[:, 0] * rot[:, 0, 2] + dirs[:, 1] * rot[:, 1, 2]
                    + dirs[:, 2] * rot[:, 2, 2]) > 0.0

    cos_geom = dot(dirs, n_geom)
    # shading normal opposes the incoming ray (ref quadric/flat normal flip)
    ns = jnp.where(cos_geom[:, None] > 0.0, -n_geom, n_geom)

    needs_diffuse = bool(kinds & {M.K_LAMBERTIAN, M.K_LAMBERTIAN_SPECULAR,
                                  M.K_SEMI_LAMBERTIAN,
                                  M.K_LAMBERTIAN_PIECEWISE})
    needs_choice = bool(kinds & {M.K_LAMBERTIAN_SPECULAR, M.K_REFRACTIVE,
                                 M.K_LAMBERTIAN_PIECEWISE})
    needs_slope = "slope_error" in features
    needs_phi = needs_diffuse or needs_slope

    # ---- random draws (only those the scene's optics need) ----------------
    k_phi, k_u, k_th, k_tx, k_choice = jax.random.split(key, 5)
    phi = (jax.random.uniform(k_phi, (n,), dtype=pos.dtype, minval=0.0,
                              maxval=2.0 * jnp.pi) if needs_phi else None)
    u1 = (jax.random.uniform(k_u, (n,), dtype=pos.dtype)
          if needs_diffuse else None)
    u_choice = (jax.random.uniform(k_choice, (n,), dtype=pos.dtype)
                if needs_choice else None)

    # ---- effective absorptivity (incl. IAM and spectral variants) ---------
    absorptivity = prm[:, 0]
    if "spectral" in features:
        spectral = kind == M.K_REFLECT_SPECTRAL
        spec_abs = _interp_segment(wavelength, prm[:, 0], prm[:, 1],
                                   scene.spectral_wl, scene.spectral_ab)
        absorptivity = jnp.where(spectral, spec_abs, absorptivity)
    else:
        spectral = jnp.zeros((n,), dtype=bool)
    cos_aoi = jnp.abs(dot(dirs, ns))
    if "iam" in features:
        # Martin-Ruiz incidence-angle modifier (ref optics_callables.py:271);
        # the exponent c (ref IAM.__init__ c=1) rides in p5 — cos**c with
        # cos clipped away from 0 so c < 1 cannot produce a 0**c NaN grad
        a_r = jnp.where(prm[:, 4] > 0.0, prm[:, 4], 1.0)
        c_exp = jnp.where(prm[:, 5] > 0.0, prm[:, 5], 1.0)
        cos_c = jnp.clip(cos_aoi, 1e-12, 1.0) ** c_exp
        iam_f = (1.0 - jnp.exp(-cos_c / a_r)) / (1.0 - jnp.exp(-1.0 / a_r))
        has_iam = (flags & M.F_IAM) != 0
        absorptivity = jnp.where(has_iam, absorptivity * iam_f, absorptivity)

    # ---- perturbed normal for slope error (ref RealReflective :214) -------
    if needs_slope:
        nrm1 = jax.random.normal(k_th, (n,), dtype=pos.dtype)
        sigma = jnp.where(kind == M.K_REFLECT, prm[:, 1], prm[:, 2])
        th = nrm1 * sigma
        radial_err = jnp.stack([jnp.sin(th) * jnp.cos(phi),
                                jnp.sin(th) * jnp.sin(phi),
                                jnp.cos(th)], axis=1)
        if "bivar" in features:
            nrm2 = jax.random.normal(k_tx, (n,), dtype=pos.dtype)
            tanx = jnp.tan(nrm1 * sigma)
            tany = jnp.tan(nrm2 * sigma)
            ez = 1.0 / jnp.sqrt(1.0 + tanx**2 + tany**2)
            bivar_err = jnp.stack([tanx * ez, tany * ez, ez], axis=1)
            bivar = (flags & M.F_BIVAR) != 0
            err = jnp.where(bivar[:, None], bivar_err, radial_err)
        else:
            err = radial_err
        n_pert = normalize(rotate_to_normal(err, ns), eps=1e-30)
        n_eff = jnp.where((sigma > 0.0)[:, None], n_pert, ns)
    else:
        n_eff = ns

    # ---- candidate interactions, selected by kind --------------------------
    d_reflect = reflections(dirs, n_eff)
    out_dir = d_reflect
    keep_energy = jnp.zeros((n,), dtype=bool)

    if needs_diffuse:
        ang_range = prm[:, 1]
        sinsq = jnp.sin(ang_range) * jnp.sqrt(u1)
        d_lambert = rotate_to_normal(
            jnp.stack([jnp.cos(phi) * sinsq, jnp.sin(phi) * sinsq,
                       jnp.sqrt(jnp.maximum(1.0 - sinsq**2, 0.0))], axis=1),
            ns)
        if M.K_LAMBERTIAN in kinds:
            out_dir = jnp.where((kind == M.K_LAMBERTIAN)[:, None],
                                d_lambert, out_dir)
        if M.K_LAMBERTIAN_SPECULAR in kinds:
            # full-hemisphere diffuse branch (ref LambertianSpecular :553)
            sh = jnp.sqrt(u1)
            d_hemi = rotate_to_normal(
                jnp.stack([jnp.cos(phi) * sh, jnp.sin(phi) * sh,
                           jnp.sqrt(jnp.maximum(1.0 - sh**2, 0.0))], axis=1),
                ns)
            lspec = jnp.where((u_choice < prm[:, 1])[:, None],
                              d_reflect, d_hemi)
            out_dir = jnp.where((kind == M.K_LAMBERTIAN_SPECULAR)[:, None],
                                lspec, out_dir)
        if M.K_SEMI_LAMBERTIAN in kinds:
            # diffuse below ang_range incidence, specular at glancing
            # (ref SemiLambertian :506; both branches absorb)
            ang_in = safe_arccos(cos_aoi)
            d_semi = jnp.where((ang_in > prm[:, 1])[:, None],
                               d_reflect, d_lambert)
            out_dir = jnp.where((kind == M.K_SEMI_LAMBERTIAN)[:, None],
                                d_semi, out_dir)

    out_ref_index = ref_index
    split_rows = None
    if medium is None:
        zero = jnp.zeros_like(ref_index)
        medium = (zero, zero, zero)
    att, scat, g_hg = medium
    out_att, out_scat, out_g = att, scat, g_hg
    if M.K_REFRACTIVE in kinds:
        # Fresnel interface with Russian roulette between reflection and
        # refraction; media toggled vs the ray's current index — or, for
        # index-matched volumetric interfaces (n1 == n2), vs the medium
        # tuple (ref RefractiveHomogenous :1186 / Absorbant / Scattering)
        n1_s, n2_s = prm[:, 0], prm[:, 1]
        if "dispersive" in features:
            # dispersive interfaces: per-ray indices interpolated from the
            # two per-row segments [st, st+L1) and [st+L1, st+L1+L2) of the
            # shared table (ref Refractive optics_callables.py:726 toggles
            # between two wavelength-dependent materials)
            st, L1, L2 = prm[:, 3], prm[:, 4], prm[:, 5]
            n1_d = _interp_segment(wavelength, st, L1,
                                   scene.spectral_wl, scene.spectral_ab)
            n2_d = _interp_segment(wavelength, st + L1, L2,
                                   scene.spectral_wl, scene.spectral_ab)
            disp = L2 > 0.0
            n1_s = jnp.where(disp, n1_d, n1_s)
            n2_s = jnp.where(disp, n2_d, n2_s)
        att1, att2 = prm[:, 6], prm[:, 7]
        sc1, sc2 = prm[:, 8], prm[:, 9]
        g1, g2 = prm[:, 10], prm[:, 11]
        # nearest-match toggle (robust to fp noise in per-ray indices)
        in_medium1 = jnp.where(
            jnp.abs(n1_s - n2_s) > 1e-9,
            jnp.abs(ref_index - n1_s) <= jnp.abs(ref_index - n2_s),
            (att == att1) & (scat == sc1) & (g_hg == g1))
        n_next = jnp.where(in_medium1, n2_s, n1_s)
        att_next = jnp.where(in_medium1, att2, att1)
        scat_next = jnp.where(in_medium1, sc2, sc1)
        g_next = jnp.where(in_medium1, g2, g1)
        refr_ok, d_refract = refractions(ref_index, n_next, dirs, n_eff)
        R = fresnel(dirs, n_eff, ref_index, n_next)
        R = jnp.where(refr_ok, R, 1.0)
        go_reflect = u_choice <= R
        is_refr = kind == M.K_REFRACTIVE
        if split_mode and "split" in features:
            # energy-splitting interfaces (F_SPLIT): the primary lane takes
            # the refracted branch at (1-R) E; the reflected branch is
            # returned via .split for the engine to append as new rays (ref
            # Refractive single_ray=False, optics_callables.py:732, which
            # concatenates both outgoing bundles at :718-722)
            split_rows = is_refr & ((flags.astype(jnp.int32)
                                     & M.F_SPLIT) != 0)
            go_reflect = go_reflect & ~split_rows
            R_split = R
        crossed = is_refr & ~go_reflect
        out_dir = jnp.where(crossed[:, None], d_refract, out_dir)
        keep_energy = keep_energy | is_refr
        out_ref_index = jnp.where(crossed, n_next, ref_index)
        out_att = jnp.where(crossed, att_next, att)
        out_scat = jnp.where(crossed, scat_next, scat)
        out_g = jnp.where(crossed, g_next, g_hg)

    if M.K_COOK_TORRANCE in kinds:
        # Beckmann-sampled microfacet reflection (see materials
        # .bdrf_cook_torrance). Needs its own uniforms.
        k_ct1, k_ct2 = jax.random.split(jax.random.fold_in(key, 7))
        u_ct = jax.random.uniform(k_ct1, (n,), dtype=pos.dtype,
                                  minval=1e-7, maxval=1.0)
        phi_ct = jax.random.uniform(k_ct2, (n,), dtype=pos.dtype,
                                    minval=0.0, maxval=2.0 * jnp.pi)
        alpha_ct = prm[:, 0]
        tan2 = -alpha_ct**2 * jnp.log(u_ct)
        cos_h = 1.0 / jnp.sqrt(1.0 + tan2)
        sin_h = safe_sqrt(1.0 - cos_h**2)   # alpha=0 lanes stay gradable
        h_local = jnp.stack([sin_h * jnp.cos(phi_ct),
                             sin_h * jnp.sin(phi_ct), cos_h], axis=1)
        h_vec = normalize(rotate_to_normal(h_local, ns), eps=1e-30)
        d_ct = reflections(dirs, h_vec)
        # throughput: F(d.h) * G * |d.h| / (|n.d| |n.h|)
        v_dot_h = jnp.abs(dot(dirs, h_vec))
        n_dot_v = jnp.maximum(jnp.abs(dot(dirs, ns)), 1e-6)
        n_dot_h = jnp.maximum(jnp.abs(dot(h_vec, ns)), 1e-6)
        n_dot_l = dot(d_ct, ns)
        from ..optics import fresnel_to_attenuating
        m2 = prm[:, 1] + 1j * prm[:, 2]
        th1 = safe_arccos(jnp.maximum(v_dot_h, 0.0))
        R_p, R_s, _ = fresnel_to_attenuating(1.0, m2, th1)
        F = 0.5 * (R_p + R_s)
        G = jnp.minimum(
            1.0, jnp.minimum(2.0 * n_dot_h * n_dot_v / jnp.maximum(v_dot_h, 1e-6),
                             2.0 * n_dot_h * jnp.abs(n_dot_l)
                             / jnp.maximum(v_dot_h, 1e-6)))
        w_ct = prm[:, 3] * F * G * v_dot_h / (n_dot_v * n_dot_h)
        # reflected below the surface: absorbed
        w_ct = jnp.where(n_dot_l > 0.0, jnp.clip(w_ct, 0.0, 1.0), 0.0)
        is_ct = kind == M.K_COOK_TORRANCE
        out_dir = jnp.where(is_ct[:, None], d_ct, out_dir)
        absorptivity = jnp.where(is_ct, 1.0 - w_ct, absorptivity)

    if M.K_FRESNEL_CONDUCTOR in kinds:
        # conductor interface: specular reflection with randomly-polarized
        # Fresnel reflectance at the ray's wavelength; the transmitted
        # fraction is absorbed in the skin depth (ref
        # FresnelConductorHomogenous optics_callables.py:1523)
        from ..optics import fresnel_to_attenuating
        st_fc, L_fc = prm[:, 1], prm[:, 2]
        n2_fc = _interp_segment(wavelength, st_fc, L_fc,
                                scene.spectral_wl, scene.spectral_ab)
        k2_fc = _interp_segment(wavelength, st_fc + L_fc, L_fc,
                                scene.spectral_wl, scene.spectral_ab)
        th1 = safe_arccos(jnp.maximum(cos_aoi, 0.0))
        n1_fc = jnp.where(prm[:, 0] > 0.0, prm[:, 0], 1.0)
        R_p, R_s, _ = fresnel_to_attenuating(n1_fc, n2_fc + 1j * k2_fc, th1)
        R_fc = jnp.clip(0.5 * (R_p + R_s), 0.0, 1.0)
        is_fc = kind == M.K_FRESNEL_CONDUCTOR
        absorptivity = jnp.where(is_fc, 1.0 - R_fc, absorptivity)
        # direction: the default specular d_reflect

    if M.K_LAMBERTIAN_PIECEWISE in kinds:
        # piecewise directional (and optionally spectral) diffuse
        # absorptance with constant or directional specularity (ref
        # optics_callables.py:331-491 family)
        th_in = safe_arccos(jnp.maximum(cos_aoi, 0.0))
        abs_pw = _interp_segment(th_in, prm[:, 0], prm[:, 1],
                                 scene.spectral_wl, scene.spectral_ab)
        if "lambertian_piecewise_spectral" in features:
            abs_2d = _interp2_segment(th_in, wavelength, prm[:, 0],
                                      prm[:, 1], prm[:, 4], prm[:, 5],
                                      prm[:, 6], scene.spectral_wl,
                                      scene.spectral_ab)
            abs_pw = jnp.where(prm[:, 5] > 0.0, abs_2d, abs_pw)
        is_lpw = kind == M.K_LAMBERTIAN_PIECEWISE
        absorptivity = jnp.where(is_lpw, abs_pw, absorptivity)
        # specular probability: constant (p2) or interpolated over theta
        # from its own chunk (p3 >= 0)
        spec_p = prm[:, 2]
        if "lambertian_piecewise_dirspec" in features:
            spec_tab = _interp_segment(th_in, prm[:, 3], prm[:, 1],
                                       scene.spectral_wl, scene.spectral_ab)
            spec_p = jnp.where(prm[:, 3] >= 0.0, spec_tab, spec_p)
        # full-hemisphere diffuse branch (ref pillbox ang_range = pi/2)
        sh_pw = jnp.sqrt(u1)
        d_hemi_pw = rotate_to_normal(
            jnp.stack([jnp.cos(phi) * sh_pw, jnp.sin(phi) * sh_pw,
                       jnp.sqrt(jnp.maximum(1.0 - sh_pw**2, 0.0))], axis=1),
            ns)
        d_lpw = jnp.where((u_choice < spec_p)[:, None], d_reflect, d_hemi_pw)
        out_dir = jnp.where(is_lpw[:, None], d_lpw, out_dir)

    out_pos = hit_g
    if M.K_PERIODIC in kinds:
        # teleport by period along the (flipped-against-ray) normal
        # (ref PeriodicBoundary :690)
        is_periodic = kind == M.K_PERIODIC
        out_dir = jnp.where(is_periodic[:, None], dirs, out_dir)
        out_pos = jnp.where(is_periodic[:, None],
                            hit_g + prm[:, 0][:, None] * ns, out_pos)
        keep_energy = keep_energy | is_periodic
    if M.K_TRANSPARENT in kinds:
        is_transp = kind == M.K_TRANSPARENT
        out_dir = jnp.where(is_transp[:, None], dirs, out_dir)
        keep_energy = keep_energy | is_transp

    out_dir = normalize(out_dir, eps=1e-30)

    out_energy = jnp.where(keep_energy, energy,
                           energy * (1.0 - absorptivity))
    if "one_sided" in features:
        one_sided = (flags & M.F_ONE_SIDED) != 0
        out_energy = jnp.where(one_sided & backside, 0.0, out_energy)

    absorbed = energy - out_energy

    split_info = None
    if split_rows is not None:
        # reflected branch of splitting interfaces: R E leaves on a new ray,
        # nothing extra is absorbed (carved out AFTER absorbed above)
        sec_e = jnp.where(split_rows, out_energy * R_split, 0.0)
        out_energy = out_energy - sec_e
        split_info = (split_rows, sec_e, d_reflect)

    return ShadeResult(out_pos, out_dir, out_energy, out_ref_index,
                       (out_att, out_scat, out_g), absorbed, p_l, ns,
                       backside, split_info)

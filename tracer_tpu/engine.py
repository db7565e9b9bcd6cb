"""Trace engine: the Monte-Carlo bounce loop.

TPU-native replacement for the reference's ``TracerEngine.ray_tracer``
(tracer/tracer_engine.py:124-295): the ray population lives in a fixed-size
slab (dead rays are masked, not removed), each bounce is one fused
intersect+shade kernel over the whole slab, and accounting happens by
scatter-add into per-surface accumulators instead of per-surface Python
append-lists.

Two drivers:
  * :func:`TracerEngine.ray_tracer` — host-stepped loop (one jitted bounce per
    step). Keeps full per-bounce records (the genealogy "RayTree" and all
    accountant data), stops early when the bundle dies, like the reference.
  * :func:`trace_fused` — single jitted ``lax.while_loop``; accumulators only.
    This is the benchmark/sharded path (shard the ray axis over a mesh).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .bundle import RayBundle
from .kernels.intersect import nearest_hit_aux
from .kernels.shade import shade
from .scene import Assembly, SceneMeta, SceneTable, compile_scene


@struct.dataclass
class TraceAccum:
    """Device-side energy bookkeeping (per scene-table row)."""

    absorbed: jnp.ndarray   # (S,) energy deposited per surface row
    hits: jnp.ndarray       # (S,) number of ray hits per surface row
    escaped: jnp.ndarray    # () energy that left the scene
    culled: jnp.ndarray     # () energy dropped by the min_energy threshold
    medium: jnp.ndarray     # () energy absorbed by participating media
    residual: jnp.ndarray = None  # () energy still on live rays at exit
    # (streaming drivers account it so closure is exact even when
    # max_rounds exits early — ref tracer_engine.py:292-294 only warns)
    flux: tuple = ()        # per-FluxSpec (nu, nv) device flux histograms
    # (analysis/device_fluxmap — the fast-path answer to the reference's
    # host-side streaming flux maps, Sandia example.py:218-227)

    @classmethod
    def zeros(cls, n_rows: int, dtype=jnp.float32,
              fluxspecs: tuple = ()) -> "TraceAccum":
        from .analysis import device_fluxmap as _dfm
        return cls(absorbed=jnp.zeros((n_rows,), dtype=dtype),
                   hits=jnp.zeros((n_rows,), dtype=dtype),
                   escaped=jnp.zeros((), dtype=dtype),
                   culled=jnp.zeros((), dtype=dtype),
                   medium=jnp.zeros((), dtype=dtype),
                   residual=jnp.zeros((), dtype=dtype),
                   flux=_dfm.zeros_for(fluxspecs, dtype=dtype))

    def __add__(self, other: "TraceAccum") -> "TraceAccum":
        return jax.tree_util.tree_map(lambda a, b: a + b, self, other)


@struct.dataclass
class BounceRecord:
    """Per-bounce, per-ray-slot record (the genealogy/accounting data).

    The slot index is the ray id: slot i in bounce b descends from slot i in
    bounce b-1 (fixed-slab design), so no parent array is needed — this
    replaces the reference's RayTree parent bookkeeping (trace_tree.py).
    """

    sid: jnp.ndarray        # (N,) hit surface row, -1 = escaped/dead
    t: jnp.ndarray          # (N,) hit distance
    hit: jnp.ndarray        # (N,3) global hit point
    local: jnp.ndarray      # (N,3) local-frame hit point
    dir_in: jnp.ndarray     # (N,3)
    dir_out: jnp.ndarray    # (N,3)
    e_in: jnp.ndarray       # (N,)
    e_out: jnp.ndarray      # (N,)
    absorbed: jnp.ndarray   # (N,)
    backside: jnp.ndarray   # (N,) bool
    alive_in: jnp.ndarray   # (N,) bool — slot carried a live ray this bounce
    wavelength: jnp.ndarray = None  # (N,) per-hit ray wavelength
    #   (ref SpectralAccountant optics_callables.py:1801 /
    #    PolychromaticAccountant :1825)
    normal: jnp.ndarray = None      # (N,3) shading normal at the hit
    #   (ref NormalAccountant :1773)
    spectra: jnp.ndarray = None     # (N, K) POST-interaction per-ray
    #   spectra on the bundle's shared grid (polychromatic bundles only;
    #   ref PolychromaticAccountant :1825 records outgoing spectra)
    # energy-splitting mode only: (mask, secondary energy, reflected dir)
    split: Optional[tuple] = None
    bounce: Optional[int] = None    # bounce index (set by the engine; lets
    #   tag-gated record lists stay sparse without losing the genealogy)
    slot: Optional[jnp.ndarray] = None  # (K,) original slab slot of each
    #   entry when the record was COMPACTED on device (record="tags"):
    #   arrays then hold only the tagged hits, not the whole slab


@dataclasses.dataclass
class TraceOptions:
    max_bounces: int = 100
    min_energy: float = 1e-6
    t_eps: float = None  # None -> dtype default (intersect.default_t_eps)
    disc_eps: float = 1e-6
    block: int = 64          # surfaces per intersection scan step
    # True: keep full per-bounce records (debug/genealogy mode).
    # "tags": record ONLY hits on surfaces whose OpticsSpec carries record
    #   tags (materials.with_accounting / receiver() / detector()), and
    #   skip the device->host transfer entirely for bounces in which no
    #   tagged surface was hit — the reference's per-surface accountant
    #   configuration, actually gating capture.
    # False: no records.
    record: object = True


def _iam_mode(scene: SceneTable):
    """False when the scene has no IAM rows; otherwise the scene's single
    STATIC Martin-Ruiz exponent c as a truthy float for the kernels'
    ``iam`` switch (1.0 = the plain modifier; anything else bakes cos^c
    into the fused epilogue — compile_scene tags mixed exponents
    "iam_nonmirror" so exactly one value reaches here)."""
    if "iam" not in scene.features:
        return False
    return float(getattr(scene, "iam_c", 1.0)) or 1.0


def _bivar_mode(scene: SceneTable):
    """Static slope-error model for the fused Pallas path: True when every
    slope-error surface carries F_BIVAR, False when none does, "mixed" when
    both kinds of mirror coexist (the kernel then selects per lane from the
    carried flags, exactly like shade.py's per-surface `flags & F_BIVAR`).
    Only sigma>0 rows vote (slope_flags_present): surfaces without slope
    error are model-indifferent, so they must not force the mixed kernel."""
    from . import materials as _M
    bv = [bool(f & _M.F_BIVAR) for f in scene.slope_flags_present]
    if not bv:
        return False  # no slope-error surfaces: slope gate is off anyway
    if all(bv):
        return True
    if not any(bv):
        return False
    return "mixed"


def _account(scene: SceneTable, accum: TraceAccum, sid, hit, escaped,
             absorbed_ray, energy, count_hits: bool) -> TraceAccum:
    """Per-surface energy accounting for one bounce.

    Small scenes: masked reductions (beat TPU scatters ~30x). Large scenes:
    one-hot bf16 matmul — XLA fuses the one-hot generation into the MXU
    pass, making it ~free, while a TPU scatter of 1M rays into a few
    hundred bins costs ~9 ms; the one-hot is exact in bf16, the absorbed
    values are bf16-rounded (<0.4% per ray, negligible vs MC noise) and
    accumulated in float32."""
    n_rows = scene.frame.shape[0]
    new_escaped = accum.escaped + jnp.sum(jnp.where(escaped, energy, 0.0))
    if n_rows <= 64:
        absorbed_rows = jnp.stack(
            [jnp.sum(jnp.where(sid == s_i, absorbed_ray, 0.0))
             for s_i in range(n_rows)])
        new_hits = accum.hits
        if count_hits:
            hit_f = jnp.where(hit, 1.0, 0.0)
            new_hits = accum.hits + jnp.stack(
                [jnp.sum(jnp.where(sid == s_i, hit_f, 0.0))
                 for s_i in range(n_rows)])
        return accum.replace(absorbed=accum.absorbed + absorbed_rows,
                             hits=new_hits, escaped=new_escaped)
    sid_safe = jnp.maximum(sid, 0)
    onehot = (sid_safe[None, :] == jnp.arange(n_rows)[:, None]
              ).astype(jnp.bfloat16)
    if count_hits:
        vals = jnp.stack([absorbed_ray, jnp.where(hit, 1.0, 0.0)],
                         axis=1).astype(jnp.bfloat16)
        acc2 = jnp.matmul(onehot, vals, preferred_element_type=jnp.float32)
        return accum.replace(
            absorbed=accum.absorbed + acc2[:, 0].astype(accum.absorbed.dtype),
            hits=accum.hits + acc2[:, 1].astype(accum.hits.dtype),
            escaped=new_escaped)
    add = jnp.matmul(onehot, absorbed_ray[:, None].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)[:, 0]
    return accum.replace(
        absorbed=accum.absorbed + add.astype(accum.absorbed.dtype),
        escaped=new_escaped)


def _rows_alpha_on_grid(scene, meta, grid):
    """Host precompute for POLYCHROMATIC traces: (has_tab (S,) bool,
    alpha (S, K)) — every K_REFLECT_SPECTRAL row's absorptance table
    interpolated onto the bundle's shared wavelength grid, so the bounce
    step's spectral multiply is one gather + elementwise product (ref
    optics_callables.py:137-138 evaluates per-ray spectra against each
    manager's spectrum). Conductor/dispersive-index rows keep the scalar
    energy ratio of the sampled wavelength (gray approximation for the
    spectrum SHAPE; energies stay exact); piecewise-spectral rows need
    per-angle spectra and are rejected loudly."""
    from . import materials as _M
    kinds = (meta.host_opt_kind if meta is not None
             and meta.host_opt_kind is not None
             else np.asarray(scene.opt_kind))
    prm = (meta.host_opt_params if meta is not None
           and meta.host_opt_params is not None
           else np.asarray(scene.opt_params))
    if "lambertian_piecewise_spectral" in scene.features:
        raise NotImplementedError(
            "polychromatic bundles with piecewise (theta, wl) spectral "
            "rows are not supported: their filter depends on the "
            "incidence angle per hit; use K_REFLECT_SPECTRAL tables or "
            "trace monochromatic wavelength samples")
    g = np.asarray(grid, dtype=np.float64)
    wl_tab = np.asarray(scene.spectral_wl, dtype=np.float64)
    ab_tab = np.asarray(scene.spectral_ab, dtype=np.float64)
    S = len(kinds)
    has = np.zeros(S, dtype=bool)
    alpha = np.zeros((S, len(g)))
    for r in np.nonzero(kinds == _M.K_REFLECT_SPECTRAL)[0]:
        start, ln = int(round(prm[r, 0])), int(round(prm[r, 1]))
        has[r] = True
        alpha[r] = np.interp(g, wl_tab[start:start + ln],
                             ab_tab[start:start + ln])
    dt = jnp.asarray(grid).dtype
    return jnp.asarray(has), jnp.asarray(alpha, dtype=dt)


@functools.partial(jax.jit,
                   static_argnames=("min_energy", "t_eps", "disc_eps", "block",
                                    "count_hits", "need_local", "split_mode",
                                    "force_jnp"))
def _bounce_step(scene: SceneTable, bundle: RayBundle, accum: TraceAccum,
                 key: jax.Array, min_energy: float, t_eps, disc_eps: float,
                 block: int, count_hits: bool = True,
                 need_local: bool = True, split_mode: bool = False,
                 cand=None, force_jnp: bool = False, spectral_alpha=None):
    """One bounce: intersect, shade, account. Returns (bundle', accum', rec).

    With volumetric media in the scene ("volumetric" feature), a scattering
    event is sampled along each segment before the surface interaction: rays
    whose Henyey-Greenstein free path ends before the surface scatter there
    instead (ref Scattering :946), and all rays are Beer-Lambert attenuated
    over the traversed distance (ref Absorbant :861). The exponential free
    path is memoryless, so re-sampling after every event (including periodic
    teleports) is statistically identical to the reference's remaining-path
    carry-over (optics.py:214 complex-sigma trick).
    """
    n_rows = scene.frame.shape[0]
    alive = bundle.alive & (bundle.energy > 0.0)

    # Fully-fused fast path for single-group pure-specular scenes (e.g.
    # heliostat fields): intersect + reflect + slope error + one-sided kill
    # in one Pallas kernel, one HBM round trip of the ray state per bounce.
    # K_REFRACTIVE joins when non-dispersive/non-volumetric/non-splitting:
    # the kernel threads a per-lane refraction index and Russian-roulettes
    # Fresnel reflection vs Snell refraction (shade.py's branch, fused).
    from . import materials as _M
    from .kernels.intersect import (_use_pallas, default_t_eps,
                                    pallas_rows_fit)
    fusable_kinds = {_M.K_REFLECT, _M.K_LAMBERTIAN, _M.K_COOK_TORRANCE,
                     _M.K_LAMBERTIAN_SPECULAR, _M.K_SEMI_LAMBERTIAN,
                     _M.K_TRANSPARENT, _M.K_FRESNEL_CONDUCTOR,
                     _M.K_PERIODIC, _M.K_LAMBERTIAN_PIECEWISE}
    # F_SPLIT scenes may fuse ONLY under split_mode: the kernel then
    # emits the reflected branch through dedicated outputs
    # (refr_split) instead of rouletting — without split_mode the RR
    # kernel would silently drop the secondary's energy share (biased)
    refr_ok = (_M.K_REFRACTIVE in scene.kinds_present
               and "volumetric" not in scene.features
               and "dispersive" not in scene.features
               and ("split" not in scene.features or split_mode))
    if refr_ok:
        fusable_kinds = fusable_kinds | {_M.K_REFRACTIVE}
    use_fused = (cand is None
                 and not force_jnp
                 and not need_local
                 and set(scene.kinds_present) <= fusable_kinds
                 and "volumetric" not in scene.features
                 and "iam_nonmirror" not in scene.features
                 and _use_pallas(bundle.pos)
                 and pallas_rows_fit(scene))
    if use_fused:
        from .kernels.pallas_intersect import (bounce_reflect_pallas,
                                               pack_rows)
        refractive = _M.K_REFRACTIVE in scene.kinds_present
        fc_scene = _M.K_FRESNEL_CONDUCTOR in scene.kinds_present
        lpw_scene = _M.K_LAMBERTIAN_PIECEWISE in scene.kinds_present
        # dispersive conductors interpolate n(wl)/k(wl) in-kernel, so the
        # per-lane wavelength must thread through (spectral mode);
        # constant-index chunks resolve with the dummy wl. Same for the
        # bilinear (theta, wl) piecewise-Lambertian grids.
        need_wl = ((fc_scene and "conductor_dispersive" in scene.features)
                   or (lpw_scene
                       and "lambertian_piecewise_spectral"
                       in scene.features))
        key, k_seed = jax.random.split(key)
        seed = jax.random.randint(k_seed, (1,), 0, jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)
        te = default_t_eps(bundle.pos.dtype) if t_eps is None else t_eps
        outs = bounce_reflect_pallas(
            pack_rows(scene), seed, bundle.pos, bundle.dir, bundle.energy,
            scene.groups, te, disc_eps,
            bivar=_bivar_mode(scene),
            one_sided="one_sided" in scene.features,
            slope="slope_error" in scene.features,
            lambertian=_M.K_LAMBERTIAN in scene.kinds_present,
            wavelength=(bundle.wavelength.astype(jnp.float32)
                        if need_wl else None),
            spectral_tab=(jnp.stack([scene.spectral_wl, scene.spectral_ab],
                                    axis=1).astype(jnp.float32)
                          if fc_scene or lpw_scene else None),
            ref_index=(bundle.ref_index.astype(jnp.float32)
                       if refractive else None),
            cook_torrance=_M.K_COOK_TORRANCE in scene.kinds_present,
            lam_specular=_M.K_LAMBERTIAN_SPECULAR in scene.kinds_present,
            semi_lambertian=_M.K_SEMI_LAMBERTIAN in scene.kinds_present,
            transparent=_M.K_TRANSPARENT in scene.kinds_present,
            conductor=fc_scene, iam=_iam_mode(scene),
            periodic=_M.K_PERIODIC in scene.kinds_present,
            piecewise=lpw_scene,
            refr_frost=(refractive
                        and "refractive_slope" in scene.features),
            refr_split=(refractive and split_mode
                        and "split" in scene.features),
            backside_miss="bifacial" in scene.features)
        new_pos, new_dir, new_e, sid, absorbed_f = outs[:5]
        k_o = 5 + int(need_wl)  # spectral mode returns the (unchanged) wl
        new_ri = outs[k_o] if refractive else bundle.ref_index
        sid = jnp.where(alive, sid, -1)
        hit = sid >= 0
        escaped = alive & ~hit
        e_in = jnp.where(hit, bundle.energy, 0.0)
        e_out = jnp.where(hit, new_e, 0.0)
        absorbed_ray = jnp.where(hit, absorbed_f, 0.0)
        accum = _account(scene, accum, sid, hit, escaped, absorbed_ray,
                         bundle.energy, count_hits)
        low = hit & (e_out <= min_energy)
        accum = accum.replace(
            culled=accum.culled + jnp.sum(jnp.where(low, e_out, 0.0)))
        alive_next = hit & ~low
        new_bundle = bundle.replace(
            pos=jnp.where(hit[:, None], new_pos, bundle.pos),
            dir=jnp.where(hit[:, None], new_dir, bundle.dir),
            energy=jnp.where(alive_next, e_out, 0.0),
            ref_index=jnp.where(hit, new_ri.astype(bundle.ref_index.dtype),
                                bundle.ref_index),
            alive=alive_next)
        rec_split = None
        if split_mode and "split" in scene.features:
            s_e, s_dir = outs[-2], outs[-1]
            s_mask = alive & (s_e > 0.0)
            rec_split = (s_mask, jnp.where(s_mask, s_e, 0.0), s_dir)
        zeros3 = jnp.zeros_like(bundle.pos)
        rec = BounceRecord(
            sid=sid, t=jnp.where(hit, 0.0, jnp.inf), hit=new_pos,
            local=zeros3, dir_in=bundle.dir, dir_out=new_dir, e_in=e_in,
            e_out=e_out, absorbed=absorbed_ray,
            backside=jnp.zeros_like(hit), alive_in=alive,
            wavelength=bundle.wavelength, normal=zeros3,
            split=rec_split)
        return new_bundle, accum, rec

    if cand is not None:
        # Kd-accelerated path: each ray tests only its traversal candidates
        # (ref 'lightweight' accel mode, tracer_engine.py:195-207)
        from .kernels.intersect import nearest_hit_candidates
        t, sid = nearest_hit_candidates(scene, cand, bundle.pos, bundle.dir,
                                        t_eps=t_eps, disc_eps=disc_eps)
        aux = None
    elif force_jnp and scene.num_rows >= 48:
        # differentiable mode (diff.trace_diff) on MULTI-ROW scenes: the
        # nearest-hit WINNER CHOICE runs on the fast dispatch (the
        # Pallas kernel on TPU) under stop_gradient, since sid is
        # integral and AD cannot flow through the kernel anyway; the
        # winner's distance is then recomputed DIFFERENTIABLY per ray
        # against its own row (_candidate_t, O(N) both ways — the
        # O(N*S) brute force never enters the backward pass). Below the
        # row threshold the brute force is cheaper than the recompute's
        # fixed costs (per-ray gathers + kernel dispatch: the 2-row
        # config-9 dish measured 1.7 vs 13.8 Mrays/s on the recompute
        # path), so small scenes keep the plain differentiable brute
        # force below.
        from .kernels.intersect import (_candidate_t, default_t_eps,
                                        nearest_hit)
        sg = jax.lax.stop_gradient
        te = default_t_eps(bundle.pos.dtype) if t_eps is None else t_eps
        t_ng, sid = nearest_hit(sg(scene), sg(bundle.pos), sg(bundle.dir),
                                t_eps=te, disc_eps=disc_eps, block=block)
        t = _candidate_t(scene, sid, bundle.pos, bundle.dir, te, disc_eps)
        # boundary lanes where the recompute's epsilon ordering disagrees
        # with the kernel keep the kernel's value (no gradient there —
        # measure-zero set) instead of poisoning downstream with inf
        t = jnp.where((sid >= 0) & ~jnp.isfinite(t), t_ng, t)
        aux = None
    else:
        t, sid, aux = nearest_hit_aux(scene, bundle.pos, bundle.dir,
                                      t_eps=t_eps, disc_eps=disc_eps,
                                      block=block, need_local=need_local,
                                      force_jnp=force_jnp)
    sid = jnp.where(alive, sid, -1)

    volumetric = "volumetric" in scene.features
    scattered = jnp.zeros_like(alive)
    if volumetric:
        key, k_free, k_th, k_phi = jax.random.split(key, 4)
        u = jax.random.uniform(k_free, (bundle.num_rays,),
                               dtype=bundle.pos.dtype,
                               minval=jnp.finfo(jnp.float32).tiny, maxval=1.0)
        sigma_s = bundle.scat_coeff
        free_path = jnp.where(sigma_s > 0.0,
                              -jnp.log(u) / jnp.where(sigma_s > 0.0,
                                                      sigma_s, 1.0),
                              jnp.inf)
        t_hit = jnp.where(sid >= 0, t, jnp.inf)
        scattered = alive & (free_path < t_hit)
        sid = jnp.where(scattered, -1, sid)
        # Beer-Lambert attenuation over the traversed distance
        travel = jnp.minimum(free_path, t_hit)
        att_ok = jnp.isfinite(travel) & (bundle.att_coeff > 0.0)
        trans = jnp.exp(-bundle.att_coeff * jnp.where(att_ok, travel, 0.0))
        new_energy = jnp.where(alive & att_ok,
                               bundle.energy * trans, bundle.energy)
        # attenuation is energy lost to the medium, not to a surface
        accum = accum.replace(medium=accum.medium + jnp.sum(
            jnp.where(alive, bundle.energy - new_energy, 0.0)))
        if bundle.spectra is not None:
            # the gray ambient medium scales the whole spectrum
            bundle = bundle.replace(
                spectra=bundle.spectra
                * jnp.where(alive & att_ok, trans, 1.0)[:, None])
        bundle = bundle.replace(energy=new_energy)
        # Henyey-Greenstein scattering direction about the travel direction
        g = bundle.scat_g
        sg = jax.random.uniform(k_th, (bundle.num_rays,),
                                dtype=bundle.pos.dtype) * 2.0 - 1.0
        cos_th = jnp.where(
            jnp.abs(g) < 1e-9, sg,
            (1.0 + g**2 - ((1.0 - g**2)
                           / (1.0 + g * sg)) ** 2) / (2.0 * jnp.where(
                               jnp.abs(g) < 1e-9, 1.0, g)))
        cos_th = jnp.clip(cos_th, -1.0, 1.0)
        from .mathutils import safe_sqrt
        sin_th = safe_sqrt(1.0 - cos_th**2)   # |cos|=1 lanes stay gradable
        phi = jax.random.uniform(k_phi, (bundle.num_rays,),
                                 dtype=bundle.pos.dtype,
                                 minval=0.0, maxval=2.0 * jnp.pi)
    hit = sid >= 0
    escaped = alive & ~hit & ~scattered

    res = shade(scene, sid, t, bundle.pos, bundle.dir, bundle.energy,
                bundle.wavelength, bundle.ref_index, key,
                medium=(bundle.att_coeff, bundle.scat_coeff, bundle.scat_g),
                aux=aux, split_mode=split_mode)

    e_in = jnp.where(hit, bundle.energy, 0.0)
    e_out = jnp.where(hit, res.out_energy, 0.0)
    absorbed_ray = jnp.where(hit, res.absorbed, 0.0)
    new_spectra = None
    if bundle.spectra is not None:
        # polychromatic interaction (ref optics_callables.py:137-138):
        # rows with a spectral absorptance table multiply the spectrum by
        # 1 - alpha(grid) and the OUTGOING ENERGY becomes the trapezoid
        # integral of the filtered spectrum; every other kind scales the
        # spectrum by its scalar energy ratio (reflection/refraction
        # splits, roulette, IAM, ... are wavelength-flat here)
        ratio = jnp.where(e_in > 0.0, e_out / jnp.maximum(e_in, 1e-30),
                          0.0)
        s0 = jnp.maximum(sid, 0)
        if spectral_alpha is not None:
            has_tab, alpha = spectral_alpha       # (S,) bool, (S, K)
            ht = hit & has_tab[s0]
            fac = jnp.where(ht[:, None], 1.0 - alpha[s0], ratio[:, None])
        else:
            ht = jnp.zeros_like(hit)
            fac = ratio[:, None]
        new_spectra = jnp.where(hit[:, None], bundle.spectra * fac,
                                bundle.spectra)
        e_spec = jnp.trapezoid(new_spectra, bundle.spectral_grid, axis=1)
        e_out = jnp.where(ht, e_spec, e_out)
        absorbed_ray = jnp.where(ht, e_in - e_out, absorbed_ray)

    accum = _account(scene, accum, sid, hit, escaped, absorbed_ray,
                     bundle.energy, count_hits)

    low = hit & (e_out <= min_energy)
    accum = accum.replace(culled=accum.culled + jnp.sum(jnp.where(low, e_out, 0.0)))
    alive_next = hit & ~low

    out_att, out_scat, out_g = res.out_medium
    new_bundle = bundle.replace(
        pos=jnp.where(hit[:, None], res.out_pos, bundle.pos),
        dir=jnp.where(hit[:, None], res.out_dir, bundle.dir),
        energy=jnp.where(alive_next, e_out, 0.0),
        ref_index=jnp.where(hit, res.out_ref_index, bundle.ref_index),
        att_coeff=jnp.where(hit, out_att, bundle.att_coeff),
        scat_coeff=jnp.where(hit, out_scat, bundle.scat_coeff),
        alive=alive_next,
    )
    new_bundle = new_bundle.replace(
        scat_g=jnp.where(hit, out_g, bundle.scat_g))
    if volumetric:
        # scattered rays: move to the event point, take the HG direction,
        # stay alive (their energy was already attenuated above)
        from .mathutils import rotate_to_normal
        local = jnp.stack([sin_th * jnp.cos(phi), sin_th * jnp.sin(phi),
                           cos_th], axis=1)
        d_scat = rotate_to_normal(local, bundle.dir)
        p_scat = bundle.pos + jnp.where(scattered, free_path, 0.0)[:, None] \
            * bundle.dir
        new_bundle = new_bundle.replace(
            pos=jnp.where(scattered[:, None], p_scat, new_bundle.pos),
            dir=jnp.where(scattered[:, None], d_scat, new_bundle.dir),
            energy=jnp.where(scattered, bundle.energy, new_bundle.energy),
            alive=new_bundle.alive | scattered,
        )

    if new_spectra is not None:
        new_bundle = new_bundle.replace(spectra=new_spectra)
    rec_split = None
    if res.split is not None:
        s_rows, s_e, s_dir = res.split
        s_mask = hit & alive & s_rows
        rec_split = (s_mask, jnp.where(s_mask, s_e, 0.0), s_dir)
    rec = BounceRecord(
        sid=sid, t=t, hit=res.out_pos, local=res.local_pt,
        dir_in=bundle.dir, dir_out=res.out_dir,
        e_in=e_in, e_out=e_out, absorbed=absorbed_ray,
        backside=res.backside & hit, alive_in=alive,
        wavelength=bundle.wavelength, normal=res.normal, split=rec_split,
        spectra=new_spectra,
    )
    return new_bundle, accum, rec


@dataclasses.dataclass
class TraceResult:
    """Host-side result: final bundle, accumulators, per-bounce records."""

    scene: SceneTable
    meta: Optional[SceneMeta]
    final: RayBundle
    accum: TraceAccum
    records: List[BounceRecord]
    source: RayBundle

    # ---- accountant-style queries (ref optics_callables accountants) ------
    def _rows_of(self, surface) -> np.ndarray:
        """Scene-table row ids of a logical surface (by index or name)."""
        if self.meta is None:
            raise ValueError("no SceneMeta attached")
        if isinstance(surface, str):
            surface = self.meta.index_of(surface)
        return np.nonzero(self.meta.row_logical == surface)[0]

    def hits_of(self, surface):
        """All hits on a logical surface across bounces, as a dict of numpy
        arrays: global/local hit points, absorbed & incident energy,
        incoming directions, per-hit wavelength and shading normal, bounce
        index. This is the query surface of the reference's accountant
        classes — Location/Absorption/Direction (optics_callables.py:1597+),
        Spectral (:1801) via ``wavelength`` and Normal (:1773) via
        ``normal``."""
        rows = set(self._rows_of(surface).tolist())
        poly = any(rec.spectra is not None for rec in self.records)
        out = dict(hit=[], local=[], absorbed=[], e_in=[], e_out=[],
                   dir_in=[], bounce=[], backside=[], wavelength=[],
                   normal=[])
        if poly:
            out["spectra"] = []   # (n_hits, K) outgoing per-hit spectra
            #   (ref PolychromaticAccountant optics_callables.py:1825)
        for b, rec in enumerate(self.records):
            sid = np.asarray(rec.sid)
            mask = np.isin(sid, list(rows)) & np.asarray(rec.alive_in)
            if not mask.any():
                continue
            if poly:
                out["spectra"].append(np.asarray(rec.spectra)[mask])
            out["hit"].append(np.asarray(rec.hit)[mask])
            out["local"].append(np.asarray(rec.local)[mask])
            out["absorbed"].append(np.asarray(rec.absorbed)[mask])
            out["e_in"].append(np.asarray(rec.e_in)[mask])
            out["e_out"].append(np.asarray(rec.e_out)[mask])
            out["dir_in"].append(np.asarray(rec.dir_in)[mask])
            out["backside"].append(np.asarray(rec.backside)[mask])
            out["wavelength"].append(np.asarray(rec.wavelength)[mask])
            out["normal"].append(np.asarray(rec.normal)[mask])
            out["bounce"].append(np.full(
                mask.sum(), b if rec.bounce is None else int(rec.bounce)))
        vec3 = ("hit", "local", "dir_in", "normal")
        return {k: (np.concatenate(v) if v
                    else np.empty((0, 3) if k in vec3 else (0,)))
                for k, v in out.items()}

    def absorbed_by_logical(self) -> np.ndarray:
        """Absorbed energy aggregated to logical surfaces."""
        rows = np.asarray(self.accum.absorbed)
        if self.meta is None:
            return rows
        n = self.meta.row_logical.max() + 1
        out = np.zeros(n)
        np.add.at(out, self.meta.row_logical, rows)
        return out

    def energy_balance(self) -> dict:
        src = float(np.asarray(self.source.total_energy()))
        absorbed = float(np.asarray(self.accum.absorbed).sum())
        escaped = float(np.asarray(self.accum.escaped))
        culled = float(np.asarray(self.accum.culled))
        residual = float(np.asarray(self.final.total_energy())) \
            + float(np.asarray(self.accum.residual))
        medium = float(np.asarray(self.accum.medium))
        return dict(source=src, absorbed=absorbed, escaped=escaped,
                    culled=culled, medium=medium, residual=residual,
                    closure=src - absorbed - escaped - culled - medium
                    - residual)

    def ray_history(self, slot: int):
        """Walk one ray slot through the bounces (genealogy query,
        replacing ref trace_tree.RayTree.ray_history). With full records
        (record=True) this is the complete path; with compacted tag-gated
        records it lists only the recorded (tagged) hits of that slot."""
        hist = []
        for b, rec in enumerate(self.records):
            if rec.slot is not None:
                pos = np.nonzero(np.asarray(rec.slot) == slot)[0]
                pos = [p for p in pos if bool(np.asarray(rec.alive_in)[p])]
                if not pos:
                    continue
                i = int(pos[0])
            else:
                if not bool(np.asarray(rec.alive_in)[slot]):
                    break
                i = slot
            hist.append(dict(
                bounce=b if rec.bounce is None else int(rec.bounce),
                sid=int(np.asarray(rec.sid)[i]),
                hit=np.asarray(rec.hit)[i],
                e_in=float(np.asarray(rec.e_in)[i]),
                e_out=float(np.asarray(rec.e_out)[i])))
        return hist


class TracerEngine:
    """Drives tracing of a scene. Mirrors the reference engine's API shape
    (construct with an Assembly, then ray_tracer(bundle, reps, min_energy))
    on top of the compiled scene table."""

    def __init__(self, assembly_or_table, meta: Optional[SceneMeta] = None,
                 dtype=None):
        if isinstance(assembly_or_table, Assembly):
            if dtype is None:
                dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
            self.scene, self.meta = compile_scene(assembly_or_table, dtype=dtype)
        else:
            self.scene = assembly_or_table
            self.meta = meta
        self.tree: Optional[TraceResult] = None

    def ray_tracer(self, bundle: RayBundle, reps: int = 100,
                   min_energy: float = 1e-6, key: Optional[jax.Array] = None,
                   opts: Optional[TraceOptions] = None,
                   accel=None) -> TraceResult:
        """Host-stepped trace with per-bounce records.

        accel: None for the brute-force group kernels; "lightweight" (or
        True) builds a Kd-tree over the scene rows (accel.KdTree, the ref's
        tracer/accel_tree.py) and, per bounce, traverses it on the host to
        get per-ray candidate lists that the intersect kernel then tests
        exclusively — the reference's accel-tree trace mode. Results are
        identical to accel=None (same RNG stream, sound candidate sets);
        only the per-bounce cost changes.
        """
        import logging
        import time as _time
        log = logging.getLogger("tracer_tpu")
        opts = opts or TraceOptions(max_bounces=reps, min_energy=min_energy)
        if key is None:
            key = jax.random.PRNGKey(0)
        bundle = _ambient_bundle(self.scene, bundle)
        accum = TraceAccum.zeros(self.scene.num_rows, dtype=bundle.pos.dtype)
        records: List[BounceRecord] = []
        source = bundle
        tree = None
        if accel:
            if self.meta is None:
                raise ValueError("accel needs a SceneMeta (row geometry)")
            from .accel import KdTree
            t0 = _time.perf_counter()
            tree = KdTree(self.meta)
            log.info("kdtree build: %d rows, %d nodes, %.3f s",
                     self.scene.num_rows, len(tree.nodes),
                     _time.perf_counter() - t0)
        recording_rows: tuple = ()
        if opts.record == "tags":
            if self.meta is None:
                raise ValueError("record='tags' needs a SceneMeta")
            tagged = [bool(self.meta.surfaces[int(lid)].optics.record)
                      for lid in self.meta.row_logical]
            recording_rows = tuple(int(r) for r, t in enumerate(tagged) if t)
        # energy-splitting interfaces (F_SPLIT): host-stepped tracing is the
        # path that honors them — the bundle grows between reps like the
        # reference's concatenated outgoing bundles (optics_callables.py:718)
        use_split = "split" in self.scene.features
        spectral_alpha = (None if bundle.spectra is None
                          else _rows_alpha_on_grid(self.scene, self.meta,
                                                   bundle.spectral_grid))
        for b in range(opts.max_bounces):
            t0 = _time.perf_counter()
            key, sub = jax.random.split(key)
            prev = bundle
            cand = None
            if tree is not None:
                cand = self._candidates(tree, bundle)
            bundle, accum, rec = _bounce_step(
                self.scene, bundle, accum, sub,
                min_energy=opts.min_energy, t_eps=opts.t_eps,
                disc_eps=opts.disc_eps, block=opts.block,
                split_mode=use_split, cand=cand,
                spectral_alpha=spectral_alpha)
            if use_split and rec.split is not None:
                bundle, accum = _append_split_rays(bundle, prev, rec, accum,
                                                   opts.min_energy)
            if opts.record == "tags":
                if recording_rows:
                    mask = rec.sid == recording_rows[0]
                    for r in recording_rows[1:]:
                        mask = mask | (rec.sid == r)
                    # one scalar sync; when a tagged surface was hit this
                    # bounce, gather ONLY the tagged slots on device and
                    # transfer O(hits), not O(slab) (round-2 verdict: the
                    # full-slab transfer capped flux-map traces at ~1M
                    # rays on tunneled hosts)
                    n_hits = int(jnp.sum(mask))
                    if n_hits:
                        records.append(jax.device_get(
                            _compact_record(rec, mask, n_hits, b)))
            elif opts.record:
                records.append(jax.device_get(rec.replace(bounce=b)))
            # host check: stop when the bundle dies (like ref :277-280)
            n_alive = int(jnp.sum(bundle.alive))
            if log.isEnabledFor(logging.INFO):
                # per-bounce observability (ref tracer_engine.py:282-286)
                dt = _time.perf_counter() - t0
                log.info("bounce %d: trace time %.4f s, %d/%d rays alive"
                         "%s", b, dt, n_alive, bundle.num_rays,
                         f", {cand.shape[1]} candidates/ray"
                         if cand is not None else "")
            if n_alive == 0:
                break
        result = TraceResult(scene=self.scene, meta=self.meta, final=bundle,
                             accum=jax.device_get(accum), records=records,
                             source=source)
        residual = float(np.asarray(result.final.total_energy()))
        if residual > 0.0:
            # ref tracer_engine.py:292-294 residual-energy audit
            log.warning("%.3g energy (%.2f%% of source) still alive after "
                        "%d bounces", residual,
                        100.0 * residual
                        / max(float(np.asarray(source.total_energy())),
                              1e-300),
                        opts.max_bounces)
        self.tree = result
        return result

    @staticmethod
    def _candidates(tree, bundle) -> jnp.ndarray:
        """Per-ray candidate rows from a host Kd traversal, padded to a
        bucketed width (limits jit recompiles across bounces)."""
        pos = np.asarray(bundle.pos)
        dirs = np.asarray(bundle.dir)
        mask = tree.traversal(pos, dirs)            # (S, N)
        mask[:, ~np.asarray(bundle.alive)] = False
        per_ray = mask.sum(axis=0)
        k = max(int(per_ray.max()), 1)
        k = 1 << (k - 1).bit_length()               # bucket to powers of 2
        order = np.argsort(~mask, axis=0, kind="stable")[:k]   # hits first
        valid = np.take_along_axis(mask, order, axis=0)
        cand = np.where(valid, order, -1).T.astype(np.int32)   # (N, k)
        return jnp.asarray(cand)


def _compact_record(rec: BounceRecord, mask, n_hits: int,
                    bounce: int) -> BounceRecord:
    """Gather the ``mask``-selected slots of a BounceRecord into a small
    buffer on device (capacity = next power of two >= n_hits, bucketed to
    bound the number of distinct compiled gather shapes across bounces).
    Entries beyond n_hits are padding: sid = -1, alive_in = False, so every
    consumer's mask logic skips them. ``slot`` keeps the original slab
    index of each entry (the fixed-slab lineage id)."""
    n = mask.shape[0]
    k = min(1 << max(n_hits - 1, 0).bit_length(), n)
    idx = jnp.nonzero(mask, size=k, fill_value=0)[0]
    valid = jnp.arange(k) < n_hits
    return BounceRecord(
        sid=jnp.where(valid, rec.sid[idx], -1),
        t=rec.t[idx], hit=rec.hit[idx], local=rec.local[idx],
        dir_in=rec.dir_in[idx], dir_out=rec.dir_out[idx],
        e_in=jnp.where(valid, rec.e_in[idx], 0.0),
        e_out=jnp.where(valid, rec.e_out[idx], 0.0),
        absorbed=jnp.where(valid, rec.absorbed[idx], 0.0),
        backside=rec.backside[idx] & valid,
        alive_in=rec.alive_in[idx] & valid,
        wavelength=(None if rec.wavelength is None
                    else rec.wavelength[idx]),
        normal=None if rec.normal is None else rec.normal[idx],
        spectra=None if rec.spectra is None else rec.spectra[idx],
        split=None, bounce=bounce, slot=idx.astype(jnp.int32))


def _append_split_rays(bundle: RayBundle, prev: RayBundle,
                       rec: BounceRecord, accum: TraceAccum,
                       min_energy: float):
    """Append the reflected branch of energy-splitting interfaces as new
    rays (host side). New rays start at the hit point in the incidence
    medium, with parent = the originating slot; the bundle grows, so later
    reps recompile at the new size — the price of true splitting, same as
    the reference's bundle concatenation (optics_callables.py:718-722)."""
    mask, sec_e, sec_dir = (np.asarray(a) for a in rec.split)
    keep = mask & (sec_e > min_energy)
    lost = float(sec_e[mask & ~keep].sum())
    if lost > 0.0:
        accum = accum.replace(culled=accum.culled + lost)
    if not keep.any():
        return bundle, accum
    idx = np.where(keep)[0]
    dt = bundle.pos.dtype
    sec = RayBundle(
        pos=jnp.asarray(np.asarray(rec.hit)[idx], dtype=dt),
        dir=jnp.asarray(sec_dir[idx], dtype=dt),
        energy=jnp.asarray(sec_e[idx], dtype=dt),
        wavelength=jnp.asarray(np.asarray(prev.wavelength)[idx], dtype=dt),
        ref_index=jnp.asarray(np.asarray(prev.ref_index)[idx], dtype=dt),
        att_coeff=jnp.asarray(np.asarray(prev.att_coeff)[idx], dtype=dt),
        scat_coeff=jnp.asarray(np.asarray(prev.scat_coeff)[idx], dtype=dt),
        scat_g=jnp.asarray(np.asarray(prev.scat_g)[idx], dtype=dt),
        alive=jnp.ones((len(idx),), dtype=bool),
        parent=jnp.asarray(idx, dtype=jnp.int32),
    )
    merged = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), bundle, sec)
    return merged, accum


def _chunked_drain(e, fields, drain_fn, cap: int, accum, key):
    """Drain the sparse survivors of a streaming slab to death in
    compacted chunks: top_k the ``cap`` highest-energy lanes (the only
    positive entries), gather their per-lane ``fields``, zero them in the
    slab, and hand the chunk to ``drain_fn(ce, cfields, accum, key) ->
    (ce, accum, key)``; any energy the chunk's round budget leaves alive
    is accounted into ``accum.residual``. Repeats until the slab is dead
    — each iteration zeroes ``cap`` lanes, so it terminates in at most
    ceil(slab/cap) iterations. Shared by the plain streaming tail and the
    culled path's drain_all (identical budget semantics: each chunk gets
    a FRESH round counter; the per-ray max_path age cull is what bounds
    the work)."""
    if cap >= e.shape[0]:
        ce, accum, key = drain_fn(e, fields, accum, key)
        accum = accum.replace(residual=accum.residual + jnp.sum(ce))
        return jnp.zeros_like(e), accum, key

    def ccond(st):
        e, accum, key = st
        return jnp.any(e > 0.0)

    def cbody(st):
        e, accum, key = st
        ce, idx = jax.lax.top_k(e, cap)
        cfields = tuple(None if f is None else f[idx] for f in fields)
        e = e.at[idx].set(0.0)
        ce, accum, key = drain_fn(ce, cfields, accum, key)
        accum = accum.replace(residual=accum.residual + jnp.sum(ce))
        return e, accum, key

    return jax.lax.while_loop(ccond, cbody, (e, accum, key))


def _drain_cap(slab: int) -> int:
    """Chunk capacity for _chunked_drain: slab//8, rounded UP to a TILE
    multiple so the Pallas bounce kernels never pad (pad lanes would run
    dead work every drain round)."""
    from .kernels.pallas_intersect import TILE
    return max(TILE, -(-(slab // 8) // TILE) * TILE)


@functools.partial(
    jax.jit, static_argnames=("max_bounces", "min_energy", "t_eps",
                              "disc_eps", "block", "fluxspecs"))
def trace_fused(scene: SceneTable, bundle: RayBundle, key: jax.Array,
                max_bounces: int = 100, min_energy: float = 1e-6,
                t_eps=None, disc_eps: float = 1e-6,
                block: int = 64, fluxspecs: tuple = ()):
    """Fully fused trace: one lax.while_loop on device, no records.

    Returns (final_bundle, accum). This is the unit of work that shards over
    a device mesh (see parallel.py) and the benchmark path.

    ``fluxspecs`` (static tuple of device_fluxmap.FluxSpec) accumulates
    per-surface spatial flux histograms on device (accum.flux), giving the
    fast path the reference's receiver flux maps without per-hit records.

    F_SPLIT (energy-splitting) interfaces fall back to Russian roulette
    here: the fixed-size while-loop carry cannot grow the ray population.
    Both estimators are unbiased with identical expectations; use
    TracerEngine.ray_tracer for true per-ray splitting.
    """
    from .analysis import device_fluxmap as _dfm
    if bundle.spectra is not None:
        raise NotImplementedError(
            "polychromatic bundles trace on the host-stepped "
            "TracerEngine.ray_tracer path (per-bounce spectral filtering "
            "and records); the fused/streaming drivers are "
            "monochromatic — sample wavelengths instead")
    bundle = _ambient_bundle(scene, bundle)
    # Derive the zeros from bundle data so they inherit shard_map's
    # varying-axis tags (a bare jnp.zeros would mismatch the loop carry
    # under a mesh).
    zero = jnp.sum(bundle.energy) * 0.0
    accum0 = TraceAccum(
        absorbed=jnp.zeros((scene.num_rows,), dtype=bundle.pos.dtype) + zero,
        hits=jnp.zeros((scene.num_rows,), dtype=bundle.pos.dtype) + zero,
        escaped=zero, culled=zero, medium=zero, residual=zero,
        flux=tuple(h + zero for h in
                   _dfm.zeros_for(fluxspecs, dtype=bundle.pos.dtype)))

    def cond(state):
        i, bundle, accum, key = state
        return (i < max_bounces) & jnp.any(bundle.alive)

    def body(state):
        i, bundle, accum, key = state
        key, sub = jax.random.split(key)
        bundle, accum, rec = _bounce_step(
            scene, bundle, accum, sub, min_energy=min_energy,
            t_eps=t_eps, disc_eps=disc_eps, block=block)
        if fluxspecs:
            accum = accum.replace(flux=_dfm.accumulate(
                accum.flux, fluxspecs, scene, rec.sid, rec.hit,
                rec.absorbed, key=sub))
        return (i + 1, bundle, accum, key)

    _, bundle, accum, _ = jax.lax.while_loop(
        cond, body, (jnp.array(0, dtype=jnp.int32), bundle, accum0, key))
    return bundle, accum


@functools.partial(
    jax.jit, static_argnames=("source_spec", "total_rays", "max_rounds",
                              "max_path", "min_energy", "t_eps", "disc_eps",
                              "slab", "bivar", "one_sided", "slope",
                              "lambertian", "spectral", "fluxspecs",
                              "refractive", "cook_torrance",
                              "lam_specular", "semi_lambertian",
                              "transparent", "conductor", "iam",
                              "periodic", "piecewise", "refr_disp",
                              "refr_frost", "backside_miss", "media"))
def _trace_streaming_megakernel(scene: SceneTable, source_spec, src_frame,
                                key,
                                total_rays: int, slab: int,
                                max_rounds: int, max_path: int,
                                min_energy: float, t_eps, disc_eps: float,
                                bivar: bool, one_sided: bool, slope: bool,
                                lambertian: bool = False,
                                spectral: bool = False,
                                fluxspecs: tuple = (),
                                refractive: bool = False,
                                cook_torrance: bool = False,
                                lam_specular: bool = False,
                                semi_lambertian: bool = False,
                                transparent: bool = False,
                                conductor: bool = False,
                                iam: bool = False,
                                periodic: bool = False,
                                piecewise: bool = False,
                                refr_disp: bool = False,
                                refr_frost: bool = False,
                                backside_miss: bool = False,
                                media=None):
    """Streaming trace where regeneration happens INSIDE the fused bounce
    kernel (single-group pure-specular scenes with a bakeable source): the
    ray state makes exactly one HBM round trip per bounce. The emission
    budget is enforced per-round (the final emission round may overshoot by
    up to one slab; the returned ``emitted`` is exact).

    ``media`` (static (media_tab, media_rows), see
    pallas_intersect._make_shade_epilogue) enables per-surface-toggled
    volumetric media: a per-lane medium id threads through the kernel
    next to the refraction index (fresh rays start in medium 0, the
    ambient — whose coefficients the caller folds into media_tab[0], so
    the kernel's static ambient constants are superseded)."""
    from .kernels.intersect import default_t_eps
    from .kernels.pallas_intersect import (bounce_reflect_pallas,
                                           media_flags, pack_rows)

    e_ray = source_spec[5]
    ambient_att = float(source_spec[14]) if len(source_spec) > 14 else 0.0
    medium = source_spec[16] if len(source_spec) > 16 else None
    ambient_scat = float(medium[0]) if medium else 0.0
    ambient_g = float(medium[1]) if medium else 0.0
    media_att, media_scat = media_flags(media)
    rows = pack_rows(scene)
    spectral_tab = (jnp.stack([scene.spectral_wl, scene.spectral_ab], axis=1)
                    .astype(jnp.float32)
                    if (spectral or conductor or piecewise) else None)
    te = default_t_eps(jnp.float32) if t_eps is None else t_eps

    from .analysis import device_fluxmap as _dfm
    pos0 = jnp.zeros((slab, 3), dtype=jnp.float32)
    dir0 = jnp.zeros((slab, 3), dtype=jnp.float32).at[:, 2].set(1.0)
    e0 = jnp.zeros((slab,), dtype=jnp.float32)
    wl0 = jnp.zeros((slab,), dtype=jnp.float32)
    ri0 = jnp.ones((slab,), dtype=jnp.float32)
    mid0 = jnp.zeros((slab,), dtype=jnp.float32)
    age0 = jnp.zeros((slab,), dtype=jnp.int32)
    accum0 = TraceAccum.zeros(scene.num_rows, fluxspecs=fluxspecs)
    z32 = jnp.array(0, dtype=jnp.int32)

    def _round(pos, dirs, e, e_before, wl, ri, mid, age, accum, ks, regen):
        """One fused bounce round + accounting, any slab length (the
        emission loop and the compacted tail share it)."""
        seed = jax.random.randint(ks, (1,), 0, jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)
        outs = bounce_reflect_pallas(
            rows, seed, pos, dirs, e, scene.groups, te, disc_eps,
            bivar=bivar, one_sided=one_sided, slope=slope,
            lambertian=lambertian, source_spec=source_spec, regen=regen,
            wavelength=wl if spectral else None,
            spectral_tab=spectral_tab, ambient_att=ambient_att,
            ref_index=ri if refractive else None,
            cook_torrance=cook_torrance, lam_specular=lam_specular,
            semi_lambertian=semi_lambertian, transparent=transparent,
            conductor=conductor, iam=iam, periodic=periodic,
            piecewise=piecewise, ambient_scat=ambient_scat,
            ambient_g=ambient_g, refr_disp=refr_disp,
            refr_frost=refr_frost,
            backside_miss=backside_miss,
            medium_id=mid if media is not None else None, media=media,
            src_frame=src_frame)
        pos, dirs, e_new, sid, absorbed = outs[:5]
        k_o = 5
        if spectral:
            wl = outs[k_o]
            k_o += 1
        if refractive:
            ri = outs[k_o]
            k_o += 1
        if media is not None:
            mid = outs[k_o]

        hit = sid >= 0
        # sid == -2: scattered in a participating medium — alive, no
        # surface (ambient, or the lane's per-surface-toggled medium)
        scat = ((sid == -2)
                if (ambient_scat > 0.0 and media is None) or media_scat
                else jnp.zeros_like(hit))
        live_hit = hit | scat
        escaped = (e_before > 0.0) & ~live_hit
        accum = _account(scene, accum, sid, hit, escaped, absorbed,
                         e_before, count_hits=False)
        if fluxspecs:
            accum = accum.replace(flux=_dfm.accumulate(
                accum.flux, fluxspecs, scene, sid, pos, absorbed, key=ks))
        if (ambient_att > 0.0 and media is None) or media_att:
            # kernel reports surface absorption only; the participating
            # medium took the rest of each hit/scatter segment's loss
            med = jnp.where(live_hit, e_before - absorbed - e_new, 0.0)
            accum = accum.replace(medium=accum.medium + jnp.sum(med))
        low = live_hit & (e_new <= min_energy)
        accum = accum.replace(
            culled=accum.culled + jnp.sum(jnp.where(low, e_new, 0.0)))
        e_new = jnp.where(live_hit & ~low, e_new, 0.0)
        # per-ray bounce budget
        age = jnp.where(e_before > 0.0, age + 1, 0)
        over = (e_new > 0.0) & (age >= max_path)
        accum = accum.replace(
            culled=accum.culled + jnp.sum(jnp.where(over, e_new, 0.0)))
        e_new = jnp.where(over, 0.0, e_new)
        return pos, dirs, e_new, wl, ri, mid, age, accum

    def cond(st):
        (i, pos, dirs, e, wl, ri, mid, age, accum, key, emitted,
         source_e) = st
        return (i < max_rounds) & (emitted < total_rays)

    def body(st):
        (i, pos, dirs, e, wl, ri, mid, age, accum, key, emitted,
         source_e) = st
        key, ks = jax.random.split(key)
        # explicit accumulator dtype: under x64 (CPU interpret tests)
        # jnp.sum would promote int32 to int64 and break the loop carry
        n_dead = jnp.sum((e <= 0.0), dtype=jnp.int32)
        # refill while budget remains; the final emission round may
        # overshoot by up to one slab (returned `emitted` is exact)
        regen = jnp.ones((1,), dtype=jnp.int32)
        emitted = emitted + n_dead
        source_e = source_e + n_dead.astype(jnp.float32) * e_ray
        reborn = e <= 0.0
        e_before = jnp.where(reborn, e_ray, e)
        age = jnp.where(reborn, 0, age)  # fresh rays restart their budget
        pos, dirs, e_new, wl, ri, mid, age, accum = _round(
            pos, dirs, e, e_before, wl, ri, mid, age, accum, ks, regen)
        return (i + 1, pos, dirs, e_new, wl, ri, mid, age, accum, key,
                emitted, source_e)

    st = (z32, pos0, dir0, e0, wl0, ri0, mid0, age0, accum0, key, z32,
          jnp.zeros((), dtype=jnp.float32))
    st = jax.lax.while_loop(cond, body, st)
    (i_r, pos, dirs, e, wl, ri, mid, age, accum, key, emitted,
     source_e) = st

    # ---- tail: the last emission round leaves a mostly-dead slab of
    # survivors; finishing them with full-slab rounds costs ~10 rounds at
    # full price while <~20% of lanes are live (the call-size sensitivity
    # previously documented in BENCHMARKS.md). Compact survivors into a
    # ~slab//8 buffer (top_k by energy, via _chunked_drain — the culled
    # drain's pattern) and finish on proportionally cheap rounds. Each
    # chunk gets a FRESH round counter: the per-ray max_path age cull
    # bounds a chunk to max_path rounds, so the drain always completes
    # (max_rounds budgets the EMISSION loop only; a shared global counter
    # would truncate late chunks into residual).
    no_regen = jnp.zeros((1,), dtype=jnp.int32)

    def tcond(st):
        i, pos, dirs, e, wl, ri, mid, age, accum, key = st
        return (i < max_path + 1) & jnp.any(e > 0.0)

    def tbody(st):
        i, pos, dirs, e, wl, ri, mid, age, accum, key = st
        key, ks = jax.random.split(key)
        pos, dirs, e, wl, ri, mid, age, accum = _round(
            pos, dirs, e, e, wl, ri, mid, age, accum, ks, no_regen)
        return (i + 1, pos, dirs, e, wl, ri, mid, age, accum, key)

    def drain_fn(ce, cfields, accum, key):
        cpos, cdirs, cwl, cri, cmid, cage = cfields
        tst = jax.lax.while_loop(
            tcond, tbody,
            (z32, cpos, cdirs, ce, cwl, cri, cmid, cage, accum, key))
        return tst[3], tst[8], tst[9]

    e, accum, _ = _chunked_drain(e, (pos, dirs, wl, ri, mid, age),
                                 drain_fn, _drain_cap(slab), accum, key)
    # exact closure on any exit: still-alive energy is accounted, not
    # silently dropped (cf. ref tracer_engine.py:292-294)
    accum = accum.replace(residual=accum.residual + jnp.sum(e))
    return accum, emitted, source_e


@functools.partial(
    jax.jit, static_argnames=("source_spec", "group_offsets", "slab",
                              "max_rounds", "max_path", "min_energy",
                              "t_eps", "disc_eps", "bivar", "one_sided",
                              "slope", "lambertian", "spectral",
                              "ambient_att", "demote_rows", "fluxspecs",
                              "conductor", "iam", "drain_jnp",
                              "backside_miss", "park_aureole",
                              "sync_axis"))
def _trace_streaming_megakernel_culled(
        scene: SceneTable, key, lists, counts, cells, cell_bounds, quota_b,
        age_caps, source_spec, group_offsets,
        slab: int, max_rounds: int, max_path: int,
        min_energy: float, t_eps, disc_eps: float, bivar, one_sided: bool,
        slope: bool, demote_rows: tuple,
        lambertian: bool = False, spectral: bool = False,
        ambient_att: float = 0.0, fluxspecs: tuple = (),
        conductor: bool = False, iam: bool = False,
        row_map=None, drain_jnp: bool = False, demote_mask=None,
        backside_miss: bool = False, park_aureole: bool = False,
        sync_axis=None):
    """Relevancy-culled streaming megakernel (see culling.py): each grid
    block owns one equal-area source cell and intersects only its static
    candidate list; per-block quotas keep the stratified emission unbiased
    (``quota_b`` = culling.block_quota(total_rays): each cell's equal-area
    budget, split across the blocks serving it for load balance).

    Rays that survive a bounce off a demoted surface, or reach their
    block's corridor depth ``age_caps[b]``, are *parked* (state frozen,
    excluded from accounting) and
    re-traced exactly against the full surface list in a drain phase after
    the main loop, so culling never changes the physics — only the cost.

    ``lists``/``counts``/``cells``/``cell_bounds``/``quota_b`` may be a
    SHARD of the global per-block arrays
    (parallel.trace_streaming_sharded): the local block count is
    lists.shape[0] and ``cells`` carries global block ids (independent
    PRNG streams per block, invariant to device placement).

    With ``row_map`` (an (S_seg,) int32 local->global row map,
    culling.seg_row_ids), ``lists`` and ``demote_rows`` carry LOCAL
    indices into the segment's row SHARD: the kernel ships only
    rows[:, row_map] through SMEM, which is what breaks the single-chip
    multi-k-row wall (round-3 verdict item 4). ``demote_mask`` is the
    data-driven twin of the static ``demote_rows`` tuple (a bool array
    over the LOCAL row space) for shard_map workers, whose single traced
    program cannot carry per-device static tuples
    (culling.device_row_shards). The drain phase always
    traces the FULL scene; ``drain_jnp`` (set when the whole rows table
    exceeds SMEM, kernels.intersect.pallas_rows_fit) switches it to the
    jnp brute-force + shade path — survivors are sparse and compacted,
    so the slower oracle path costs little."""
    from .kernels.intersect import default_t_eps, nearest_hit
    from .kernels.pallas_intersect import (TILE, bounce_reflect_culled_pallas,
                                           bounce_reflect_pallas, pack_rows)
    from .kernels.shade import shade as _shade

    nb = lists.shape[0]            # LOCAL blocks (may be a mesh shard)
    assert slab == nb * TILE, "culled path needs ray count == nb * TILE"
    e_ray = source_spec[5]
    rows = pack_rows(scene)
    rows_k = rows if row_map is None else rows[:, row_map]
    te = default_t_eps(jnp.float32) if t_eps is None else t_eps
    spectral_tab = (jnp.stack([scene.spectral_wl, scene.spectral_ab],
                              axis=1).astype(jnp.float32)
                    if (spectral or conductor) else None)

    pos0 = jnp.zeros((slab, 3), dtype=jnp.float32)
    dir0 = jnp.zeros((slab, 3), dtype=jnp.float32).at[:, 2].set(1.0)
    e0 = jnp.zeros((slab,), dtype=jnp.float32)
    wl0 = jnp.zeros((slab,), dtype=jnp.float32)
    age0 = jnp.zeros((slab,), dtype=jnp.int32)
    from .analysis import device_fluxmap as _dfm
    parked0 = jnp.zeros((slab,), dtype=bool)
    emitted0 = jnp.zeros((nb,), dtype=jnp.int32)
    hist0 = jnp.zeros(lists.shape, dtype=jnp.float32)
    accum0 = TraceAccum.zeros(scene.num_rows, fluxspecs=fluxspecs)
    z32 = jnp.array(0, dtype=jnp.int32)

    def cond(st):
        (i, pos, dirs, e, wl, age, parked, accum, hist, key, emitted_b,
         source_e) = st
        live_unparked = (e > 0.0) & ~parked

        # a block whose lanes are ALL parked cannot refill even with quota
        # remaining (parked lanes are frozen until the drain phase): when
        # no block can make progress, exit so the outer emit->drain cycle
        # can clear the parked lanes and resume emission — otherwise the
        # loop would spin to max_rounds and under-emit those cells,
        # biasing the spatial source density. The per-block reductions
        # cost ~3% of a round — the price of the exactness guarantee.
        dead_b = jnp.sum((e <= 0.0).reshape(nb, TILE), axis=1,
                         dtype=jnp.int32)
        lu_b = jnp.sum(live_unparked.reshape(nb, TILE), axis=1,
                       dtype=jnp.int32)
        can_emit = (emitted_b < quota_b) & ((dead_b > 0) | (lu_b > 0))
        go = jnp.any(can_emit) | jnp.any(live_unparked)
        if sync_axis is not None:
            # mesh-synchronized trip count: all devices run the same
            # number of rounds (idle ones pass through via active_b=0).
            # Uniform counts are what the Pallas INTERPRETER's global
            # barrier requires (threading.Barrier over the mesh axis per
            # kernel invocation), and on hardware the per-round psum is
            # noise next to a compute round.
            go = jax.lax.psum(go.astype(jnp.int32), sync_axis) > 0
        return (i < max_rounds) & go

    def body(st):
        (i, pos, dirs, e, wl, age, parked, accum, hist, key, emitted_b,
         source_e) = st
        key, ks = jax.random.split(key)
        seed = jax.random.randint(ks, (1,), 0, jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)
        # EXACT per-block quota enforcement: block b refills min(remaining,
        # dead) lanes, in row-major dead-lane rank order (the kernel ranks
        # them — see _dead_lane_rank). Equal-area cells must emit exactly
        # equal counts: letting the final round overshoot would correlate
        # emission with local survival rate and bias the spatial source
        # density by up to TILE/quota.
        remaining_b = jnp.maximum(quota_b - emitted_b, 0)
        dead = e <= 0.0
        dead_b = jnp.sum(dead.reshape(nb, TILE), axis=1, dtype=jnp.int32)
        n_new = jnp.minimum(dead_b, remaining_b)
        # emission-tail skip (round-3 verdict item 5): a block with no
        # refill this round and no live unparked lane passes through in
        # the kernel (pl.when), so the tail — where a few slow cells
        # finish their quotas — stops costing full-slab candidate loops
        lu_b = jnp.sum(((e > 0.0) & ~parked).reshape(nb, TILE), axis=1,
                       dtype=jnp.int32)
        active_b = ((n_new > 0) | (lu_b > 0)).astype(jnp.int32)
        emitted_b = emitted_b + n_new
        source_e = source_e + jnp.sum(n_new).astype(jnp.float32) * e_ray
        # the engine-side twin of the kernel's rank gate, for e_before/age
        rank = (jnp.cumsum(dead.reshape(nb, TILE).astype(jnp.int32), axis=1)
                - 1)
        reborn = (dead.reshape(nb, TILE)
                  & (rank < remaining_b[:, None])).reshape(slab)
        e_before = jnp.where(reborn, e_ray, e)
        age = jnp.where(reborn, 0, age)

        outs = bounce_reflect_culled_pallas(
            rows_k, lists, counts, cells, cell_bounds, seed, remaining_b,
            active_b, pos, dirs, e, scene.groups, group_offsets, te,
            disc_eps,
            bivar=bivar,
            one_sided=one_sided, slope=slope, lambertian=lambertian,
            source_spec=source_spec,
            wavelength=wl if spectral else None,
            spectral_tab=spectral_tab, ambient_att=ambient_att,
            conductor=conductor, iam=iam,
            backside_miss=backside_miss, park_aureole=park_aureole)
        if spectral:
            npos, ndirs, ne, sid, absorbed, nwl = outs
        else:
            npos, ndirs, ne, sid, absorbed = outs
            nwl = wl

        # parked lanes are frozen: the kernel still traces them (cheaper
        # than masking SIMD lanes) but results are discarded and nothing
        # is accounted for them until the drain phase
        sid = jnp.where(parked, -1, sid)
        absorbed = jnp.where(parked, 0.0, absorbed)
        # aureole-born lanes (park_aureole, culling.py): their FIRST
        # bounce happened normally (first-segment lists cover the full
        # sunshape cone) and arrives sid-encoded as -(row+16); decode,
        # account the bounce like any other, and PARK the survivor — the
        # disc-sized specular closure does not cover its reflected cone.
        aur_hit = sid <= -16
        sid = jnp.where(aur_hit, -sid - 16, sid)
        hit = sid >= 0
        # with a row shard, the kernel's sid is LOCAL; global ids are
        # only needed for the spatial flux maps (the slot histogram and
        # demote checks stay in local space)
        sid_g = sid if row_map is None else jnp.where(
            hit, row_map[jnp.maximum(sid, 0)], sid)
        escaped = ~parked & (e_before > 0.0) & ~hit
        # absorbed energy goes into a per-(block, slot) histogram against
        # the SHORT candidate list (L_max-wide one-hot, ~15x cheaper than
        # the (S, N) one-hot _account builds); it scatters to surface rows
        # once, after the loop. Missed/parked lanes carry absorbed == 0,
        # so the -1 padding slots accumulate exactly nothing.
        onehot = (sid.reshape(nb, TILE)[:, :, None]
                  == lists[:, None, :]).astype(jnp.bfloat16)
        # STOCHASTIC rounding to the bf16 grid before the matmul:
        # round-to-nearest bf16(absorbed) shifts every sample by up to
        # 2^-9 relative, and first-hit absorbed values within a row are
        # often IDENTICAL (constant absorptivity x constant e_ray), so
        # that rounding would accumulate as a systematic per-row bias
        # instead of cancelling. Adding uniform bits over the truncated
        # low mantissa (bf16 = the top 16 bits of f32) makes the
        # rounding exactly unbiased — per-row totals converge to the f32
        # value with relative error ~2^-9/sqrt(N) — for one elementwise
        # pass instead of a second residual matmul (~5% end-to-end).
        key, kd = jax.random.split(key)
        a_sr = _dfm.stochastic_round_bf16(absorbed.reshape(nb, TILE), kd)
        hist = hist + jnp.einsum(
            "btl,bt->bl", onehot, a_sr.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        if fluxspecs:
            accum = accum.replace(flux=_dfm.accumulate(
                accum.flux, fluxspecs, scene, sid_g, npos, absorbed,
                key=kd))
        accum = accum.replace(
            escaped=accum.escaped + jnp.sum(jnp.where(escaped, e_before,
                                                      0.0)))
        if ambient_att > 0.0:
            # the kernel reports surface absorption only; the ambient
            # medium took the rest of each (unparked) hit segment's loss
            med = jnp.where(hit, e_before - absorbed - ne, 0.0)
            accum = accum.replace(medium=accum.medium + jnp.sum(med))
        low = hit & (ne <= min_energy)
        accum = accum.replace(
            culled=accum.culled + jnp.sum(jnp.where(low, ne, 0.0)))
        ne = jnp.where(hit & ~low, ne, 0.0)
        age = jnp.where(~parked & (e_before > 0.0), age + 1, age)
        # park survivors of demoted rows and rays at the fast-path age cap
        demote_hit = jnp.zeros_like(hit)
        for r in demote_rows:
            demote_hit = demote_hit | (sid == r)
        if demote_mask is not None:
            # data-driven twin of the static demote_rows tuple (LOCAL row
            # space): shard_map workers use this because static values
            # cannot vary across the single traced program
            demote_hit = demote_hit | (hit
                                       & demote_mask[jnp.maximum(sid, 0)])
        age_cap_lane = jnp.repeat(age_caps, TILE)
        newly = ~parked & (ne > 0.0) & (demote_hit | aur_hit
                                        | (age >= age_cap_lane))
        pos = jnp.where(parked[:, None], pos, npos)
        dirs = jnp.where(parked[:, None], dirs, ndirs)
        e = jnp.where(parked, e, ne)
        wl = jnp.where(parked, wl, nwl)
        parked = parked | newly
        return (i + 1, pos, dirs, e, wl, age, parked, accum, hist, key,
                emitted_b, source_e)

    # ---- drain: re-trace parked rays (and any leftovers) against the
    # FULL surface list — always sound, so culling cannot change the
    # accounted physics. Live lanes are sparse by then, while a full-slab
    # brute-force round costs slab*S row tests (~0.2 s at 8M lanes x 1000
    # rows), so the survivors are first COMPACTED into a small buffer
    # with one top_k (their energies are the only positive entries); an
    # outer loop repeats if more than ``cap`` survived.
    cap = min(slab, 64 * TILE)

    def dcond(st):
        i, pos, dirs, e, wl, age, accum, key = st
        # fresh per-chunk counter; max_path's age cull is the real bound
        return (i < max_path + 1) & jnp.any(e > 0.0)

    def dbody(st):
        i, pos, dirs, e, wl, age, accum, key = st
        key, ks = jax.random.split(key)
        if drain_jnp:
            # full-scene brute force via the jnp oracle path: the rows
            # table exceeds SMEM (pallas_rows_fit False), and the drain
            # buffer is small, so the slower path is fine
            t, sid = nearest_hit(scene, pos, dirs, t_eps=te,
                                 disc_eps=disc_eps, use_pallas=False)
            sid = jnp.where(e > 0.0, sid, -1)
            hit = sid >= 0
            e_att = e
            if ambient_att > 0.0:
                tr = jnp.exp(-jnp.asarray(ambient_att, e.dtype)
                             * jnp.where(hit, t, 0.0))
                e_att = jnp.where(hit, e * tr, e)
            zeros = jnp.zeros_like(e)
            res = _shade(scene, sid, t, pos, dirs, e_att, wl,
                         jnp.ones_like(e), ks,
                         medium=(zeros, zeros, zeros))
            pos = jnp.where(hit[:, None], res.out_pos, pos)
            dirs = jnp.where(hit[:, None], res.out_dir, dirs)
            ne = jnp.where(hit, res.out_energy, e)
            absorbed = jnp.where(hit, res.absorbed, 0.0)
        else:
            seed = jax.random.randint(ks, (1,), 0,
                                      jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
            outs = bounce_reflect_pallas(
                rows, seed, pos, dirs, e, scene.groups, te, disc_eps,
                bivar=bivar, one_sided=one_sided, slope=slope,
                lambertian=lambertian,
                wavelength=wl if spectral else None,
                spectral_tab=spectral_tab, ambient_att=ambient_att,
                conductor=conductor, iam=iam,
                backside_miss=backside_miss)
            if spectral:
                pos, dirs, ne, sid, absorbed, wl = outs
            else:
                pos, dirs, ne, sid, absorbed = outs
        hit = sid >= 0
        escaped = (e > 0.0) & ~hit
        accum = _account(scene, accum, sid, hit, escaped, absorbed, e,
                         count_hits=False)
        if fluxspecs:
            accum = accum.replace(flux=_dfm.accumulate(
                accum.flux, fluxspecs, scene, sid, pos, absorbed, key=ks))
        if ambient_att > 0.0:
            med = jnp.where(hit, e - absorbed - ne, 0.0)
            accum = accum.replace(medium=accum.medium + jnp.sum(med))
        low = hit & (ne <= min_energy)
        accum = accum.replace(
            culled=accum.culled + jnp.sum(jnp.where(low, ne, 0.0)))
        ne = jnp.where(hit & ~low, ne, 0.0)
        age = jnp.where(e > 0.0, age + 1, age)
        over = (ne > 0.0) & (age >= max_path)
        accum = accum.replace(
            culled=accum.culled + jnp.sum(jnp.where(over, ne, 0.0)))
        ne = jnp.where(over, 0.0, ne)
        return (i + 1, pos, dirs, ne, wl, age, accum, key)

    def drain_all(pos, dirs, e, wl, age, accum, key):
        """Trace every live lane (parked or not) to death; returns the
        zeroed energies so the main loop can resume emitting into them."""
        def drain_fn(ce, cfields, accum, key):
            cpos, cdirs, cwl, cage = cfields
            dst = (z32, cpos, cdirs, ce, cwl, cage, accum, key)
            dst = jax.lax.while_loop(dcond, dbody, dst)
            return dst[3], dst[6], dst[7]

        return _chunked_drain(e, (pos, dirs, wl, age), drain_fn, cap,
                              accum, key)

    # ---- emit->drain cycles: the main loop exits when no block can make
    # progress (quota done, or every remaining block fully parked); the
    # drain then clears the parked lanes so emission can resume. One
    # cycle suffices unless parking starves a block's lanes (deep
    # corridors degraded by the SMEM cap).
    def outer_cond(st):
        (i, pos, dirs, e, wl, age, parked, accum, hist, key, emitted_b,
         source_e) = st
        go = jnp.any(emitted_b < quota_b) | jnp.any(e > 0.0)
        if sync_axis is not None:
            go = jax.lax.psum(go.astype(jnp.int32), sync_axis) > 0
        return (i < max_rounds) & go

    def outer_body(st):
        st = jax.lax.while_loop(cond, body, st)
        (i, pos, dirs, e, wl, age, parked, accum, hist, key, emitted_b,
         source_e) = st
        e, accum, key = drain_all(pos, dirs, e, wl, age, accum, key)
        parked = jnp.zeros_like(parked)
        return (i, pos, dirs, e, wl, age, parked, accum, hist, key,
                emitted_b, source_e)

    st = (z32, pos0, dir0, e0, wl0, age0, parked0, accum0, hist0, key,
          emitted0, jnp.zeros((), dtype=jnp.float32))
    st = jax.lax.while_loop(outer_cond, outer_body, st)
    (_, pos, dirs, e, wl, age, parked, accum, hist, key, emitted_b,
     source_e) = st
    # max_rounds exhaustion can leave live lanes: account, don't drop
    accum = accum.replace(residual=accum.residual + jnp.sum(e))
    # fold the slot histogram into per-row absorbed energy (one scatter);
    # with a row shard the list entries are local — map them to global
    lists_g = (lists if row_map is None
               else jnp.where(lists >= 0,
                              row_map[jnp.maximum(lists, 0)], -1))
    rows_flat = jnp.maximum(lists_g.reshape(-1), 0)
    vals_flat = jnp.where(lists_g.reshape(-1) >= 0, hist.reshape(-1), 0.0)
    accum = accum.replace(absorbed=accum.absorbed.at[rows_flat].add(
        vals_flat))
    return accum, jnp.sum(emitted_b), source_e


def _bake_media(scene, spec_att: float, spec_scat: float, spec_g: float):
    """Static ``(media_tab, media_rows)`` for the megakernel's
    per-surface-toggled media mode (pallas_intersect._make_shade_epilogue):
    medium 0 is the ambient (the source spec's coefficients); every
    K_REFRACTIVE row contributes its two side media (p6..p11, ref
    RefractiveHomogenous's medium tuple / Absorbant / Scattering
    optics_callables.py:861-1186), deduplicated by value so the per-lane
    id compare mirrors shade.py's tuple compare exactly. Returns None
    when the scene table is abstract (trace_streaming called on traced
    scene arguments — close over a concrete table instead, as every
    model/benchmark does; trace_streaming_sharded pre-bakes on the
    concrete table before shard_map)."""
    from . import materials as _M
    try:
        okind = np.asarray(scene.opt_kind)
        oprm = np.asarray(scene.opt_params)
    except Exception:
        import logging
        logging.getLogger("tracer_tpu").warning(
            "media fusion skipped: scene table is abstract (pass a "
            "concrete/closed-over table to bake the media mode)")
        return None
    # dedup in the SCENE dtype: the general path's tuple compare
    # (shade.py) runs on table-dtype values, so a float64 spec ambient
    # meant to equal a float32 row medium must round the same way here
    tab = [tuple(float(np.asarray(v, dtype=oprm.dtype))
                 for v in (spec_att, spec_scat, spec_g))]
    rows_map = []
    for s in np.nonzero(okind == _M.K_REFRACTIVE)[0]:
        ids = []
        for cols in ((6, 8, 10), (7, 9, 11)):
            m = tuple(float(oprm[s, c]) for c in cols)
            if m not in tab:
                tab.append(m)
            ids.append(tab.index(m))
        rows_map.append((int(s), ids[0], ids[1]))
    return (tuple(tab), tuple(rows_map))


def _apply_scene_ambient(scene, spec, source_fn):
    """Fold a scene-declared ambient medium (SceneTable.ambient_medium —
    carried by the periodic-medium composite optics, ref
    optics_callables.py:1038-1106) into the source: the spec's ambient
    slots (14 = attenuation, 16 = (scat, g)) for the fused paths, and
    fresh bundles' medium fields for the general path. A source that
    declares a DIFFERENT nonzero ambient is a modeling conflict."""
    am = getattr(scene, "ambient_medium", ())
    if not am:
        return spec, source_fn
    att, sc, g = (float(v) for v in am)
    if spec is not None:
        sp = list(spec)
        while len(sp) < 17:
            sp.append(None)
        cur_att = float(sp[14] or 0.0)
        cur_med = sp[16] or (0.0, 0.0)
        cur = (cur_att, float(cur_med[0]),
               float(cur_med[1]) if len(cur_med) > 1 else 0.0)
        if any(cur) and cur != (att, sc, g):
            raise ValueError(
                f"source spec declares ambient medium {cur} but the "
                f"scene's optics declare {(att, sc, g)}")
        sp[14] = att
        sp[16] = (sc, g)
        spec = tuple(sp)
    base = source_fn

    def wrapped(key):
        b = base(key)
        return b.replace(
            att_coeff=jnp.full_like(b.att_coeff, att),
            scat_coeff=jnp.full_like(b.scat_coeff, sc),
            scat_g=jnp.full_like(b.scat_g, g))

    if spec is not None:
        wrapped.pallas_spec = spec
    return spec, wrapped


def _ambient_bundle(scene, bundle):
    """Bundle-path twin of _apply_scene_ambient (trace_fused /
    ray_tracer): rays whose medium fields are unset (0) start in the
    scene-declared ambient medium."""
    am = getattr(scene, "ambient_medium", ())
    if not am:
        return bundle
    att, sc, g = (float(v) for v in am)
    in_ambient = (bundle.att_coeff == 0.0) & (bundle.scat_coeff == 0.0)
    return bundle.replace(
        att_coeff=jnp.where(in_ambient, att, bundle.att_coeff),
        scat_coeff=jnp.where(in_ambient, sc, bundle.scat_coeff),
        scat_g=jnp.where(in_ambient, g, bundle.scat_g))


def _media_for(scene, spec):
    """The media-mode gate + bake in one place: returns the static media
    pair when the scene has per-surface-toggled volumetric media the
    megakernel can fuse (refractive, non-splitting, bakeable source),
    else None. Callable on a CONCRETE table only — shard_map callers run
    it before tracing (parallel.trace_streaming_sharded)."""
    from . import materials as _M
    if (spec is None or _M.K_REFRACTIVE not in scene.kinds_present
            or "volumetric" not in scene.features
            or "split" in scene.features):
        return None
    spec_att = float(spec[14]) if len(spec) > 14 else 0.0
    spec_med = spec[16] if len(spec) > 16 else None
    spec_scat = float(spec_med[0]) if spec_med else 0.0
    spec_g = float(spec_med[1]) if spec_med else 0.0
    return _bake_media(scene, spec_att, spec_scat, spec_g)


def trace_streaming(scene: SceneTable, source_fn, key: jax.Array,
                    total_rays: int, max_rounds: int = 10_000,
                    max_path: int = 100, min_energy: float = 1e-6,
                    t_eps=None, disc_eps: float = 1e-6, block: int = 64,
                    culling=None, fluxspecs: tuple = (), _media="auto"):
    """Streaming wavefront trace with on-device ray regeneration.

    The reference (and trace_fused) lets the ray population decay across
    bounces, so late bounces run a mostly-dead slab. Here every dead slot is
    immediately refilled with a fresh source ray, keeping VPU occupancy at
    ~100% — the TPU-native analog of the reference's host-side batching
    loops (solar_simulator.py:90-97, Sandia example :193-226), fused into
    one device loop.

    source_fn(key) must be traceable and return a RayBundle with the slab
    size; it is called once per round for the dead slots. ``total_rays``
    caps how many source rays are emitted in total. ``max_path`` is the
    per-ray bounce budget (the streaming analog of the reference engine's
    ``reps``, tracer_engine.py:124): rays older than it are culled with
    their energy accounted, which bounds the straggler tail that would
    otherwise keep the whole slab looping for rare long paths.

    Energy-splitting interfaces (``single_ray=False``, F_SPLIT) always
    stream with TRUE splitting: the dispatch gates route every F_SPLIT
    scene to the general path, where reflected branches park in
    per-lane overflow slots and fill dead slab slots with priority over
    fresh source rays (see _trace_streaming_general) — roulette only
    happens if a lane splits again while its overflow is still pending
    (energy-proportional merge, unbiased in expectation). The
    megakernel never serves F_SPLIT scenes (its slab is fixed
    in-kernel); the host-stepped ``TracerEngine.ray_tracer`` grows the
    bundle instead for exact per-ray branch pairs (deterministic
    beam-splitting studies).

    ``fluxspecs`` (static tuple of device_fluxmap.FluxSpec) accumulates
    per-surface spatial flux histograms on device across ALL streaming
    paths (culled/plain megakernel and the general path); they come back
    in accum.flux, one (nu, nv) energy histogram per spec (use
    device_fluxmap.finalize to get W/m^2 on the surface mesh).

    Returns (accum, emitted, source_e): energy accumulators, rays emitted,
    total energy emitted. escaped/culled/absorbed/residual cover every
    emitted ray exactly — residual energy of rays still alive at a
    max_rounds exit is drained into ``accum.residual``, so
    source_e == absorbed + escaped + culled + medium + residual to dtype
    tolerance, regardless of slab size or round limits.

    With a ``culling`` argument (a culling.BlockCulling built for this
    scene/source/slab) and a megakernel-eligible scene, each grid block
    intersects only its per-block candidate list — the relevancy-culling
    fast path (the TPU answer to ref tracer_engine.py:251-264 and to its
    in-loop Kd-tree). Physics is unchanged (see culling.py soundness
    notes); only the cost per bounce drops.
    """
    # Megakernel dispatch: if the source carries a bakeable Pallas spec and
    # the scene qualifies for the fused reflect bounce, regeneration happens
    # inside the kernel (one HBM round trip of the ray state per round).
    from . import materials as _M
    from .kernels.intersect import _use_pallas, pallas_rows_fit
    spec = getattr(source_fn, "pallas_spec", None)
    spec, source_fn = _apply_scene_ambient(scene, spec, source_fn)
    probe = source_fn(key)
    if probe.spectra is not None:
        raise NotImplementedError(
            "polychromatic sources trace on the host-stepped "
            "TracerEngine.ray_tracer path; the streaming drivers are "
            "monochromatic — sample wavelengths instead")
    n = probe.num_rays
    spec_band = spec[13] if spec is not None and len(spec) > 13 else None
    spec_att = (float(spec[14])
                if spec is not None and len(spec) > 14 else 0.0)
    spec_med = (spec[16]
                if spec is not None and len(spec) > 16 else None)
    spec_scat = float(spec_med[0]) if spec_med else 0.0
    spectral_scene = _M.K_REFLECT_SPECTRAL in scene.kinds_present
    refractive_scene = _M.K_REFRACTIVE in scene.kinds_present
    # per-surface-toggled volumetric media fuse through the MEDIA mode
    # (round 4): a per-lane medium id threads through the kernel next to
    # the refraction index, toggled at interface crossings against a
    # static deduplicated media table baked from the (concrete) scene
    # rows; ambient coefficients fold into medium 0. Splitting
    # interfaces stay on the general path. ``_media`` overrides the
    # bake for callers whose scene is traced here (shard_map workers —
    # parallel.trace_streaming_sharded pre-bakes on the concrete table).
    media = _media if _media != "auto" else _media_for(scene, spec)
    media_mode = media is not None
    # ambient volumetric media are fusable when the source spec declares
    # the coefficients (absorption-only, or HG scattering + absorption —
    # the kernel lowers both); interface-toggled media ride the media
    # mode above
    vol_ok = ("volumetric" not in scene.features) or media_mode or (
        (spec_att > 0.0 or spec_scat > 0.0)
        and "dispersive" not in scene.features)
    # refractive interfaces fuse when non-splitting (per-lane index
    # threads through the kernel; fresh rays start at n = 1); DISPERSIVE
    # interfaces fuse too — the candidate loop interpolates n1(wl)/n2(wl)
    # from the shared spectral table (round 4) — which needs the per-lane
    # wavelength thread and hence a bakeable source band
    refr_ok = (not refractive_scene
               or (("volumetric" not in scene.features or media_mode)
                   and "split" not in scene.features))
    refr_wl = (refractive_scene and refr_ok
               and "dispersive" in scene.features)
    # frosted (slope-error) interfaces fuse too: sigma rides the q2
    # carry and the Fresnel/Snell branch uses the perturbed normal
    refr_frost = (refractive_scene and refr_ok
                  and "refractive_slope" in scene.features)
    ct_scene = _M.K_COOK_TORRANCE in scene.kinds_present
    ls_scene = _M.K_LAMBERTIAN_SPECULAR in scene.kinds_present
    sl_scene = _M.K_SEMI_LAMBERTIAN in scene.kinds_present
    tr_scene = _M.K_TRANSPARENT in scene.kinds_present
    fc_scene = _M.K_FRESNEL_CONDUCTOR in scene.kinds_present
    # dispersive conductors need the per-lane wavelength thread, so the
    # source band must be bakeable; constant-index ones do not
    fc_wl = fc_scene and "conductor_dispersive" in scene.features
    iam_scene = _iam_mode(scene)
    pd_scene = _M.K_PERIODIC in scene.kinds_present
    lpw_scene = _M.K_LAMBERTIAN_PIECEWISE in scene.kinds_present
    # bilinear (theta, wl) piecewise grids need the wavelength thread
    lpw_wl = (lpw_scene
              and "lambertian_piecewise_spectral" in scene.features)
    kernel_ok = (spec is not None
               and set(scene.kinds_present) <= {_M.K_REFLECT,
                                                _M.K_LAMBERTIAN,
                                                _M.K_REFLECT_SPECTRAL,
                                                _M.K_REFRACTIVE,
                                                _M.K_COOK_TORRANCE,
                                                _M.K_LAMBERTIAN_SPECULAR,
                                                _M.K_SEMI_LAMBERTIAN,
                                                _M.K_TRANSPARENT,
                                                _M.K_FRESNEL_CONDUCTOR,
                                                _M.K_PERIODIC,
                                                _M.K_LAMBERTIAN_PIECEWISE}
               and (not (spectral_scene or fc_wl or lpw_wl or refr_wl)
                    or spec_band is not None)
               and vol_ok and refr_ok
               and "iam_nonmirror" not in scene.features
               and _use_pallas(probe.pos))
    # the PLAIN megakernel (and the culled drain's fused brute force)
    # needs the whole packed rows table in SMEM; the culled path does not
    # (segments ship row shards) — it only switches its drain to the jnp
    # oracle when the full table exceeds SMEM
    fusable = kernel_ok and pallas_rows_fit(scene)
    # the culled kernel handles any number of aperture-signature groups
    # (one specialized candidate loop per group), spectral scenes, and
    # ambient attenuation — same eligibility as the plain megakernel
    # except refractive scenes (the corridor analysis has no refraction
    # closure; lens scenes are small, so brute-force rows are cheap) and
    # the scatterer kinds whose outgoing cone the specular corridor
    # analysis does not cover (Cook-Torrance, Lambertian-specular,
    # semi-Lambertian) or whose pass-through it does not model
    # (transparent); pure-Lambertian rows stay cullable because culling
    # demotes rays they scatter (culling.demote_rows)
    # conductor and IAM are direction-preserving (specular reflection /
    # absorptivity-only modifier), so the specular corridor analysis —
    # and hence culling — stays sound for them
    cullable = (kernel_ok and not refractive_scene and not ct_scene
                and not ls_scene and not sl_scene and not tr_scene
                and not pd_scene   # teleports break corridor closure
                and not lpw_scene  # diffuse lobe, like the scatterers
                and spec_scat == 0.0)  # volumetric scattering redirects
                                       # anywhere: no corridor closure
    if cullable and culling is not None:
        from .kernels.pallas_intersect import TILE
        nb = culling.nb
        if n != nb * TILE:
            raise ValueError(
                f"culling was built for {nb * TILE} rays (nb={nb} blocks "
                f"x TILE={TILE}) but the source slab is {n}")
        common = dict(
            source_spec=spec, max_rounds=max_rounds,
            max_path=max_path, min_energy=min_energy, t_eps=t_eps,
            disc_eps=disc_eps, bivar=_bivar_mode(scene),
            one_sided="one_sided" in scene.features,
            slope="slope_error" in scene.features,
            lambertian=_M.K_LAMBERTIAN in scene.kinds_present,
            spectral=spectral_scene or fc_wl, ambient_att=spec_att,
            fluxspecs=fluxspecs,
            conductor=fc_scene, iam=iam_scene,
            drain_jnp=not fusable,
            backside_miss="bifacial" in scene.features,
            park_aureole=getattr(culling, "park_aureole", False))
        if culling.segment_bounds:
            # single-chip SMEM segmentation (culling.py): blocks never
            # interact, so the culled trace decomposes EXACTLY into
            # sequential kernel calls over contiguous block ranges, each
            # with its own (narrower) per-group candidate layout and its
            # own row SHARD (seg_row_ids — local list/demote indices)
            quota = culling.block_quota(total_rays)
            accum = emitted = source_e = None
            bounds = culling.segment_bounds
            for i, (b0, b1) in enumerate(zip(bounds, bounds[1:])):
                key, sub = jax.random.split(key)
                a, em, se = _trace_streaming_megakernel_culled(
                    scene, sub, jnp.asarray(culling.seg_lists[i]),
                    jnp.asarray(culling.seg_counts[i]),
                    jnp.arange(b0, b1, dtype=jnp.int32),
                    jnp.asarray(culling.cell_bounds[b0:b1]),
                    jnp.asarray(quota[b0:b1]),
                    jnp.asarray(culling.age_caps[b0:b1]),
                    group_offsets=culling.seg_group_offsets[i],
                    demote_rows=culling.seg_demote_rows[i],
                    row_map=jnp.asarray(culling.seg_row_ids[i]),
                    slab=(b1 - b0) * TILE, **common)
                accum = a if accum is None else accum + a
                emitted = em if emitted is None else emitted + em
                source_e = se if source_e is None else source_e + se
            return accum, emitted, source_e
        from .kernels.intersect import pallas_rows_fit as _rows_fit
        if not _rows_fit(scene):
            # only a mesh-targeted build (build_block_culling
            # mesh_devices>1) reaches here: single-chip builds always
            # carry segment_bounds when the rows table exceeds SMEM
            raise ValueError(
                "culling has no single-chip SMEM segments but the packed "
                "rows table exceeds SMEM — this is a mesh-targeted build "
                "(mesh_devices>1); trace it with "
                "parallel.trace_streaming_sharded on a matching mesh")
        return _trace_streaming_megakernel_culled(
            scene, key, jnp.asarray(culling.lists),
            jnp.asarray(culling.counts),
            jnp.arange(nb, dtype=jnp.int32),
            jnp.asarray(culling.cell_bounds),
            jnp.asarray(culling.block_quota(total_rays)),
            jnp.asarray(culling.age_caps),
            group_offsets=culling.group_offsets,
            demote_rows=culling.demote_rows, slab=n, **common)
    if culling is not None:
        import logging
        logging.getLogger("tracer_tpu").warning(
            "culling ignored: scene/source not megakernel-eligible "
            "(kinds=%s features=%s pallas=%s)",
            scene.kinds_present, scene.features,
            _use_pallas(probe.pos))
    if fusable:
        import logging
        logging.getLogger("tracer_tpu").debug(
            "streaming dispatch: megakernel (kinds=%s)",
            scene.kinds_present)
        spec_c, src_frame = _spec_frame_split(spec)
        return _trace_streaming_megakernel(
            scene, spec_c, src_frame, key, total_rays, n, max_rounds,
            max_path,
            min_energy, t_eps, disc_eps,
            bivar=_bivar_mode(scene),
            one_sided="one_sided" in scene.features,
            slope="slope_error" in scene.features,
            lambertian=_M.K_LAMBERTIAN in scene.kinds_present,
            spectral=spectral_scene or fc_wl or lpw_wl or refr_wl,
            fluxspecs=fluxspecs,
            refractive=refractive_scene, cook_torrance=ct_scene,
            lam_specular=ls_scene, semi_lambertian=sl_scene,
            transparent=tr_scene, conductor=fc_scene, iam=iam_scene,
            periodic=pd_scene, piecewise=lpw_scene, refr_disp=refr_wl,
            refr_frost=refr_frost,
            backside_miss="bifacial" in scene.features,
            media=media)
    import logging
    logging.getLogger("tracer_tpu").debug(
        "streaming dispatch: general (kinds=%s features=%s)",
        scene.kinds_present, scene.features)
    return _trace_streaming_general(
        scene, source_fn, key, total_rays, max_rounds, max_path,
        min_energy, t_eps, disc_eps, block, fluxspecs=fluxspecs,
        split="split" in scene.features)


def _spec_frame_split(spec):
    """Split a bakeable source spec into (canonical static spec, traced
    (21,) f32 pose: center xyz + row-major position rotation + row-major
    direction rotation). The pose becomes a kernel OPERAND of the plain
    streaming megakernel instead of baked constants, so traces that
    differ only by source aim — annual sun sweeps (analysis/annual.py),
    tracking studies — share ONE compiled executable. The canonical spec
    holds None in the pose slots; any accidental constant use fails at
    trace time. (The culled megakernel keeps the full static spec: its
    candidate lists are position-dependent anyway.)"""
    rect = spec[15] if len(spec) > 15 else None
    rot = np.asarray(spec[3], dtype=np.float32).reshape(9)
    drot = rot
    if rect is not None and rect[2] is not None:
        drot = np.asarray(rect[2], dtype=np.float32).reshape(9)
    frame = jnp.asarray(np.concatenate(
        [np.asarray(spec[:3], dtype=np.float32), rot, drot]))
    spec_c = list(spec)
    spec_c[0] = spec_c[1] = spec_c[2] = spec_c[3] = None
    if rect is not None:
        spec_c[15] = (rect[0], rect[1], None) + tuple(rect[3:])
    return tuple(spec_c), frame


# the per-ray STATE fields of a streaming slab (everything but the alive
# flag and the host-only parent index) — the single list that regenerate /
# place_overflow / merge_secondaries all move together, so a new RayBundle
# field cannot be silently dropped from one of them
_RAY_FIELDS = ("pos", "dir", "energy", "wavelength", "ref_index",
               "att_coeff", "scat_coeff", "scat_g")


def _where_ray_fields(mask, new, old):
    """Per-lane select of every ray-state field: mask ? new : old."""
    upd = {}
    for f in _RAY_FIELDS:
        a, b = getattr(new, f), getattr(old, f)
        m = mask[:, None] if b.ndim == 2 else mask
        upd[f] = jnp.where(m, a, b)
    return old.replace(**upd)


@functools.partial(
    jax.jit, static_argnames=("source_fn", "total_rays", "max_rounds",
                              "max_path", "min_energy", "t_eps", "disc_eps",
                              "block", "fluxspecs", "split"))
def _trace_streaming_general(scene: SceneTable, source_fn, key: jax.Array,
                             total_rays: int, max_rounds: int,
                             max_path: int, min_energy: float,
                             t_eps, disc_eps: float, block: int,
                             fluxspecs: tuple = (), split: bool = False):
    """General streaming path (any optics, any backend): jnp regeneration
    around the per-bounce kernels. See trace_streaming.

    split=True (scenes with F_SPLIT interfaces) streams TRUE energy
    splitting: each slab lane owns one OVERFLOW slot holding its pending
    reflected branch. The primary lane continues refracted at (1-R)E;
    the R E branch parks in the overflow and is placed into its OWN slab
    slot when that slot frees (elementwise — cross-lane matching costs
    ~11 serialized TPU gathers/scatters per round, see place_overflow),
    with priority over fresh source rays, so the population never grows
    and every branch drains within a bounded number of rounds. A second
    split on a lane whose overflow is still occupied degrades to an
    energy-proportional roulette MERGE of the two pending branches
    (unbiased in expectation: keep branch i with probability
    e_i/(e_i+e_j), carry e_i+e_j), vs the reference's unbounded bundle
    growth (optics_callables.py:718-722) and round 3's
    roulette-everything. The bounces themselves ride the fused Pallas
    kernel (refr_split mode: the kernel emits the reflected branch
    through dedicated outputs instead of rouletting)."""
    from .analysis import device_fluxmap as _dfm
    probe = source_fn(key)
    n = probe.num_rays
    zero = jnp.sum(probe.energy) * 0.0
    accum0 = TraceAccum(
        absorbed=jnp.zeros((scene.num_rows,), dtype=probe.pos.dtype) + zero,
        hits=jnp.zeros((scene.num_rows,), dtype=probe.pos.dtype) + zero,
        escaped=zero, culled=zero, medium=zero, residual=zero,
        flux=tuple(h + zero for h in
                   _dfm.zeros_for(fluxspecs, dtype=probe.pos.dtype)))
    source0 = zero   # total energy emitted

    def regenerate(bundle, age, key, emitted, source_e):
        fresh = source_fn(key)
        free = ~bundle.alive
        budget = total_rays - emitted
        # refill at most `budget` dead slots (prefix of free slots)
        free_rank = jnp.cumsum(free.astype(jnp.int32))
        refill = free & (free_rank <= budget)
        bundle = _where_ray_fields(refill, fresh, bundle).replace(
            alive=bundle.alive | refill)
        age = jnp.where(refill, 0, age)
        emitted = emitted + jnp.sum(refill, dtype=jnp.int32)
        source_e = source_e + jnp.sum(jnp.where(refill, fresh.energy, 0.0))
        return bundle, age, emitted, source_e

    empty = probe.replace(alive=jnp.zeros((n,), dtype=bool),
                          energy=jnp.zeros_like(probe.energy))

    def place_overflow(bundle, age, ovf, ovf_age):
        """Place each lane's pending branch into ITS OWN slab slot the
        round that slot is free — pure elementwise selects.

        Why own-slot, not cross-lane rank matching: at slab size a
        single arbitrary-index TPU gather or scatter costs ~2.6 ms
        (benchmarks/probe_split2.py), and any cross-lane permutation
        needs ~11 of them per round — ~30 ms against a ~1 ms fused
        bounce, which is exactly the 0.875 Mrays/s split-path collapse
        the round-4 capture measured. A branch therefore waits for its
        own lane (primaries die within a few bounces, and placement
        runs BEFORE regeneration, so the wait is bounded and fresh
        source rays can never starve a pending branch); the cost is
        that a lane splitting again while one branch waits
        roulette-merges the two (unbiased, see merge_secondaries) —
        more frequent than under rank matching, but each merge only
        halves the sample count of that lane's ~R-energy branch."""
        place = ovf.alive & ~bundle.alive
        bundle = _where_ray_fields(place, ovf, bundle).replace(
            alive=bundle.alive | place)
        # the branch's path already includes the split bounce, so it
        # resumes one bounce further along than its parent was
        age = jnp.where(place, ovf_age + 1, age)
        ovf = ovf.replace(alive=ovf.alive & ~place,
                          energy=jnp.where(place, 0.0, ovf.energy))
        return bundle, age, ovf

    def merge_secondaries(ovf, ovf_age, prev, age_now, rec, accum, k):
        """Park this round's reflected branches in their lanes' overflow
        slots; a lane whose slot is still occupied roulette-merges the
        two branches (energy-proportional keep, summed energy)."""
        s_mask, s_e, s_dir = rec.split
        ok = s_mask & (s_e > min_energy)
        accum = accum.replace(culled=accum.culled + jnp.sum(
            jnp.where(s_mask & ~ok, s_e, 0.0)))
        both = ovf.alive & ok
        tot = ovf.energy + s_e
        u = jax.random.uniform(k, (n,), dtype=s_e.dtype)
        take_new = both & (u * tot < s_e)
        new_store = (ok & ~ovf.alive) | take_new
        # the branch starts at the hit point along the reflected
        # direction with the INCIDENCE side's wavelength/index/medium
        sec = prev.replace(pos=rec.hit, dir=s_dir)
        ovf = _where_ray_fields(new_store, sec, ovf).replace(
            energy=jnp.where(both, tot,
                             jnp.where(ok & ~ovf.alive, s_e, ovf.energy)),
            alive=ovf.alive | ok)
        ovf_age = jnp.where(new_store, age_now, ovf_age)
        return ovf, ovf_age, accum

    def cond(state):
        i, bundle, age, ovf, ovf_age, accum, key, emitted, source_e = state
        live = (emitted < total_rays) | jnp.any(bundle.alive)
        if split:
            live = live | jnp.any(ovf.alive)
        return (i < max_rounds) & live

    def body(state):
        i, bundle, age, ovf, ovf_age, accum, key, emitted, source_e = state
        key, k_src, k_bounce, k_merge = jax.random.split(key, 4)
        if split:
            bundle, age, ovf = place_overflow(bundle, age, ovf, ovf_age)
        bundle, age, emitted, source_e = regenerate(bundle, age, k_src,
                                                    emitted, source_e)
        prev = bundle
        bundle, accum, rec = _bounce_step(
            scene, bundle, accum, k_bounce, min_energy=min_energy,
            t_eps=t_eps, disc_eps=disc_eps, block=block, count_hits=False,
            need_local=False, split_mode=split)
        if split:
            ovf, ovf_age, accum = merge_secondaries(
                ovf, ovf_age, prev, age, rec, accum, k_merge)
        if fluxspecs:
            accum = accum.replace(flux=_dfm.accumulate(
                accum.flux, fluxspecs, scene, rec.sid, rec.hit,
                rec.absorbed, key=k_bounce))
        # per-ray bounce budget: cull overage rays, account their energy
        age = age + 1
        over = bundle.alive & (age >= max_path)
        accum = accum.replace(
            culled=accum.culled + jnp.sum(jnp.where(over, bundle.energy, 0.0)))
        bundle = bundle.replace(alive=bundle.alive & ~over)
        # overflow branches past the bounce budget are culled too (their
        # age was inherited from the splitting lane)
        if split:
            over_o = ovf.alive & (ovf_age + 1 >= max_path)
            accum = accum.replace(culled=accum.culled + jnp.sum(
                jnp.where(over_o, ovf.energy, 0.0)))
            ovf = ovf.replace(alive=ovf.alive & ~over_o)
        return (i + 1, bundle, age, ovf, ovf_age, accum, key, emitted,
                source_e)

    zero_i = jnp.sum(probe.parent) * 0
    # the overflow carry exists only in split mode (None is an empty
    # pytree, so non-split scenes pay no extra HBM traffic per round)
    ovf0 = empty if split else None
    ovf_age0 = jnp.zeros((n,), dtype=jnp.int32) + zero_i if split else None
    state = (jnp.array(0, dtype=jnp.int32), empty,
             jnp.zeros((n,), dtype=jnp.int32) + zero_i, ovf0, ovf_age0,
             accum0, key, jnp.array(0, dtype=jnp.int32) + zero_i, source0)
    _, bundle, _, ovf, _, accum, _, emitted, source_e = jax.lax.while_loop(
        cond, body, state)
    # exact closure on early (max_rounds) exit: account live-ray energy,
    # including branches still parked in the overflow
    residual = jnp.sum(jnp.where(bundle.alive, bundle.energy, 0.0))
    if split:
        residual = residual + jnp.sum(
            jnp.where(ovf.alive, ovf.energy, 0.0))
    accum = accum.replace(residual=accum.residual + residual)
    return accum, emitted, source_e

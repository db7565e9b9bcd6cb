"""Monte-Carlo radiative view factors with adaptive precision.

Capability parity with the reference's emissive_losses/view_factors_3D.py:
the RTVF base (adaptive 3-sigma Welford loop gating per-element ray firing
via the stdev + reciprocity + summation tests, :44-106) and the
2N-parameter axisymmetric cavity driver (Two_N_parameters_cavity_RTVF :359).

TPU-native re-design: ALL active elements' emission bundles are
concatenated into ONE device call per adaptive iteration — sampling,
nearest-hit intersection, destination-element binning and the
(src, dst) exchange-matrix segment-sum all run inside a single jit —
and only the converged (n, n) matrix crosses to the host, where the
Welford / reciprocity / summation gates run. View factors are
direct-exchange fractions, so one nearest_hit pass with per-row
absorptivity IS the full trace (the walls are absorptivity-1
Lambertian); no bounce loop, no record transfer, no per-element Python.
The per-element host path (`batched=False`) is kept as the oracle.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import geometry as G
from .. import materials as M
from ..engine import TracerEngine, TraceOptions
from ..scene import Assembly, AssembledObject, Surface
from .. import spatial as sp
from ..sources import disk_bundle, vf_cylinder_bundle, vf_frustum_bundle


def build_two_n_cavity(aperture_radius: float, frusta_radii: Sequence[float],
                       frusta_depths: Sequence[float], cone_depth: float,
                       optics=None, aperture_optics=None) -> Assembly:
    """Axisymmetric cavity: aperture disc at z=0, a chain of frusta /
    cylinders, closed by a cone (or flat plate). Mirrors the geometry
    construction of ref Two_N_parameters_cavity_RTVF (:436-476).

    optics - per-surface OpticsSpec factory (default: absorptivity-1
        Lambertian, the VF configuration).
    aperture_optics - separate factory for the aperture disc (default:
        same as ``optics`` — the VF convention's black virtual element;
        the SOLAR model passes a bifacial transparent-outside disc so
        concentrated sunlight can enter, models/two_n_cavity.py).
    """
    frusta_radii = list(frusta_radii)
    frusta_depths = list(frusta_depths)
    if optics is None:
        optics = lambda: M.lambertian(absorptivity=1.0)
    if aperture_optics is None:
        aperture_optics = optics

    objs = []
    # aperture
    objs.append(AssembledObject(surfs=[Surface(
        G.round_plate(aperture_radius), aperture_optics(),
        name="aperture")]))

    radii = [aperture_radius] + frusta_radii
    z = 0.0
    for i in range(len(frusta_radii)):
        r_in, r_out, d = radii[i], radii[i + 1], frusta_depths[i]
        name = f"frustum_{i}"
        if r_in == r_out:  # cylinder section
            surf = Surface(G.finite_cylinder(2.0 * r_out, abs(d)), optics(),
                           name=name)
            obj = AssembledObject(surfs=[surf])
            obj.set_transform(sp.translate(z=z + d / 2.0))
        elif d == 0.0:  # flat annular step
            surf = Surface(G.round_plate(max(r_in, r_out), min(r_in, r_out)),
                           optics(), name=name)
            obj = AssembledObject(surfs=[surf])
            obj.set_transform(sp.translate(z=z))
        else:
            surf = Surface(G.conical_frustum(0.0, r_in, abs(d), r_out),
                           optics(), name=name)
            obj = AssembledObject(surfs=[surf])
            if d < 0.0:
                obj.set_transform(sp.translate(z=z) @ sp.rotx(np.pi))
            else:
                obj.set_transform(sp.translate(z=z))
        objs.append(obj)
        z += d

    max_depth = z
    r_last = radii[-1]
    if cone_depth > 0.0:  # outgoing cone
        obj = AssembledObject(surfs=[Surface(
            G.finite_cone(r_last, cone_depth),
            optics(), name="cone")])
        obj.set_transform(sp.rotx(np.pi) @ sp.translate(z=-(max_depth
                                                            + cone_depth)))
    elif cone_depth == 0.0:  # flat back plate
        obj = AssembledObject(surfs=[Surface(
            G.round_plate(r_last), optics(), name="cone")])
        obj.set_transform(sp.translate(z=max_depth))
    else:  # inward cone
        obj = AssembledObject(surfs=[Surface(
            G.finite_cone(r_last, -cone_depth), optics(), name="cone")])
        obj.set_transform(sp.translate(z=max_depth + cone_depth))
    objs.append(obj)
    return Assembly(objects=objs)


class RTVFBase:
    """Adaptive-precision Welford machinery shared by the view-factor
    drivers (ref RTVF.test_precision, view_factors_3D.py:44-106)."""

    def _init_stats(self, n: int, num_rays: int):
        self.n_elements = n
        self.num_rays = int(num_rays)
        self.VF = np.zeros((n, n))
        self.VF_esperance = np.zeros((n, n))
        self.Qsum = np.zeros((n, n))
        self.stdev_VF = np.zeros((n, n))
        self.p = np.zeros(n)
        self.ray_counts = np.full(n, self.num_rays, dtype=float)
        self.progress = np.ones((n, n), dtype=bool)

    def _test_precision(self) -> None:
        r = self.ray_counts[:, None]
        p = np.maximum(self.p[:, None], 1.0)
        p_1 = np.maximum(p - r, 0.0)
        Ai = np.broadcast_to(self.areas[:, None], self.VF.shape)

        fired = r > 0
        self.Qsum = np.where(
            fired, self.Qsum + r * p_1 / p * (self.VF - self.VF_esperance) ** 2,
            self.Qsum)
        with np.errstate(divide="ignore", invalid="ignore"):
            self.stdev_VF = 3.0 * np.sqrt(self.Qsum / np.maximum(p - 1.0, 1.0)) \
                / np.sqrt(p)
        self.VF_esperance = np.where(
            fired, (self.VF_esperance * p_1 + self.VF * r) / p,
            self.VF_esperance)

        AiFij = self.VF_esperance * Ai
        if self.precision_option == "absolute":
            stdev_test = self.stdev_VF <= self.precision / 2.0
            tas = self.stdev_VF * Ai
            reciprocity_test = (tas + tas.T) <= self.precision_rec
        else:
            with np.errstate(divide="ignore", invalid="ignore"):
                rel = np.nan_to_num(self.stdev_VF / self.VF_esperance)
                stdev_test = rel <= self.precision
                tas = Ai * self.stdev_VF
                rel_rec = np.nan_to_num((tas + tas.T) / AiFij,
                                        posinf=0.0, neginf=0.0)
            reciprocity_test = (rel_rec <= self.precision_rec) | (
                AiFij < self.precision_rec * np.max(AiFij, axis=1,
                                                    keepdims=True))
        summ_test = np.abs(self.VF_esperance.sum(axis=1) - 1.0) \
            < self.precision
        self.progress = ~(summ_test[:, None] & stdev_test & reciprocity_test)

    def _adaptive_loop(self, key, max_iters: int, min_iters: int,
                       fire_element) -> None:
        """Fire ``fire_element(key, el) -> VF row`` per unconverged element
        until the precision gates pass."""
        stable = 0
        it = 0
        while (self.progress.any() or stable < 2) and it < max_iters:
            it += 1
            for el in range(self.n_elements):
                if self.ray_counts[el] == 0.0:
                    continue
                key, sub = jax.random.split(key)
                self.VF[el] = fire_element(sub, el)
            self.p += self.ray_counts
            self._test_precision()
            if it >= min_iters and not self.progress.any():
                stable += 1
            else:
                stable = 0
            self.ray_counts = np.where(self.progress.any(axis=1),
                                       float(self.num_rays), 0.0)
        self.iterations = it

    def _adaptive_loop_batched(self, key, max_iters: int, min_iters: int,
                               fire_all) -> None:
        """Batched adaptive loop: ``fire_all(key) -> (k, n, n) VF samples``
        is ONE device call covering every element for ``iters_per_call``
        independent sub-iterations; rows of converged elements are simply
        ignored (device rays are ~free next to the host round-trips they
        replace — the round-3 per-element path spent 4 orders of magnitude
        on exactly those, and through a tunneled runtime even the
        one-call-per-iteration loop is round-trip-bound, hence the
        k-samples-per-call amortization). Samples are consumed one at a
        time through the same Welford/gating sequence as before, so the
        statistics are identical to k separate device calls."""
        stable = 0
        it = 0
        pending: list = []
        while (self.progress.any() or stable < 2) and it < max_iters:
            it += 1
            if not pending:
                key, sub = jax.random.split(key)
                pending = list(fire_all(sub))
            vf = pending.pop(0)
            active = self.ray_counts > 0
            self.VF[active] = vf[active]
            self.p += self.ray_counts
            self._test_precision()
            if it >= min_iters and not self.progress.any():
                stable += 1
            else:
                stable = 0
            self.ray_counts = np.where(self.progress.any(axis=1),
                                       float(self.num_rays), 0.0)
        self.iterations = it

    def _wrap_fire(self, fire_fn, scene):
        """Jit ``fire_fn(scene, key) -> (n, n)`` into a host callable
        returning ``iters_per_call`` stacked samples per device call
        (sequential lax.map on device: each sample is already one fused
        program; the point is amortizing the host round trip, not
        parallelism)."""
        k = max(1, int(getattr(self, "iters_per_call", 1)))

        def many(scene, key):
            return jax.lax.map(lambda kk: fire_fn(scene, kk),
                               jax.random.split(key, k))

        jm = jax.jit(many)
        return lambda key: np.asarray(jm(scene, key))

    # --- batched device helpers (shared by the drivers) ---------------------
    def _alpha_rows(self):
        """Per-table-row absorbed fraction for a single bounce, or None if
        the batched one-bounce path would not be exact (it then falls back
        to the per-element engine loop). One bounce is exact only when
        every surface absorbs FULLY on first hit — the black-surface
        condition a geometric view factor requires anyway (ref builds its
        VF cavities from absorptivity-1 LambertianReceiver surfaces,
        view_factors_3D.py:432-460); with any reflecting row the engine
        loop's multi-bounce redistribution matters."""
        import logging
        meta = self.engine.meta
        kinds = np.asarray(meta.host_opt_kind)
        ok = np.isin(kinds, [M.K_LAMBERTIAN, M.K_REFLECT, M.K_ABSORBER])
        if not ok.all():
            logging.getLogger("tracer_tpu").warning(
                "view factors: cavity has non-Lambertian/absorber optics "
                "(kinds %s) — falling back to the per-element engine loop "
                "(~2 orders slower than the batched device path; use "
                "absorptivity-1 Lambertian elements for geometric VFs)",
                sorted(set(kinds.tolist())))
            return None
        p0 = np.asarray(meta.host_opt_params)[:, 0]
        alpha = np.where(kinds == M.K_ABSORBER, 1.0, p0)
        if not (alpha >= 1.0 - 1e-9).all():
            logging.getLogger("tracer_tpu").warning(
                "view factors: %d cavity rows have absorptivity < 1 — "
                "falling back to the per-element engine loop (~2 orders "
                "slower). Geometric view factors presume BLACK elements; "
                "set absorptivity=1 to ride the batched device path",
                int((alpha < 1.0 - 1e-9).sum()))
            return None
        return jnp.asarray(alpha)

    def _concat_sources(self, key):
        """Sample every element's emission bundle under jit and concatenate
        (pos, dirs, energy). Static shapes: n_elements * num_rays rays."""
        keys = jax.random.split(key, self.n_elements)
        parts = [self._element_source(keys[el], el)
                 for el in range(self.n_elements)]
        pos = jnp.concatenate([b.pos for b in parts])
        dirs = jnp.concatenate([b.dir for b in parts])
        e = jnp.concatenate([b.energy for b in parts])
        return pos, dirs, e


class BinnedAxisymmetricRTVF(RTVFBase):
    """View factors for an arbitrary axisymmetric receiver described by a
    binning scheme — the generic form of the reference's FONaR_RTVF
    (view_factors_3D.py:114): element i is the wall patch with angular span
    scheme[i,0], z span scheme[i,1] and radius span scheme[i,2] (equal z ->
    annular disc; equal r -> cylinder wall; otherwise frustum). Emission
    bundles are chosen per patch type (ref gen_source :217) and absorbed
    energy is binned back by the global hit coordinates.

    assembly - scene whose surfaces cover the patches (absorptivity-1
    optics recommended); rays_in - per-element emission orientation
    (True = toward the axis), scalar or (n,) array.
    """

    def __init__(self, assembly, binning_scheme, areas, num_rays=10000,
                 precision=0.01, precision_option="absolute",
                 precision_rec=None, rays_in=True, key=None,
                 max_iters=200, min_iters=3, batched=True,
                 iters_per_call=8):
        self.iters_per_call = int(iters_per_call)
        self.binning_scheme = np.asarray(binning_scheme, dtype=float)
        self.areas = np.asarray(areas, dtype=float)
        self.precision = precision
        self.precision_rec = precision_rec or precision
        self.precision_option = precision_option
        n = len(self.binning_scheme)
        self.rays_in = np.broadcast_to(np.asarray(rays_in), (n,))
        self._init_stats(n, num_rays)
        self.engine = TracerEngine(assembly)
        if key is None:
            key = jax.random.PRNGKey(20260816)
        fire_all = self._build_fire_all() if batched else None
        if fire_all is not None:
            self._adaptive_loop_batched(key, max_iters, min_iters, fire_all)
        else:
            self._adaptive_loop(key, max_iters, min_iters, self._fire)

    def _build_fire_all(self):
        """One-device-call iteration: sample all elements, nearest-hit,
        window-bin destinations and matmul-reduce the exchange matrix."""
        from ..kernels.intersect import nearest_hit
        alpha = self._alpha_rows()
        if alpha is None:
            return None
        n, nrays = self.n_elements, self.num_rays
        sch = self.binning_scheme
        tol = 1e-6
        zz = np.sort(sch[:, 1], axis=1)
        rr = np.sort(sch[:, 2], axis=1)
        wins = jnp.asarray(np.stack([
            sch[:, 0, 0] - tol, sch[:, 0, 1] + tol,
            zz[:, 0] - tol, zz[:, 1] + tol,
            rr[:, 0] - tol, rr[:, 1] + tol], axis=1))
        scene = self.engine.scene

        def fire_all(scene, key):
            pos, dirs, e = self._concat_sources(key)
            t, sid = nearest_hit(scene, pos, dirs)
            hit = jnp.where(jnp.isfinite(t)[:, None],
                            pos + t[:, None] * dirs, 0.0)
            absorbed = jnp.where(sid >= 0,
                                 e * alpha[jnp.maximum(sid, 0)], 0.0)
            ang = jnp.arctan2(hit[:, 1], hit[:, 0])
            ang = jnp.where(ang < 0.0, ang + 2.0 * np.pi, ang)
            z, r = hit[:, 2], jnp.hypot(hit[:, 0], hit[:, 1])
            # (N, n) window mask — matches the host loop's semantics
            # exactly, including tol-overlap double counting at the seams
            m = ((ang[:, None] >= wins[None, :, 0])
                 & (ang[:, None] <= wins[None, :, 1])
                 & (z[:, None] >= wins[None, :, 2])
                 & (z[:, None] <= wins[None, :, 3])
                 & (r[:, None] >= wins[None, :, 4])
                 & (r[:, None] <= wins[None, :, 5]))
            contrib = jnp.where(m, absorbed[:, None], 0.0)
            per_src = contrib.reshape(n, nrays, n).sum(axis=1)
            emitted = e.reshape(n, nrays).sum(axis=1)
            return per_src / emitted[:, None]

        return self._wrap_fire(fire_all, scene)

    def _element_source(self, key, el: int):
        ang, zz, rr = self.binning_scheme[el]
        nrays = self.num_rays
        rays_in = bool(self.rays_in[el])
        if zz[0] == zz[1]:      # annular disc
            return disk_bundle(key, nrays, center=[0, 0, zz[0]],
                               direction=[0, 0, 1.0 if rays_in else -1.0],
                               radius=rr[1], radius_in=rr[0],
                               angular_span=tuple(ang),
                               ang_range=np.pi / 2,
                               flux=1.0 / (0.5 * (ang[1] - ang[0])
                                           * (rr[1]**2 - rr[0]**2)))
        if rr[0] == rr[1]:      # cylinder wall
            return vf_cylinder_bundle(
                key, nrays, rc=rr[0], lc=abs(zz[1] - zz[0]),
                center=[0, 0, 0.5 * (zz[0] + zz[1])],
                direction=[0, 0, np.sign(zz[1] - zz[0])],
                rays_in=rays_in, angular_span=tuple(ang))
        # frustum
        z0, z1 = (zz[0], zz[1]) if zz[1] > zz[0] else (zz[1], zz[0])
        r0, r1 = (rr[0], rr[1]) if zz[1] > zz[0] else (rr[1], rr[0])
        return vf_frustum_bundle(key, nrays, r0=r0, r1=r1, depth=z1 - z0,
                                 center=[0, 0, z0], direction=[0, 0, 1.0],
                                 rays_in=rays_in, angular_span=tuple(ang))

    def _fire(self, key, el: int) -> np.ndarray:
        k1, k2 = jax.random.split(key)
        bund = self._element_source(k1, el)
        res = self.engine.ray_tracer(
            bund, reps=1, min_energy=1e-12, key=k2,
            opts=TraceOptions(max_bounces=1, min_energy=1e-12))
        rec = res.records[0]
        sid = np.asarray(rec.sid)
        ok = np.asarray(rec.alive_in) & (sid >= 0)
        hit = np.asarray(rec.hit)[ok]
        absorbed = np.asarray(rec.absorbed)[ok]
        emitted = float(np.asarray(bund.energy).sum())
        # bin by global (angle, z, r) windows of the scheme
        ang = np.arctan2(hit[:, 1], hit[:, 0])
        ang = np.where(ang < 0.0, ang + 2.0 * np.pi, ang)
        z = hit[:, 2]
        r = np.hypot(hit[:, 0], hit[:, 1])
        out = np.zeros(self.n_elements)
        sch = self.binning_scheme
        tol = 1e-6
        for j in range(self.n_elements):
            zlo, zhi = sorted(sch[j, 1])
            rlo, rhi = sorted(sch[j, 2])
            m = ((ang >= sch[j, 0, 0] - tol) & (ang <= sch[j, 0, 1] + tol)
                 & (z >= zlo - tol) & (z <= zhi + tol)
                 & (r >= rlo - tol) & (r <= rhi + tol))
            out[j] = absorbed[m].sum()
        return out / emitted


# the reference's class name
FONaR_RTVF = BinnedAxisymmetricRTVF


class TwoNParametersCavityRTVF(RTVFBase):
    """Adaptive MC view factors of a 2N-parameter cavity
    (ref Two_N_parameters_cavity_RTVF :359 + RTVF.test_precision :44).

    Elements (in order): aperture, el_FRUs[i] depth-equal slices per
    frustum, el_CON slices of the cone. After construction,
    ``VF_esperance`` holds the converged VF matrix and ``areas`` the
    analytic element areas.
    """

    def __init__(self, apertureRadius: float, frustaRadii, frustaDepths,
                 coneDepth: float, el_FRUs, el_CON: int,
                 num_rays: int = 10000, precision: float = 0.01,
                 precision_option: str = "absolute",
                 precision_rec: Optional[float] = None,
                 key=None, max_iters: int = 200, min_iters: int = 3,
                 batched: bool = True, iters_per_call: int = 8):
        self.iters_per_call = int(iters_per_call)
        self.aperture_radius = float(apertureRadius)
        self.frusta_radii = [float(r) for r in np.atleast_1d(frustaRadii)]
        self.frusta_depths = [float(d) for d in np.atleast_1d(frustaDepths)]
        self.cone_depth = float(coneDepth)
        self.el_FRUs = [int(e) for e in np.atleast_1d(el_FRUs)]
        self.el_CON = int(el_CON)
        for d, el in zip(self.frusta_depths, self.el_FRUs):
            if d == 0.0 and el != 1:
                # a flat annular step has no depth axis to slice along
                raise ValueError("zero-depth (flat annular step) sections "
                                 "support exactly one element")
        self.num_rays = int(num_rays)
        self.precision = precision
        self.precision_rec = precision_rec or precision
        self.precision_option = precision_option

        n = 1 + sum(self.el_FRUs) + self.el_CON
        self.areas = self._element_areas(n)
        self._init_stats(n, num_rays)

        asm = build_two_n_cavity(self.aperture_radius, self.frusta_radii,
                                 self.frusta_depths, self.cone_depth)
        self.engine = TracerEngine(asm)
        self._logical_of_row = self.engine.meta.row_logical

        if key is None:
            key = jax.random.PRNGKey(20260816)
        fire_all = self._build_fire_all() if batched else None
        if fire_all is not None:
            self._adaptive_loop_batched(key, max_iters, min_iters, fire_all)
        else:
            self._adaptive_loop(key, max_iters, min_iters, self._fire)

    def _build_fire_all(self):
        """One-device-call iteration (round-3 verdict item 2): sample every
        element's bundle, one nearest_hit over the cavity table, bin the
        destination element on device (z-slab per frustum, radius ring on
        the cone — the device mirror of _bin_absorbed) and segment-sum the
        (src, dst) exchange matrix."""
        from ..kernels.intersect import nearest_hit
        alpha = self._alpha_rows()
        if alpha is None:
            return None
        n, nrays = self.n_elements, self.num_rays
        row_logical = jnp.asarray(self._logical_of_row)
        names = self.engine.meta.names
        ap_l = names.index("aperture")
        cone_l = names.index("cone")
        # static per-frustum binning info: (logical id, first element idx,
        # n slices, z start, depth)
        frusta = []
        idx, z = 1, 0.0
        for k, (el, d) in enumerate(zip(self.el_FRUs, self.frusta_depths)):
            frusta.append((names.index(f"frustum_{k}"), idx, el, z, d))
            idx += el
            z += d
        cone_idx = idx
        r_last = self.frusta_radii[-1]
        el_con = self.el_CON
        scene = self.engine.scene

        def dst_of(sid, hit):
            logical = row_logical[jnp.maximum(sid, 0)]
            valid = sid >= 0
            dst = jnp.full(sid.shape, n, dtype=jnp.int32)  # n = escaped
            dst = jnp.where(valid & (logical == ap_l), 0, dst)
            for (f_l, i0, el, z0, d) in frusta:
                if d == 0.0:
                    # flat annular step: single element (no depth axis)
                    dst = jnp.where(valid & (logical == f_l), i0, dst)
                    continue
                rel = (hit[:, 2] - z0) / d * el
                b = jnp.clip(rel.astype(jnp.int32), 0, el - 1)
                dst = jnp.where(valid & (logical == f_l), i0 + b, dst)
            rr = jnp.hypot(hit[:, 0], hit[:, 1]) / r_last
            b = jnp.clip((el_con * (1.0 - rr)).astype(jnp.int32),
                         0, el_con - 1)
            dst = jnp.where(valid & (logical == cone_l), cone_idx + b, dst)
            return dst

        def fire_all(scene, key):
            pos, dirs, e = self._concat_sources(key)
            t, sid = nearest_hit(scene, pos, dirs)
            hit = jnp.where(jnp.isfinite(t)[:, None],
                            pos + t[:, None] * dirs, 0.0)
            absorbed = jnp.where(sid >= 0,
                                 e * alpha[jnp.maximum(sid, 0)], 0.0)
            dst = dst_of(sid, hit)
            src = jnp.repeat(jnp.arange(n, dtype=jnp.int32), nrays)
            flat = src * (n + 1) + dst
            mat = jax.ops.segment_sum(absorbed, flat,
                                      num_segments=n * (n + 1))
            mat = mat.reshape(n, n + 1)[:, :n]
            emitted = e.reshape(n, nrays).sum(axis=1)
            return mat / emitted[:, None]

        return self._wrap_fire(fire_all, scene)

    # --- geometry bookkeeping ------------------------------------------------
    def _element_areas(self, n: int) -> np.ndarray:
        """Analytic element areas (ref :404-427)."""
        areas = np.zeros(n)
        areas[0] = np.pi * self.aperture_radius**2
        radii_chain = [self.aperture_radius] + self.frusta_radii
        idx = 1
        for k, (el, d) in enumerate(zip(self.el_FRUs, self.frusta_depths)):
            r_in, r_out = radii_chain[k], radii_chain[k + 1]
            if r_in == r_out:
                areas[idx:idx + el] = 2.0 * np.pi * r_out * abs(d) / el
            else:
                L = np.sqrt(d**2 + (r_out - r_in) ** 2) / el
                radii = r_in + np.arange(el + 1) * (r_out - r_in) / el
                areas[idx:idx + el] = np.pi * (radii[:-1] + radii[1:]) * L
            idx += el
        r_last = self.frusta_radii[-1]
        radii = r_last + np.arange(self.el_CON + 1) * (-r_last) / self.el_CON
        areas[idx:] = (np.pi * (radii[:-1] + radii[1:])
                       * np.sqrt(self.cone_depth**2 + r_last**2) / self.el_CON)
        return areas

    def _element_z_edges(self):
        """(surface_logical_id, z_lo, z_hi) per element, global coords."""
        out = [("aperture", 0, 0.0, 0.0)]
        z = 0.0
        for k, (el, d) in enumerate(zip(self.el_FRUs, self.frusta_depths)):
            for e in range(el):
                z0 = z + e * d / el
                z1 = z + (e + 1) * d / el
                out.append((f"frustum_{k}", 1 + k, min(z0, z1), max(z0, z1)))
            z += d
        zc0, zc1 = sorted((z, z + self.cone_depth)) if self.cone_depth != 0 \
            else (z, z)
        for e in range(self.el_CON):
            # cone elements sliced by radius (equal-radius rings); bin by
            # radial distance instead of z for the flat-plate case
            out.append(("cone", 1 + len(self.el_FRUs), zc0, zc1, e))
        return out

    # --- element sources -----------------------------------------------------
    def _element_source(self, key, element: int):
        """Emission bundle of one element (ref gen_source + :490-540)."""
        nrays = self.num_rays
        ap_r = self.aperture_radius
        if element == 0:
            return disk_bundle(key, nrays, center=[0, 0, 0],
                               direction=[0, 0, 1.0], radius=ap_r,
                               ang_range=np.pi / 2,
                               flux=1.0 / (np.pi * ap_r**2))
        idx = 1
        radii_chain = [self.aperture_radius] + self.frusta_radii
        z = 0.0
        for k, (el, d) in enumerate(zip(self.el_FRUs, self.frusta_depths)):
            for e in range(el):
                if element == idx:
                    r0 = radii_chain[k] + e * (radii_chain[k + 1]
                                               - radii_chain[k]) / el
                    r1 = radii_chain[k] + (e + 1) * (radii_chain[k + 1]
                                                     - radii_chain[k]) / el
                    depth = d / el
                    center = [0, 0, z + e * d / el]
                    if d == 0.0:
                        # flat annular step: Lambertian annulus facing
                        # the WIDER side's cavity section (el == 1,
                        # validated in __init__)
                        r_lo, r_hi = sorted((r0, r1))
                        dirn = [0, 0, 1.0] if r1 > r0 else [0, 0, -1.0]
                        return disk_bundle(
                            key, nrays, center=[0, 0, z], direction=dirn,
                            radius=r_hi, radius_in=r_lo,
                            ang_range=np.pi / 2,
                            flux=1.0 / (np.pi * (r_hi**2 - r_lo**2)))
                    if r0 == r1:
                        return vf_cylinder_bundle(
                            key, nrays, rc=r0, lc=abs(depth),
                            center=[0, 0, z + (e + 0.5) * d / el],
                            direction=[0, 0, 1.0], rays_in=True)
                    return vf_frustum_bundle(
                        key, nrays, r0=r0, r1=r1, depth=depth,
                        center=center, direction=[0, 0, 1.0],
                        rays_in=(d >= 0.0))
                idx += 1
            z += d
        # cone elements: sub-frusta of the cone wall
        e = element - idx
        r_last = self.frusta_radii[-1]
        cd = self.cone_depth
        if cd == 0.0:  # flat back plate: annular disk emitters
            r_hi = r_last * (1.0 - e / self.el_CON)
            r_lo = r_last * (1.0 - (e + 1) / self.el_CON)
            return disk_bundle(key, nrays, center=[0, 0, z],
                               direction=[0, 0, -1.0], radius=r_hi,
                               ang_range=np.pi / 2, radius_in=r_lo,
                               flux=1.0 / (np.pi * (r_hi**2 - r_lo**2)))
        r0 = r_last * (1.0 - e / self.el_CON)
        r1 = r_last * (1.0 - (e + 1) / self.el_CON)
        z0 = z + cd * e / self.el_CON
        depth = cd / self.el_CON
        # outgoing cone (cd>0): the cavity sees the cone's inside
        # (ref rays_cone=True for coneDepth>0, :463-476)
        return vf_frustum_bundle(key, nrays, r0=r0, r1=max(r1, 1e-9 * r_last),
                                 depth=depth, center=[0, 0, z0],
                                 direction=[0, 0, 1.0], rays_in=(cd > 0.0))

    # --- binning --------------------------------------------------------------
    def _bin_absorbed(self, result) -> np.ndarray:
        """Absorbed energy per element from trace records (z/radial slabs)."""
        out = np.zeros(self.n_elements)
        rec = result.records[0]  # single-bounce trace
        sid = np.asarray(rec.sid)
        hit = np.asarray(rec.hit)
        absorbed = np.asarray(rec.absorbed)
        alive = np.asarray(rec.alive_in)
        logical = self._logical_of_row[np.maximum(sid, 0)]
        valid = alive & (sid >= 0)

        names = self.engine.meta.names
        ap_l = names.index("aperture")
        cone_l = names.index("cone")
        # aperture element
        out[0] = absorbed[valid & (logical == ap_l)].sum()
        idx = 1
        z = 0.0
        for k, (el, d) in enumerate(zip(self.el_FRUs, self.frusta_depths)):
            f_l = names.index(f"frustum_{k}")
            m = valid & (logical == f_l)
            if m.any():
                if d == 0.0:     # flat annular step: single element
                    b = np.zeros(int(m.sum()), dtype=int)
                else:
                    rel = (hit[m, 2] - z) / d * el
                    b = np.clip(rel.astype(int), 0, el - 1)
                np.add.at(out, idx + b, absorbed[m])
            idx += el
            z += d
        # cone: bin by radius ring (equal radial slices, matches areas)
        m = valid & (logical == cone_l)
        if m.any():
            r_last = self.frusta_radii[-1]
            rr = np.hypot(hit[m, 0], hit[m, 1]) / r_last
            b = np.clip((self.el_CON * (1.0 - rr)).astype(int), 0,
                        self.el_CON - 1)
            np.add.at(out, idx + b, absorbed[m])
        return out

    def _fire(self, key, el: int) -> np.ndarray:
        k1, k2 = jax.random.split(key)
        bund = self._element_source(k1, el)
        res = self.engine.ray_tracer(
            bund, reps=1, min_energy=1e-10, key=k2,
            opts=TraceOptions(max_bounces=1, min_energy=1e-10))
        emitted = float(np.asarray(bund.energy).sum())
        return self._bin_absorbed(res) / emitted


class FourParametersCavityRTVF(TwoNParametersCavityRTVF):
    """4-parameter cavity (aperture radius/depth + cone radius/depth)
    wrapper around the 2N driver (ref Four_parameters_cavity_RTVF,
    view_factors_3D.py:677; "Open cavity receiver geometry influence on
    radiative losses", DOI:10.13140/2.1.3845.5048)."""

    def __init__(self, apertureRadius, apertureDepth, coneRadius, coneDepth,
                 el_FRU, el_CON, num_rays=10000, precision=0.01, **kw):
        TwoNParametersCavityRTVF.__init__(
            self, apertureRadius, [coneRadius], [apertureDepth], coneDepth,
            el_FRU, el_CON, num_rays=num_rays, precision=precision, **kw)

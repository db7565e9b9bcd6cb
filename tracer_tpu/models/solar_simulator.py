"""High-flux solar simulator: ellipsoidal reflector modules with plasma-arc
lamp models, flux-mapped targets, and a batched simulate loop with Welford
confidence intervals.

Capability parity with the reference's tracer/models/solar_simulator.py
(Target :21, SolarSimulator.simulate :56-138, SolarSimulatorModule :139,
SimulatorReflector :195, SimulatorLampBader :214, SimulatorLampZhu :261).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np

from .. import geometry as G
from .. import materials as M
from ..analysis.estimator import Estimator
from ..bundle import RayBundle, concatenate_rays
from ..engine import TracerEngine
from ..sampling import (PWLinearDistribution, cylinder_sampling,
                        lambertian_directions_sampling, sphere_sampling)
from ..scene import Assembly, AssembledObject, Surface
from ..spatial import rotation_to_z
from ..vector_utils import rotate_z_to_normal


class Target(AssembledObject):
    """Transparent flux-mapping plate: rays pass through unchanged while
    their incident energy is recorded; the fluxmap is a Welford estimator
    over batches (ref Target :21)."""

    def __init__(self, width, height, location, normal, binx, biny,
                 name="target"):
        geom = G.rect_plate(binx[-1] - binx[0], biny[-1] - biny[0])
        opt = M.with_accounting(M.transparent(), "reception", "location")
        rot = rotation_to_z(np.asarray(normal, dtype=float))
        AssembledObject.__init__(self, surfs=[Surface(geom, opt, name=name)],
                                 location=location, rotation=rot)
        self.name = name
        self.binx, self.biny = np.asarray(binx), np.asarray(biny)
        self.areas = (np.diff(self.binx)[:, None] * np.diff(self.biny)[None, :])
        self.fluxmap = Estimator()

    def evaluate_fluxmap(self, result):
        """Update the fluxmap estimator from a TraceResult's hits. Local
        hit coordinates are shifted by the bin arrays' center so
        non-centered bins still address the plate (the plate geometry is
        bin-span-sized and centered on its own origin; the reference
        histograms raw local coordinates, silently yielding an empty map
        for non-centered bins — deviation documented)."""
        hits = result.hits_of(self.name)
        cx = 0.5 * (self.binx[0] + self.binx[-1])
        cy = 0.5 * (self.biny[0] + self.biny[-1])
        if len(hits["e_in"]):
            power, _, _ = np.histogram2d(
                hits["local"][:, 0] + cx, hits["local"][:, 1] + cy,
                bins=(self.binx, self.biny), weights=hits["e_in"])
        else:
            power = np.zeros((len(self.binx) - 1, len(self.biny) - 1))
        self.fluxmap.update(power[None, ...] / self.areas)
        return self.fluxmap


class SimulatorReflector(AssembledObject):
    """Truncated ellipsoidal mirror; the lamp sits at the first focus
    (ref SimulatorReflector :195)."""

    def __init__(self, a, b, c, zlim, location, rotation,
                 reflectivity=0.9, slope_error=2.5e-3, bi_var=False):
        eccentricity = np.sqrt(1.0 - a**2 / c**2)
        half_focal_dist = c * eccentricity
        geom = G.ellipsoid(a, b, c).with_aperture(G.zrange(zlim[0], zlim[1]))
        opt = M.reflective(1.0 - reflectivity, slope_error, bi_var)
        AssembledObject.__init__(
            self, surfs=[Surface(geom, opt,
                                 location=[0.0, 0.0, half_focal_dist],
                                 name="reflector")],
            location=location, rotation=rotation)
        self.eccentricity = eccentricity
        self.focal_dist = 2.0 * half_focal_dist


class SimulatorLampBader:
    """Plasma-arc lamp: cylindrical emission volume with a tabulated polar
    emission CDF (Bader et al. 2015, doi:10.1115/1.4028702;
    ref SimulatorLampBader :214). theta_CDF: (n,2) [theta, CDF] array or a
    path to such a whitespace table."""

    def __init__(self, P_elec=2.5e3, eff_el=0.6, r_c=7.5e-4, l_c=4.5e-3,
                 theta_CDF=None, location=(0, 0, 0), direction=(0, 0, 1)):
        self.P = eff_el * P_elec
        self.r_c, self.l_c = r_c, l_c
        self.loc = np.asarray(location, dtype=float)
        self.dir = np.asarray(direction, dtype=float)
        if theta_CDF is None:
            # default: isotropic-in-theta CDF over [-pi/2, pi/2]
            ths = np.linspace(-np.pi / 2, np.pi / 2, 91)
            data = np.stack([ths, (ths + np.pi / 2) / np.pi], axis=1)
        elif isinstance(theta_CDF, str):
            data = np.loadtxt(theta_CDF)
        else:
            data = np.asarray(theta_CDF, dtype=float)
        integs = np.diff(data[:, 1])
        dths = np.diff(data[:, 0])
        pdf = integs / dths
        self._dist = PWLinearDistribution(data[:-1, 0] + dths / 2.0, pdf)

    def generate_rays(self, key, n_rays, part_load=1.0) -> RayBundle:
        P = self.P * part_load
        k1, k2, k3, k4 = jax.random.split(key, 4)
        # uniform points in the cylindrical arc volume
        import jax.numpy as jnp
        phi = jax.random.uniform(k1, (n_rays,), maxval=2 * np.pi)
        r = self.r_c * jnp.sqrt(jax.random.uniform(k2, (n_rays,)))
        z = jax.random.uniform(k3, (n_rays,), minval=-self.l_c / 2,
                               maxval=self.l_c / 2)
        verts = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=1)
        thetas, _ = self._dist.sample(k4, n_rays)
        phis = jax.random.uniform(jax.random.fold_in(k4, 1), (n_rays,),
                                  maxval=2 * np.pi)
        s = jnp.sin(thetas)
        dirs = jnp.stack([s * jnp.cos(phis), s * jnp.sin(phis),
                          jnp.cos(thetas)], axis=1)
        verts = jnp.asarray(rotate_z_to_normal(np.asarray(verts), self.dir)) \
            + self.loc
        dirs = jnp.asarray(rotate_z_to_normal(np.asarray(dirs), self.dir))
        return RayBundle.create(pos=verts, dir=dirs,
                                energy=np.full(n_rays, P / n_rays))


class SimulatorLampZhu:
    """Plasma-arc lamp as sphere + two cylinder emitters (Zhu et al. 2020,
    doi:10.1016/j.apenergy.2020.115165; ref SimulatorLampZhu :261)."""

    def __init__(self, P_elec=7e3, eff_el=0.6, alpha_s=0.3, beta_c1=0.0412,
                 gamma_c2=0.6588, location=(0, 0, 0), direction=(0, 0, 1)):
        self.a_s, self.b_c1, self.g_c2 = alpha_s, beta_c1, gamma_c2
        self.r_s = 0.5e-3 / 2.0
        self.r_c2 = 2e-3 / 2.0
        self.l_c = 10e-3
        self.P = eff_el * (alpha_s + beta_c1 + gamma_c2) * P_elec
        self.loc = np.asarray(location, dtype=float)
        self.dir = np.asarray(direction, dtype=float)

    def generate_rays(self, key, n_rays, part_load=1.0) -> RayBundle:
        import jax.numpy as jnp
        # per-fraction unit so emitted power totals self.P exactly: the
        # reference multiplies each component by its fraction AGAIN on
        # top of P = eff*(a+b+g)*P_elec (solar_simulator.py:296-307),
        # over/under-counting whenever the fractions don't sum to 1 —
        # deviation documented (defaults sum to 1, where both agree)
        P_unit = part_load * self.P / (self.a_s + self.b_c1 + self.g_c2)
        n_s = int(n_rays * self.a_s)
        n_c1 = int(n_rays * self.b_c1)
        n_c2 = n_rays - n_s - n_c1
        ks = jax.random.split(key, 6)

        vs, nms = sphere_sampling(ks[0], self.r_s, n_s)
        vs = vs.at[:, 2].add(-(self.l_c / 2 - self.r_s))
        ds = lambertian_directions_sampling(ks[1], n_s, normals=nms)
        b_s = RayBundle.create(pos=vs, dir=ds,
                               energy=np.full(n_s, P_unit * self.a_s / n_s))
        parts = [b_s]
        for n_c, r, frac, k_i in ((n_c1, self.r_s, self.b_c1, 2),
                                  (n_c2, self.r_c2, self.g_c2, 4)):
            vc, nc = cylinder_sampling(ks[k_i], r, self.l_c, n_c)
            dc = lambertian_directions_sampling(ks[k_i + 1], n_c, normals=nc)
            parts.append(RayBundle.create(
                pos=vc, dir=dc, energy=np.full(n_c, P_unit * frac / n_c)))
        bund = concatenate_rays(parts)
        pos = rotate_z_to_normal(np.asarray(bund.pos), self.dir) + self.loc
        dirs = rotate_z_to_normal(np.asarray(bund.dir), self.dir)
        return bund.replace(pos=jnp.asarray(pos), dir=jnp.asarray(dirs))


_LAMPS = {"Bader": SimulatorLampBader, "Zhu": SimulatorLampZhu}


class SolarSimulatorModule(Assembly):
    """One reflector + lamp module (ref SolarSimulatorModule :139)."""

    def __init__(self, a, b, c, zlim, reflectivity=0.9, slope_error=2.5e-3,
                 bi_var=False, lampdict=None,
                 first_focus_location=(0, 0, 0), aiming_vector=(0, 0, 1)):
        self.location = np.asarray(first_focus_location, dtype=float)
        self.aiming_vector = np.asarray(aiming_vector, dtype=float)
        self.rotation = rotation_to_z(self.aiming_vector)
        self.reflector = SimulatorReflector(a, b, c, zlim, self.location,
                                            self.rotation, reflectivity,
                                            slope_error, bi_var)
        Assembly.__init__(self, objects=[self.reflector])
        lampdict = dict(lampdict or {"model": "Bader"})
        model = lampdict.pop("model")
        self.lamp = _LAMPS[model](**lampdict)

    def fire_lamp(self, key, nrays, part_load=1.0) -> RayBundle:
        source = self.lamp.generate_rays(key, nrays, part_load=part_load)
        import jax.numpy as jnp
        pos = rotate_z_to_normal(np.asarray(source.pos),
                                 self.aiming_vector) + self.location
        dirs = rotate_z_to_normal(np.asarray(source.dir), self.aiming_vector)
        return source.replace(pos=jnp.asarray(pos), dir=jnp.asarray(dirs))


class SolarSimulator(Assembly):
    """Multi-module simulator with flux-mapped targets
    (ref SolarSimulator :56)."""

    def __init__(self, modules_positions, modules_directions, modules_dicts,
                 targets: Sequence[Target], homogenizer=None):
        self.modules = [
            SolarSimulatorModule(**modules_dicts[i],
                                 first_focus_location=modules_positions[i],
                                 aiming_vector=modules_directions[i])
            for i in range(len(modules_positions))]
        self.targets = list(targets)
        objects = list(targets)
        subasm = list(self.modules)
        if homogenizer is not None:
            subasm.append(homogenizer)
        Assembly.__init__(self, subassemblies=subasm, objects=objects)

    def simulate(self, nrays, part_load=1.0, ray_batch=10_000,
                 save_dir: Optional[str] = None, key=None, reps=20):
        """Batched trace; per-batch fluxmap updates give Welford CIs.
        Optionally saves fluxmap_%i.csv / confidence_intervals_%i.csv
        (ref simulate :77-138)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        engine = TracerEngine(self)
        ray_batch = int(min(ray_batch, nrays))
        for i in range(int(nrays / ray_batch)):
            key, *mk = jax.random.split(key, len(self.modules) + 2)
            sources = [m.fire_lamp(mk[j], ray_batch, part_load=part_load)
                       for j, m in enumerate(self.modules)]
            source = concatenate_rays(sources)
            res = engine.ray_tracer(source, reps=reps, key=mk[-1])
            for t in self.targets:
                t.evaluate_fluxmap(res)
        if save_dir is not None:
            os.makedirs(save_dir, exist_ok=True)
            for j, t in enumerate(self.targets):
                self._save_map(os.path.join(save_dir, f"fluxmap_{j}.csv"),
                               t, np.asarray(t.fluxmap.mean))
                self._save_map(
                    os.path.join(save_dir, f"confidence_intervals_{j}.csv"),
                    t, np.asarray(t.fluxmap.ci))
        return self.targets

    @staticmethod
    def _save_map(path, target, arr):
        with open(path, "w") as fo:
            fo.write("bins_x," + ",".join(str(e) for e in target.binx) + "\n")
            fo.write("bins_y," + ",".join(str(e) for e in target.biny) + "\n")
            for row in np.atleast_2d(arr):
                fo.write(",".join(str(v) for v in row) + "\n")

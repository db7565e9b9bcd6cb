"""Measure the REFERENCE (pure-NumPy Tracer at /root/reference) on the
BASELINE configurations it can still run under Python 3 — the
correctness/throughput anchor BASELINE.md asks for ("first action when
benchmarking begins: measure the NumPy reference itself on configs 1 and
4"). The reference publishes no numbers of its own (SURVEY §6).

``python -m benchmarks.reference_numpy`` prints one JSON line per config:
the reference's rays/s on this host's CPU plus its receiver physics, so
the TPU rebuild's numbers in BENCHMARKS.md have a measured baseline and a
cross-engine physics check (see also tests/test_reference_crossval.py).

The reference's polygon sampling imports shapely (not installed); a stub
satisfies the import — neither scenario touches polygons.
"""
from __future__ import annotations

import json
import sys
import time
import types

import numpy as N


def _setup_reference(path="/root/reference"):
    if "shapely" not in sys.modules:
        stub = types.ModuleType("shapely")
        stub.Polygon = object
        stub.constrained_delaunay_triangles = None
        sys.modules["shapely"] = stub
    # Py2 shim: sphere_surface.CutSphereGM._select_coords still uses
    # xrange (reference sphere_surface.py:198); the module is otherwise
    # Python-3 clean, so a builtins alias unlocks it for cross-validation
    import builtins
    if not hasattr(builtins, "xrange"):
        builtins.xrange = range
    if path not in sys.path:
        sys.path.insert(0, path)


def build_ref_minidish(n_rays: int, seed: int):
    """Reference-engine MiniDish scene + source (examples/test_case.py
    geometry) — shared by config1 below and
    tests/test_reference_crossval.py so both always trace the SAME
    scenario. Returns (asm, sun_bundle)."""
    _setup_reference()
    from tracer.models.tau_minidish import MiniDish
    from tracer.sources import disk_bundle
    from tracer.spatial_geometry import rotx

    asm = MiniDish(5.0, 6.25, 0.9, 6.95, 0.4, 0.7, 0.9)
    asm.set_transform(rotx(-N.pi / 4))
    N.random.seed(seed)
    sun = disk_bundle(n_rays, N.c_[[0.0, 7.0, 7.0]],
                      N.array([0.0, -2**-0.5, -2**-0.5]), 3.0, 0.005,
                      flux=1000.0)
    return asm, sun


def build_ref_nsttf(pos, tower_height: float = 60.0, focal_lengths=None):
    """Reference-engine NSTTF field + one-sided receiver — the single
    source of truth for the reference-side field geometry (benchmark
    config4 below AND the flat/curved cross-validation tests import
    it, so a geometry tweak cannot diverge between them). Returns
    (asm, rec, center, extent)."""
    _setup_reference()
    from tracer.models.heliostat_field import HeliostatField
    from tracer.models.one_sided_mirror import one_sided_receiver
    from tracer.assembly import Assembly
    from tracer.spatial_geometry import rotation_to_z, translate

    center = pos.mean(axis=0)
    kw = {}
    if focal_lengths is not None:
        kw["focal_lengths"] = focal_lengths
    field = HeliostatField(pos, 6.1, 6.1, absorptivity=0.1, sigma=1.5e-3,
                           bi_var=True, MCRT_option="fast", **kw)
    field.track_sun(0.0, N.pi / 6,
                    aim_points=N.tile([0.0, 0.0, tower_height],
                                      (len(pos), 1)))
    rec = one_sided_receiver(11.0, 11.0)
    aim_dir = N.array([center[0], center[1], -tower_height * 0.75])
    aim_dir /= N.linalg.norm(aim_dir)
    rec.set_transform(translate(0, 0, tower_height)
                      @ _homog(rotation_to_z(aim_dir)))
    # the field's heliostat positions live in NESTED assemblies — keep it
    # as a subassembly (flattening get_objects() would strip them)
    asm = Assembly(objects=[rec], subassemblies=[field])
    extent = float(N.max(N.hypot(*(pos[:, :2]
                                   - center[:2][None, :]).T))) + 10.0
    return asm, rec, center, extent


def ref_nsttf_source(n_rays: int, center, sun_vec, extent, seed: int):
    """The Buie source matching build_ref_nsttf's field."""
    _setup_reference()
    from tracer.sources import buie_sunshape
    N.random.seed(seed)
    return buie_sunshape(n_rays, N.c_[center + sun_vec * 300.0], -sun_vec,
                         extent, CSR=0.02, flux=1000.0)


def config1_minidish(n_rays: int = 100_000) -> dict:
    """Reference engine on the examples/test_case.py MiniDish scenario."""
    asm, sun = build_ref_minidish(n_rays, seed=0)
    from tracer.tracer_engine import TracerEngine

    src_e = float(sun.get_energy().sum())
    eng = TracerEngine(asm)
    t0 = time.perf_counter()
    eng.ray_tracer(sun, 100, 1e-6)
    dt = time.perf_counter() - t0
    H, _, _ = asm.histogram_hits(bins=20)
    return dict(metric="reference_minidish_throughput",
                value=round(n_rays / dt / 1e6, 4), unit="Mrays/s",
                n_rays=n_rays, wall_s=round(dt, 2),
                receiver_frac=round(float(H.sum()) / src_e, 4))


def config4_nsttf(n_rays: int = 100_000) -> dict:
    """Reference engine on the NSTTF field (the same 218 real pad
    coordinates, tracking geometry and Buie source as benchmarks/nsttf.py;
    no accel — the reference Kd-traversal is a per-ray Python loop and is
    slower than brute force at this scene size)."""
    _setup_reference()
    sys.path.insert(0, ".")
    from benchmarks.nsttf import nsttf_positions, solar_vector
    from tracer.tracer_engine import TracerEngine

    pos = nsttf_positions(218)
    asm, rec, center, extent = build_ref_nsttf(pos)
    sun_vec = solar_vector(0.0, N.pi / 6)
    sun = ref_nsttf_source(n_rays, center, sun_vec, extent, seed=1)
    src_e = float(sun.get_energy().sum())
    eng = TracerEngine(asm)
    t0 = time.perf_counter()
    eng.ray_tracer(sun, 8, 1e-6)
    dt = time.perf_counter() - t0
    hits = rec.get_surfaces()[0]._opt.get_all_hits()
    rec_e = float(hits[0].sum())   # absorbed energy per hit
    return dict(metric="reference_nsttf_throughput",
                value=round(n_rays / dt / 1e6, 4), unit="Mrays/s",
                n_rays=n_rays, wall_s=round(dt, 2),
                receiver_frac=round(rec_e / src_e, 4))


def _homog(rot3):
    out = N.eye(4)
    out[:3, :3] = rot3
    return out


if __name__ == "__main__":
    for fn in (config1_minidish, config4_nsttf):
        print(json.dumps(fn()))

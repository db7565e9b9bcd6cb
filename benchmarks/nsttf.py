"""NSTTF-style heliostat-field benchmark scene.

The reference's headline workload (`examples/Sandia_NSTTF_field example.py`):
218 heliostats of 6.1 m aimed at a tower receiver, traced under a Buie
sunshape. The real as-built Sandia pad coordinates are bundled
(models/data/sandia_hstat_coordinates.csv, loaded by
``heliostat_field.load_heliostat_positions``); scaling studies beyond 218
heliostats extend a radial-stagger north field of matching density.
"""
from __future__ import annotations

import math

import jax
import numpy as np

from tracer_tpu import spatial as sp
from tracer_tpu.models.heliostat_field import (HeliostatField, radial_stagger,
                                               solar_vector)
from tracer_tpu.models.one_sided_mirror import one_sided_receiver
from tracer_tpu.scene import Assembly, compile_scene
from tracer_tpu.sources import buie_sunshape


def nsttf_positions(n: int = 218) -> np.ndarray:
    """Heliostat positions for the benchmark field. Up to 218 heliostats,
    the REAL as-built NSTTF pad coordinates are used
    (models.heliostat_field.load_heliostat_positions); larger scaling
    studies extend a radial-stagger north field of matching density."""
    from tracer_tpu.models.heliostat_field import load_heliostat_positions
    if n <= 218:
        return load_heliostat_positions()[:n]
    rmax = 240.0
    while True:
        pos = radial_stagger(np.pi / 2 - 0.9, np.pi / 2 + 0.9,
                             az_space=0.115, rmin=60.0, rmax=rmax,
                             r_space=12.2)
        if len(pos) >= n:
            break
        rmax *= 1.5
    pos = pos[np.argsort(np.hypot(pos[:, 0], pos[:, 1]))][:n]
    return np.concatenate([pos, np.zeros((len(pos), 1))], axis=1)


def build_scene(n_heliostats: int = 218, sigma: float = 1.5e-3,
                tower_height: float = 60.0, azimuth: float = 0.0,
                zenith: float = np.pi / 6, dtype=None):
    """Returns (table, meta, field_info) for the tracked field + receiver."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float32

    positions = nsttf_positions(n_heliostats)
    field = HeliostatField(positions, width=6.1, height=6.1,
                           absorptivity=0.1, sigma=sigma, bi_var=True)
    field.set_aim_height(tower_height)
    field.track_sun(azimuth=azimuth, zenith=zenith)

    # 11x11 m receiver aperture on the tower, tilted toward the field center
    _, rec = one_sided_receiver(11.0, 11.0)
    center = positions.mean(axis=0)
    aim_dir = np.array([center[0], center[1], -tower_height * 0.75])
    aim_dir /= np.linalg.norm(aim_dir)
    rec.set_transform(sp.translate(0, 0, tower_height)
                      @ sp._homog(sp.rotation_to_z(aim_dir)))

    asm = Assembly(objects=[rec], subassemblies=[field])
    table, meta = compile_scene(asm, dtype=dtype)
    info = dict(positions=positions, sun=solar_vector(azimuth, zenith),
                field_center=center, tower_height=tower_height)
    return table, meta, info


def make_source_fn(info, slab: int, csr: float = 0.02, dni: float = 1000.0):
    """Buie-sunshape disk source covering the whole field, shining along
    -sun_vec (like the reference example's gen_rays)."""
    positions = info["positions"]
    sun = info["sun"]
    center_xy = positions.mean(axis=0)
    extent = np.max(np.hypot(*(positions[:, :2] - center_xy[:2]).T)) + 10.0
    src_center = center_xy + sun * 300.0

    def source_fn(key):
        return buie_sunshape(key, slab, center=src_center, direction=-sun,
                             radius=extent, CSR=csr, flux=dni)

    # static spec so trace_streaming can regenerate in-kernel
    from tracer_tpu.sources import buie_sunshape_pallas_spec
    source_fn.pallas_spec = buie_sunshape_pallas_spec(
        slab, src_center, -sun, extent, csr, dni)
    return source_fn


def make_rect_source_fn(info, slab: int, csr: float = 0.02,
                        dni: float = 1000.0, z0: float = 300.0):
    """Oblique rect Buie source: a horizontal w x h rectangle above the
    field shining along -sun — the reference's standard field source
    (oblique_solar_rect_bundle sources.py:268 / rect_buie_sunshape :466).
    Rect-source scenes get the culled megakernel too (culling.rect_cells)."""
    from tracer_tpu.sources import (rect_buie_sunshape,
                                    rect_buie_sunshape_pallas_spec)
    positions = info["positions"]
    sun = info["sun"]
    center_xy = positions[:, :2].mean(axis=0)
    half = (positions[:, :2].max(axis=0)
            - positions[:, :2].min(axis=0)) / 2.0 + 12.0
    w, h = 2.0 * float(half[0]), 2.0 * float(half[1])
    src_center = (np.array([center_xy[0], center_xy[1], 0.0])
                  + sun * (z0 / sun[2]))
    down = np.array([0.0, 0.0, -1.0])

    def source_fn(key):
        return rect_buie_sunshape(key, slab, center=src_center,
                                  direction=down, width=w, height=h,
                                  CSR=csr, flux=dni, rays_direction=-sun)

    source_fn.pallas_spec = rect_buie_sunshape_pallas_spec(
        slab, src_center, down, w, h, csr, dni, rays_direction=-sun)
    return source_fn

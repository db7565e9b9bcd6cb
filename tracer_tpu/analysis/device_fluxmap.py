"""Device-side flux-map accumulation for the fast trace paths.

The reference streams 10M+-ray receiver flux maps by harvesting accountant
hit lists on the host (`examples/Sandia_NSTTF_field example.py:218-227`,
tracer/models/solar_simulator.py:90-138). The rebuild's fused/streaming
megakernels never materialize per-hit records, so the spatial histogram is
accumulated ON DEVICE instead: each bounce, every hit lane's absorbed
energy scatters into a per-surface (nu, nv) histogram over the surface's
natural binning (analysis/fluxmap.edges_of — uniform by construction, so
binning is one floor() per axis).

The scatter is two one-hot bf16 matmuls (hist += U^T V with U the u-bin
one-hot weighted by absorbed energy and V the v-bin one-hot): XLA fuses
one-hot generation into the MXU pass, whereas a real TPU scatter of a
multi-M-lane slab costs ~9 ms/round. Per-ray absorbed values are
STOCHASTICALLY rounded onto the bf16 grid (stochastic_round_bf16) and
accumulated in f32: round-to-nearest would shift identical-valued samples
(constant absorptivity x constant e_ray) by the same <=2^-9 relative
error — a systematic per-bin bias — while stochastic rounding converges
to the f32 total with ~2^-9/sqrt(N) relative error, far below MC noise
per bin (tests/test_flux_oracle.py holds the 3-sigma criterion on
hardware).

Usage::

    spec = flux_plan(meta, "receiver", resolution=50)
    accum, emitted, src_e = trace_streaming(..., fluxspecs=(spec,))
    flux, (ue, ve) = finalize(spec, accum.flux[0], meta)

Specs are static (hashable) so the jitted drivers specialize on them; the
histograms live in TraceAccum.flux and psum-merge over a mesh like every
other accumulator (parallel.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..mathutils import transform_points
from .fluxmap import (_AXIAL, _CARTESIAN, _POLAR, _SPHERICAL, areas_of,
                      edges_of)


class FluxSpec(NamedTuple):
    """Static description of one device flux histogram.

    rows  - scene-table row ids of the logical surface (hits on any of
            them bin into the shared histogram, each through its own row
            frame — same semantics as the host surface_fluxmap over
            per-row local records)
    kind  - geometry kind (selects the (u, v) projection)
    nu/nv - bin counts; u0/u1/v0/v1 - uniform bin ranges
    p0    - extra projection parameter (sphere radius for the z->theta
            map); unused otherwise
    resolution - the edges_of resolution that produced the ranges (kept
            so finalize() can rebuild edges/areas without re-deriving)
    """

    rows: tuple
    kind: str
    nu: int
    nv: int
    u0: float
    u1: float
    v0: float
    v1: float
    p0: float
    resolution: int


def flux_plan(meta, surface, resolution: int = 40) -> FluxSpec:
    """Build the static FluxSpec for a logical surface of a compiled
    scene. ``surface`` is a name or logical index (SceneMeta)."""
    sidx = meta.index_of(surface) if isinstance(surface, str) else surface
    geom = meta.surfaces[sidx].geometries[0]
    rows = tuple(int(r) for r in np.nonzero(meta.row_logical == sidx)[0])
    if not rows:
        raise ValueError(f"surface {surface} has no scene rows")
    ue, ve = edges_of(geom.kind, geom.extent, resolution)
    p0 = float(geom.extent["R"]) if geom.kind in _SPHERICAL else 0.0
    return FluxSpec(rows=rows, kind=geom.kind,
                    nu=len(ue) - 1, nv=len(ve) - 1,
                    u0=float(ue[0]), u1=float(ue[-1]),
                    v0=float(ve[0]), v1=float(ve[-1]),
                    p0=p0, resolution=resolution)


def zeros_for(fluxspecs, dtype=jnp.float32) -> tuple:
    """Fresh (nu, nv) histograms for a tuple of specs."""
    return tuple(jnp.zeros((s.nu, s.nv), dtype=dtype) for s in fluxspecs)


def _uv(spec: FluxSpec, local):
    """jnp twin of fluxmap.uv_project for one spec (local (n, 3))."""
    x, y, z = local[:, 0], local[:, 1], local[:, 2]
    if spec.kind in _CARTESIAN:
        return x, y
    two_pi = 2.0 * np.pi

    def wrap(a):
        return jnp.where(a < 0.0, a + two_pi, a)

    if spec.kind in _POLAR:
        return jnp.hypot(x, y), wrap(jnp.arctan2(y, x))
    if spec.kind in _AXIAL:
        return z, wrap(jnp.arctan2(y, x))
    if spec.kind in _SPHERICAL:
        ct = jnp.clip(z / jnp.asarray(spec.p0, dtype=z.dtype), -1.0, 1.0)
        return jnp.arccos(ct), wrap(jnp.arctan2(y, x))
    raise NotImplementedError(f"no device fluxmap for kind {spec.kind}")


def stochastic_round_bf16(x, key):
    """Unbiased rounding of f32 values onto the bf16 grid (bf16 = the top
    16 bits of f32): add uniform bits over the low mantissa, truncate.
    One elementwise VPU pass; makes bf16-matmul accumulations converge to
    the f32 total instead of carrying the round-to-nearest bias of
    repeated identical values."""
    import jax
    import jax.random as jrandom
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    dither = (jrandom.bits(key, x.shape, dtype=jnp.uint32)
              & jnp.uint32(0xFFFF))
    return jax.lax.bitcast_convert_type(
        (bits + dither) & jnp.uint32(0xFFFF0000), jnp.float32)


def accumulate(flux: tuple, fluxspecs: tuple, scene, sid, hit_pts,
               absorbed, key=None) -> tuple:
    """One bounce's histogram update (pure jnp; called inside the jitted
    trace drivers). sid (n,) winning row or -1; hit_pts (n, 3) global hit
    points (garbage on non-hit lanes — masked by sid); absorbed (n,).
    With ``key``, absorbed values are stochastically rounded onto the
    bf16 grid (unbiased); without, round-to-nearest (legacy)."""
    if not fluxspecs:
        return flux
    if key is not None:
        import jax.random as jrandom
        absorbed = stochastic_round_bf16(
            absorbed, jrandom.fold_in(key, 0x51ab))
    out = []
    for spec, hist in zip(fluxspecs, flux):
        dt = hist.dtype
        if len(spec.rows) == 1:
            r = spec.rows[0]
            inv = scene.inv_frame[r]
            on_spec = sid == r
        else:
            # one pass for ALL rows of the surface: gather each lane's
            # matching row frame by sid (a lane matches at most one row),
            # instead of a full-slab transform + matmul pair per row
            rows_arr = jnp.asarray(spec.rows)
            eq = sid[:, None] == rows_arr[None, :]
            on_spec = jnp.any(eq, axis=1)
            lane_k = jnp.argmax(eq, axis=1)
            inv = jnp.stack([scene.inv_frame[r]
                             for r in spec.rows])[lane_k]
        # elementwise rotate (mathutils.transform_points): a (n,3)@(3,3)
        # einsum would route through the bf16-rounded MXU and corrupt
        # meter-scale positions
        local = transform_points(inv, hit_pts)
        u, v = _uv(spec, local)
        su = (u - spec.u0) * (spec.nu / (spec.u1 - spec.u0))
        sv = (v - spec.v0) * (spec.nv / (spec.v1 - spec.v0))
        su = jnp.where(jnp.isfinite(su), su, -1.0)
        sv = jnp.where(jnp.isfinite(sv), sv, -1.0)
        iu = jnp.floor(jnp.clip(su, -1.0, spec.nu)).astype(jnp.int32)
        iv = jnp.floor(jnp.clip(sv, -1.0, spec.nv)).astype(jnp.int32)
        # top-edge inclusivity (matches np.histogram2d): a hit exactly
        # on the last edge belongs to the last bin
        iu = jnp.where((iu == spec.nu) & (su <= spec.nu), spec.nu - 1, iu)
        iv = jnp.where((iv == spec.nv) & (sv <= spec.nv), spec.nv - 1, iv)
        valid = (on_spec & (iu >= 0) & (iu < spec.nu)
                 & (iv >= 0) & (iv < spec.nv))
        w = jnp.where(valid, absorbed, 0.0).astype(jnp.bfloat16)
        U = (iu[:, None] == jnp.arange(spec.nu)[None, :]
             ).astype(jnp.bfloat16) * w[:, None]
        V = (iv[:, None] == jnp.arange(spec.nv)[None, :]
             ).astype(jnp.bfloat16)
        hist = hist + jnp.matmul(
            U.T, V, preferred_element_type=jnp.float32).astype(dt)
        out.append(hist)
    return tuple(out)


def finalize(spec: FluxSpec, hist, meta):
    """Turn an accumulated (nu, nv) energy histogram into a flux map
    (W/m^2) on the surface's natural mesh. Returns (flux, (ue, ve))."""
    sidx = meta.row_logical[spec.rows[0]]
    geom = meta.surfaces[int(sidx)].geometries[0]
    ue, ve = edges_of(geom.kind, geom.extent, spec.resolution)
    areas = areas_of(geom.kind, geom.extent, spec.resolution)
    H = np.asarray(hist, dtype=float)
    with np.errstate(divide="ignore", invalid="ignore"):
        flux = np.where(areas > 0, H / np.maximum(areas, 1e-300), 0.0)
    return flux, (ue, ve)

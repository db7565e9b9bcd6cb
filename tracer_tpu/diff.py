"""Differentiable tracing — reverse-mode gradients through the trace.

This is a capability the reference (pure-NumPy, host-stepped) cannot
offer and a direct payoff of the functional JAX design: the compiled
scene is a pytree of arrays (SceneTable), the bounce step is pure jnp,
and a fixed-bounce-count ``lax.scan`` makes the whole trace one
reverse-differentiable function of (scene, bundle). Uses:

  - heliostat aim optimization (focus/center the receiver spot),
  - optical design (lens curvature / refractive index vs spot size),
  - slope-error or alignment calibration against a measured flux map.

What the pathwise (fixed-PRNG, reparameterized) gradient does and does
not see
------------------------------------------------------------------------
With the PRNG key held fixed, every sampled decision (Russian-roulette
branches, Lambertian/slope-error draws, free paths) is a deterministic
function of the uniforms, so the trace is piecewise-smooth in the scene
parameters and ``jax.grad`` returns the exact derivative of that
realization — the standard reparameterization estimator. Its gradient
captures everything that moves CONTINUOUSLY with the parameters: hit
positions, path lengths, Fresnel/Snell splits, absorbed fractions,
Beer-Lambert factors. It does NOT capture boundary terms — a ray
discretely switching which surface (or which aperture side) it hits
contributes a jump the pathwise estimator ignores. Objectives built
from hit-position MOMENTS (spot radius, centroid offset — see
``spot_rms``) are dominated by the continuous term and optimize well;
pure interception/counting objectives (energy ON a plate with constant
absorptivity) are piecewise constant along rays and need a smooth
surrogate (e.g. minimize the spot's second moment about the aperture
center instead of maximizing the captured fraction).

The trace runs the pure-jnp engine path (``force_jnp=True``): the
Pallas megakernels have no VJP rules. On TPU this is still one fused
XLA program — slower than the megakernel but batched and compiled; use
float64 on CPU for gradient checks and float32 on device for
optimization loops.

No reference anchor: the reference has no gradient capability (its
engine mutates NumPy state per surface, tracer_engine.py:124-295).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from .bundle import RayBundle
from .engine import TraceAccum, _bounce_step
from .scene import SceneTable


@struct.dataclass
class MomentAccum:
    """Per-row energy-weighted moments of the LOCAL hit coordinates.

    e_in      (S,)   incident energy
    absorbed  (S,)   absorbed energy (the moment weight)
    m1        (S,3)  sum of absorbed * local
    m2        (S,3)  sum of absorbed * local**2

    Local (surface-frame) coordinates make the moments meaningful flux-
    map statistics: the energy-weighted centroid of row r is m1[r] /
    absorbed[r] and the mean squared spot radius about a point c is
    (m2 - 2 c m1 + c^2 absorbed) / absorbed, both differentiable.

    CAUTION for optimization: these are CONDITIONAL statistics over the
    rays that land on the row. If an update pushes the whole spot off
    the surface, the captured power goes to zero and spot_rms
    degenerates to 0/eps = 0 — a spurious minimum the pathwise gradient
    will not climb out of (the boundary term is invisible to it). Keep
    steps bounded (Adam), start inside the capture basin, or add an
    explicit capture penalty on ``absorbed``.
    """

    e_in: jnp.ndarray
    absorbed: jnp.ndarray
    m1: jnp.ndarray
    m2: jnp.ndarray

    @classmethod
    def zeros(cls, n_rows: int, dtype=jnp.float32) -> "MomentAccum":
        return cls(e_in=jnp.zeros((n_rows,), dtype),
                   absorbed=jnp.zeros((n_rows,), dtype),
                   m1=jnp.zeros((n_rows, 3), dtype),
                   m2=jnp.zeros((n_rows, 3), dtype))


class DiffFluxSpec(NamedTuple):
    """A differentiable flux map: absorbed energy soft-binned (bilinear
    splat) over the local (x, y) coordinates of hits on ``rows``.

    Unlike the hard-binned device flux maps (analysis.device_fluxmap),
    the bilinear splat is piecewise-LINEAR in the hit position, so the
    map has well-defined gradients w.r.t. scene parameters — the basis
    for flux-map-fitting inverse problems (aim/slope calibration against
    a measured map). Bin values converge to the hard histogram as the
    spot moves well inside a bin. Hits outside [xlim] x [ylim] are
    dropped (their gradient contribution too — keep the map generous).

    rows   tuple of table row ids (static)
    xlim   (xmin, xmax) in surface-local coordinates
    ylim   (ymin, ymax)
    shape  (nu, nv) bins
    """

    rows: tuple
    xlim: tuple
    ylim: tuple
    shape: tuple


def _splat(grid, spec: DiffFluxSpec, sid, local, w):
    """Bilinear-splat w at local (x, y) into grid for sid in spec.rows.

    Scatter-free: the bilinear corner weights of a point are exactly the
    triangular hat functions max(0, 1 - |g - u|) evaluated at the integer
    bin centers, so the whole splat is one (nu, N) @ (N, nv) matmul of
    hat-weight matrices — a TPU scatter-add of N rays costs ~ms each
    (and this ran 4 of them per bounce, plus their gather VJPs in the
    backward pass), while the MXU matmul's VJP is just another matmul.
    Identical values to the 4-corner scatter formulation, including the
    partial splats at the grid edge (an out-of-range corner simply has
    no in-range bin center under its hat)."""
    nu, nv = spec.shape
    on = jnp.zeros_like(sid, dtype=bool)
    for r in spec.rows:
        on = on | (sid == r)
    x, y = local[:, 0], local[:, 1]
    gx = (x - spec.xlim[0]) / (spec.xlim[1] - spec.xlim[0]) * nu - 0.5
    gy = (y - spec.ylim[0]) / (spec.ylim[1] - spec.ylim[0]) * nv - 0.5
    dt = grid.dtype
    wu = jnp.maximum(0.0, 1.0 - jnp.abs(
        gx[:, None] - jnp.arange(nu, dtype=dt)[None, :]))     # (N, nu)
    wv = jnp.maximum(0.0, 1.0 - jnp.abs(
        gy[:, None] - jnp.arange(nv, dtype=dt)[None, :]))     # (N, nv)
    wm = jnp.where(on, w, 0.0).astype(dt)
    return grid + jax.lax.dot((wu * wm[:, None]).T, wv,
                              precision=jax.lax.Precision.HIGHEST)


def _row_sums(payload, sid, n_rows: int):
    """Exact per-row sums of payload (N, K) grouped by sid — scatter-free.

    sid < 0 (miss) rows contribute nothing. Small scenes: one masked
    reduction per row (XLA fuses the chain into elementwise passes).
    Large scenes: an f32 one-hot matmul at HIGHEST precision (exact —
    the one-hot side is 0/1 and f32 payload survives the bf16x3
    decomposition exactly... the sums themselves round as any f32 sum
    would). The integer sid carries no gradient either way, matching
    the scatter-add semantics this replaces."""
    if n_rows <= 64:
        return jnp.stack([
            jnp.sum(jnp.where((sid == r)[:, None], payload, 0.0), axis=0)
            for r in range(n_rows)])
    onehot = (sid[None, :] == jnp.arange(n_rows)[:, None]
              ).astype(payload.dtype)
    return jax.lax.dot(onehot, payload,
                       precision=jax.lax.Precision.HIGHEST)


def trace_diff(scene: SceneTable, bundle: RayBundle, key: jax.Array,
               bounces: int, disc_eps: float = 1e-6, t_eps=None,
               fluxspecs: tuple = (), checkpoint: bool = False):
    """Fixed-bounce-count differentiable trace.

    Scans ``bounces`` bounce steps of the general engine path (pinned to
    pure jnp) with ``min_energy=0`` (the energy cull is a discontinuity,
    so the diff path never culls — dead rays just carry zero energy) and
    folds every bounce's hits into per-row accumulators on the fly, so
    nothing per-bounce is kept alive across the scan.

    Returns ``(accum, moments)`` — a TraceAccum (absorbed / escaped /
    medium / residual energies; residual here is whatever the final
    bundle still carries) and a MomentAccum. With ``fluxspecs`` (a tuple
    of DiffFluxSpec), returns ``(accum, moments, grids)`` where grids[i]
    is spec i's soft-binned (nu, nv) flux map. All are differentiable
    functions of every float leaf of ``scene`` and ``bundle``; compose a
    scalar loss from them and take ``jax.grad`` over a wrapper that
    builds the perturbed scene (see ``with_rows`` and ``frame_to``).

    Memory: reverse mode keeps each bounce's residuals; for long traces
    pass ``checkpoint=True`` (rematerializes each bounce in the backward
    pass — O(1) residual memory for O(2x) forward FLOPs) or split the
    bounce budget across calls.
    """
    dtype = bundle.pos.dtype
    accum = TraceAccum.zeros(scene.num_rows, dtype=dtype)
    mom = MomentAccum.zeros(scene.num_rows, dtype=dtype)
    grids = tuple(jnp.zeros(s.shape, dtype) for s in fluxspecs)
    # inherit the bundle's device-variance manifest: under shard_map the
    # scan carry must start as 'varying' over the ray axis like the data
    # it accumulates, and adding this zero is the axis-name-agnostic way
    vary0 = jnp.zeros((), dtype) * jnp.sum(bundle.energy)
    accum, mom, grids = jax.tree_util.tree_map(
        lambda x: x + vary0.astype(x.dtype), (accum, mom, grids))

    n_rows = scene.num_rows

    def body(carry, k):
        bund, acc, mo, gr = carry
        bund, acc, rec = _bounce_step(
            scene, bund, acc, k, min_energy=0.0, t_eps=t_eps,
            disc_eps=disc_eps, block=64, count_hits=False,
            need_local=True, split_mode=False, force_jnp=True)
        hit = rec.alive_in & (rec.sid >= 0)
        w = jnp.where(hit, rec.absorbed, 0.0)
        # scatter-free per-row accumulation: a .at[sid].add of N rays
        # costs ~ms on TPU (and its VJP is an equally slow gather); the
        # masked reductions / one-hot matmul below are exact and ~30x
        # cheaper both ways (same rationale as engine._account)
        payload = jnp.concatenate(
            [jnp.where(hit, rec.e_in, 0.0)[:, None], w[:, None],
             w[:, None] * rec.local, w[:, None] * rec.local ** 2], axis=1)
        rows = _row_sums(payload, rec.sid, n_rows)
        mo = mo.replace(e_in=mo.e_in + rows[:, 0],
                        absorbed=mo.absorbed + rows[:, 1],
                        m1=mo.m1 + rows[:, 2:5],
                        m2=mo.m2 + rows[:, 5:8])
        gr = tuple(_splat(g, sp, rec.sid, rec.local, w)
                   for g, sp in zip(gr, fluxspecs))
        return (bund, acc, mo, gr), None

    if checkpoint:
        body = jax.checkpoint(body)
    keys = jax.random.split(key, bounces)
    (bundle, accum, mom, grids), _ = jax.lax.scan(
        body, (bundle, accum, mom, grids), keys)
    accum = accum.replace(residual=accum.residual
                          + jnp.sum(jnp.where(bundle.alive,
                                              bundle.energy, 0.0)))
    if fluxspecs:
        return accum, mom, grids
    return accum, mom


# ---- differentiable scene editing ---------------------------------------

def rigid_inverse(frame: jnp.ndarray) -> jnp.ndarray:
    """Inverse of rigid homogeneous transform(s) (..., 4, 4): [R|t] ->
    [R^T | -R^T t], differentiable (no linear solve)."""
    R = frame[..., :3, :3]
    t = frame[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], frame.dtype),
        frame.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def with_rows(scene: SceneTable, rows, frame=None, quadric=None,
              opt_params=None) -> SceneTable:
    """Functionally replace per-row scene parameters — the bridge from a
    design parameter to the traced SceneTable. ``rows`` is an int array
    (or list) of table row ids; each given value must broadcast to the
    rows' slice shape. Frames must be rigid (inverses are built with
    ``rigid_inverse``; a scaled/sheared frame needs a real inverse and a
    re-derived normal transform — compile the scene with it instead)."""
    rows = jnp.asarray(rows)
    out = scene
    if frame is not None:
        frame = jnp.asarray(frame, scene.frame.dtype)
        out = out.replace(frame=out.frame.at[rows].set(frame),
                          inv_frame=out.inv_frame.at[rows].set(
                              rigid_inverse(frame)))
    if quadric is not None:
        out = out.replace(quadric=out.quadric.at[rows].set(
            jnp.asarray(quadric, scene.quadric.dtype)))
    if opt_params is not None:
        out = out.replace(opt_params=out.opt_params.at[rows].set(
            jnp.asarray(opt_params, scene.opt_params.dtype)))
    return out


def frame_to(normal, location, dtype=jnp.float64) -> jnp.ndarray:
    """Rigid local->global 4x4 whose local +Z is ``normal`` (need not be
    unit), placed at ``location`` — the differentiable frame builder
    (mathutils.rotation_to_z underneath: same new-X-in-old-XY convention
    as spatial.rotation_to_z, so a frame built here matches what
    compile_scene baked for the same pose, and normal == +-Z falls back
    to the X-axis frame instead of NaN)."""
    from .mathutils import normalize as _unit, rotation_to_z
    n = _unit(jnp.asarray(normal, dtype))
    R = rotation_to_z(n)
    loc = jnp.asarray(location, dtype)
    top = jnp.concatenate([R, loc[:, None]], axis=1)
    return jnp.concatenate(
        [top, jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype)], axis=0)


# ---- loss helpers --------------------------------------------------------

def spot_rms(mom: MomentAccum, rows, center=(0.0, 0.0)) -> jnp.ndarray:
    """Energy-weighted mean squared distance of the local (x, y) hit
    coordinates from ``center``, over the table rows ``rows`` — the
    differentiable spot-size/aiming loss. E[|r - c|^2] expands into the
    accumulated moments, so no per-ray data is needed."""
    rows = jnp.asarray(rows)
    p = jnp.sum(mom.absorbed[rows])
    m1 = jnp.sum(mom.m1[rows], axis=0)
    m2 = jnp.sum(mom.m2[rows], axis=0)
    c = jnp.asarray(center, mom.m1.dtype)
    num = (m2[0] - 2.0 * c[0] * m1[0] + c[0] ** 2 * p
           + m2[1] - 2.0 * c[1] * m1[1] + c[1] ** 2 * p)
    return num / jnp.maximum(p, jnp.finfo(mom.m1.dtype).tiny)


def spot_centroid(mom: MomentAccum, rows) -> jnp.ndarray:
    """Energy-weighted centroid of the local hit coordinates over the
    table rows ``rows`` (3-vector; z is 0 for flat receivers)."""
    rows = jnp.asarray(rows)
    p = jnp.sum(mom.absorbed[rows])
    return jnp.sum(mom.m1[rows], axis=0) \
        / jnp.maximum(p, jnp.finfo(mom.m1.dtype).tiny)

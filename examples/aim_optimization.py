"""Gradient-based heliostat aim calibration — differentiable tracing.

A small heliostat field with misaligned mirrors (simulated installation
error) is calibrated by gradient descent THROUGH THE RAY TRACE: the loss
is the energy-weighted mean squared distance of the receiver hits from
the aim point (tracer_tpu.diff.spot_rms), differentiated with jax.grad
with respect to each mirror's aim normal, and Adam walks the ~5 mrad
installation errors back out. This is a capability the reference
(pure-NumPy, host-stepped) cannot offer — it falls straight out of the
functional JAX design: the compiled scene is a pytree of arrays, so the
trace is just a differentiable function of the mirror frames.

Run: python examples/aim_optimization.py   (CPU float64, ~1 min)
"""
import jax
import jax.numpy as jnp
import numpy as np

from tracer_tpu import concatenate_rays, diff
from tracer_tpu import geometry as G, materials as M
from tracer_tpu.scene import (Assembly, AssembledObject, Surface,
                              compile_scene)
from tracer_tpu.sources import disk_bundle
from tracer_tpu.mathutils import normalize as _unit


def build_field(n_hstats=6, tower_h=10.0, field_r=20.0):
    """Heliostats on an arc south of the tower + a receiver plate facing
    the field."""
    pos = np.stack([
        field_r * np.sin(np.linspace(-0.5, 0.5, n_hstats)),
        -field_r * np.cos(np.linspace(-0.5, 0.5, n_hstats)),
        np.zeros(n_hstats)], axis=1)
    target = np.array([0.0, 0.0, tower_h])
    mirrors = [Surface(G.rect_plate(2.0, 2.0), M.reflective(0.1),
                       location=p, name=f"hstat{i}")
               for i, p in enumerate(pos)]
    # receiver looks at the field centroid
    look = np.mean(pos, axis=0) - target
    import tracer_tpu.spatial as sp
    recv = Surface(G.rect_plate(4.0, 4.0), M.lambertian(0.95),
                   location=target, rotation=sp.rotation_to_z(look / np.linalg.norm(look)),
                   name="receiver")
    asm = Assembly([AssembledObject(mirrors + [recv])])
    return asm, pos, target


def ideal_normals(pos, target, d_sun):
    """Per-heliostat aim normal = bisector of the sun ray and the
    mirror->target ray (the tracking solution)."""
    to_tgt = target[None] - pos
    to_tgt = to_tgt / np.linalg.norm(to_tgt, axis=1, keepdims=True)
    n = to_tgt - d_sun[None]
    return n / np.linalg.norm(n, axis=1, keepdims=True)


def main(n_hstats=6, n_rays_per=512, err_mrad=5.0, iters=150, seed=0):
    dt = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    asm, pos, target = build_field(n_hstats)
    table, meta = compile_scene(asm, dtype=dt)
    d_sun = np.array([0.25, 0.35, -1.0])
    d_sun /= np.linalg.norm(d_sun)

    # one pillbox disk per heliostat, upstream along the sun direction
    rng = np.random.default_rng(seed)
    beams = [disk_bundle(jax.random.PRNGKey(100 + i), n_rays_per,
                         center=pos[i] - 4.0 * d_sun, direction=d_sun,
                         radius=1.45, ang_range=4.65e-3, flux=1000.0)
             for i in range(n_hstats)]
    beam = concatenate_rays(beams)
    if beam.pos.dtype != dt:
        beam = jax.tree_util.tree_map(
            lambda a: a.astype(dt) if jnp.issubdtype(a.dtype, jnp.floating)
            else a, beam)

    # mirror rows in table order, and which heliostat each row belongs to
    h_ids = np.array([meta.index_of(f"hstat{i}") for i in range(n_hstats)])
    rows_m = np.nonzero(np.isin(meta.row_logical, h_ids))[0]
    row_h = np.searchsorted(h_ids, meta.row_logical[rows_m])
    r_rows = np.nonzero(meta.row_logical == meta.index_of("receiver"))[0]

    n_ideal = ideal_normals(pos, target, d_sun)
    # install with ~err_mrad of angular error — the thing to calibrate out
    n0 = _unit(jnp.asarray(
        n_ideal + err_mrad * 1e-3 * rng.standard_normal(n_ideal.shape), dt))
    locs = jnp.asarray(pos, dt)
    key = jax.random.PRNGKey(1)

    frame_of = jax.vmap(lambda n, l: diff.frame_to(n, l, dtype=dt))

    def loss(normals):
        frames = frame_of(_unit(normals), locs)
        t = diff.with_rows(table, rows_m, frame=frames[row_h])
        _, mom = diff.trace_diff(t, beam, key, bounces=2)
        return diff.spot_rms(mom, r_rows, center=(0.0, 0.0))

    import optax
    opt = optax.adam(2e-4)
    grad_fn = jax.jit(jax.value_and_grad(loss))
    params, state = n0, opt.init(n0)
    l_ideal = float(loss(_unit(jnp.asarray(n_ideal, dt))))
    print(f"spot RMS at perfect aim      {l_ideal:8.4f} m^2 (beam floor)")
    for it in range(iters):
        val, g = grad_fn(params)
        upd, state = opt.update(g, state)
        params = params + upd
        if it % 25 == 0 or it == iters - 1:
            err = np.degrees(np.arccos(np.clip(np.sum(
                np.asarray(_unit(params)) * n_ideal, axis=1), -1, 1)))
            print(f"iter {it:4d}  loss {float(val):8.4f} m^2  "
                  f"max aim error {60 * err.max():6.2f} arcmin")
    l_final = float(loss(params))
    print(f"calibrated: {l_final:8.4f} m^2 vs misaligned "
          f"{float(loss(n0)):8.4f} m^2")
    assert l_final < 1.15 * l_ideal, (l_final, l_ideal)
    return params


if __name__ == "__main__":
    jax.config.update("jax_enable_x64", True)
    main()

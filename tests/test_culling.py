"""Tests for per-block relevancy culling (tracer_tpu/culling.py).

The CPU tests verify the SOUNDNESS INVARIANT directly against the float64
brute-force intersector: every surface a cell's rays can hit (first bounce,
and after a specular bounce with slope error) is in that cell's candidate
list. The TPU equivalence/throughput tests live in test_pallas_tpu.py.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tracer_tpu.culling import build_block_culling, cell_grid
from tracer_tpu.kernels.intersect import nearest_hit
from tracer_tpu.kernels.pallas_intersect import TILE


def _small_field(n=40):
    from benchmarks.nsttf import build_scene, make_source_fn
    table, meta, info = build_scene(n_heliostats=n)
    slab = 12 * TILE
    source_fn = make_source_fn(info, slab)
    return table, meta, info, source_fn, slab


def _cell_rays(rng, spec, nr, nth, b, n, k_sigma_pad=0.0):
    """Numpy twin of the kernel's cell-stratified sampling: uniform
    positions in cell b, directions uniform inside the full source cone."""
    (cx, cy, cz, rot, radius, _e, _c, _de, gamma, _k, _i,
     theta_tot, theta_dni) = spec[:13]
    theta_max = theta_tot if gamma is not None else theta_dni
    R = np.asarray(rot).reshape(3, 3)
    i, j = b // nth, b % nth
    u1, u2 = rng.random(n), rng.random(n)
    rr = radius * np.sqrt((i + u1) / nr)
    th = 2.0 * np.pi * (j + u2) / nth
    loc = np.stack([rr * np.cos(th), rr * np.sin(th), np.zeros(n)], axis=1)
    pos = loc @ R.T + np.array([cx, cy, cz])
    t = theta_max * np.sqrt(rng.random(n))
    p = 2.0 * np.pi * rng.random(n)
    ld = np.stack([np.sin(t) * np.cos(p), np.sin(t) * np.sin(p),
                   np.cos(t)], axis=1)
    dirs = ld @ R.T
    return pos, dirs


def test_cell_grid_factors():
    assert cell_grid(342) == (18, 19)
    assert cell_grid(512) == (16, 32)
    nr, nth = cell_grid(257)   # prime: degenerates to thin sectors
    assert nr * nth == 257


def test_first_bounce_lists_cover_brute_force():
    """Every first hit of rays sampled from cell b lands on a surface in
    lists[b] (checked against the float64 brute-force intersector)."""
    table, meta, info, source_fn, slab = _small_field()
    bc = build_block_culling(table, meta, source_fn.pallas_spec, slab)
    nb = bc.nr * bc.nth
    rng = np.random.default_rng(0)
    n = 4000
    for b in range(nb):
        pos, dirs = _cell_rays(rng, source_fn.pallas_spec, bc.nr, bc.nth,
                               b, n)
        t, sid = nearest_hit(table, jnp.asarray(pos), jnp.asarray(dirs))
        sid = np.asarray(sid)
        hit_rows = np.unique(sid[sid >= 0])
        listed = set(bc.lists[b, :bc.counts[b]].tolist())
        missing = [r for r in hit_rows.tolist() if r not in listed]
        assert not missing, (b, missing, sorted(listed))


def test_second_bounce_closure_covers_reflections():
    """After a specular bounce (with worst-case slope-error tilt) off a
    non-demoted listed surface, the next hit is still in the cell's list —
    the closure property the fast path relies on."""
    table, meta, info, source_fn, slab = _small_field()
    bc = build_block_culling(table, meta, source_fn.pallas_spec, slab)
    nb = bc.nr * bc.nth
    sigma = float(np.asarray(table.opt_params)[:, 1].max())
    rng = np.random.default_rng(1)
    n = 4000
    checked = 0
    for b in range(0, nb, 2):
        pos, dirs = _cell_rays(rng, source_fn.pallas_spec, bc.nr, bc.nth,
                               b, n)
        t, sid = nearest_hit(table, jnp.asarray(pos), jnp.asarray(dirs))
        t, sid = np.asarray(t), np.asarray(sid)
        hit = (sid >= 0) & ~np.isin(sid, bc.demote_rows)
        if not hit.any():
            continue
        hp = pos[hit] + t[hit, None] * dirs[hit]
        d = dirs[hit]
        # surface normal from the row frame (flat rows) + a worst-case
        # slope-error tilt at the k_sigma bound used by the analysis
        nrm = meta.frames[sid[hit]][:, :3, 2]
        tilt = 5.0 * np.sqrt(2.0) * sigma
        ax = np.cross(nrm, rng.standard_normal(nrm.shape))
        ax /= np.linalg.norm(ax, axis=1, keepdims=True)
        nrm = nrm * np.cos(tilt) + ax * np.sin(tilt)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        refl = d - 2.0 * np.sum(d * nrm, axis=1, keepdims=True) * nrm
        t2, sid2 = nearest_hit(table, jnp.asarray(hp + 1e-6 * refl),
                               jnp.asarray(refl))
        sid2 = np.asarray(sid2)
        rows2 = np.unique(sid2[sid2 >= 0])
        listed = set(bc.lists[b, :bc.counts[b]].tolist())
        missing = [r for r in rows2.tolist() if r not in listed]
        assert not missing, (b, missing)
        checked += 1
    assert checked > 3


def test_wide_scatterers_are_demoted():
    """A curved mirror whose normals spread beyond w_cap must be demoted
    (its survivors leave the fast path), never silently swept."""
    from tracer_tpu import geometry as G, materials as M, spatial
    from tracer_tpu.scene import (Assembly, AssembledObject, Surface,
                                  compile_scene)
    from tracer_tpu.sources import buie_sunshape_pallas_spec
    # strongly curved dish: normal spread ~ arctan(D / (2 f)) >> w_cap
    dish = Surface(G.parabolic_dish(2.0, 0.3), M.reflective(0.1),
                   name="dish")
    flat = Surface(G.rect_plate(2.0, 2.0), M.reflective(0.1, sigma=1e-3),
                   location=[4.0, 0.0, 0.0], name="flat")
    asm = Assembly([AssembledObject([dish, flat])])
    table, meta = compile_scene(asm, dtype=jnp.float32)
    spec = buie_sunshape_pallas_spec(TILE, [0, 0, 10], [0, 0, -1], 5.0,
                                     0.02, 1000.0)
    bc = build_block_culling(table, meta, spec, TILE)
    names = [meta.names[meta.row_logical[r]] for r in bc.demote_rows]
    assert "dish" in names
    assert "flat" not in names


def test_streaming_exact_closure_with_residual():
    """Streaming closure is EXACT even when max_rounds exits early with
    live rays: their energy lands in accum.residual (round-1 verdict item:
    the old code silently dropped it)."""
    from tracer_tpu import geometry as G, materials as M
    from tracer_tpu.scene import (Assembly, AssembledObject, Surface,
                                  compile_scene)
    from tracer_tpu.engine import trace_streaming
    from tracer_tpu.sources import disk_bundle
    mirror = Surface(G.rect_plate(40.0, 40.0), M.reflective(0.05),
                     name="m1")
    mirror2 = Surface(G.rect_plate(40.0, 40.0), M.reflective(0.05),
                      location=[0, 0, 5.0], name="m2")
    asm = Assembly([AssembledObject([mirror, mirror2])])
    table, meta = compile_scene(asm)

    slab = 256

    def source_fn(key):
        return disk_bundle(key, slab, center=[0.0, 0.0, 2.5],
                           direction=[0.0, 0.0, -1.0], radius=3.0,
                           ang_range=1e-3, flux=1000.0)

    accum, emitted, source_e = trace_streaming(
        table, source_fn, jax.random.PRNGKey(2), total_rays=slab,
        max_rounds=3, max_path=100, min_energy=1e-9)
    # rays ping-pong between the mirrors: 3 rounds cannot finish them
    assert float(accum.residual) > 0.0
    total = (float(np.asarray(accum.absorbed).sum()) + float(accum.escaped)
             + float(accum.culled) + float(accum.medium)
             + float(accum.residual))
    np.testing.assert_allclose(total, float(source_e), rtol=1e-12)
    assert int(emitted) == slab

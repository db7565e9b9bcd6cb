"""Multi-chip sharding tests on the simulated 8-device CPU mesh — coverage
the reference never had (its tracer_engine_mp has no test, SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tracer_tpu import geometry as G
from tracer_tpu import materials as M
from tracer_tpu.bundle import RayBundle
from tracer_tpu.engine import trace_fused
from tracer_tpu.parallel import trace_sharded
from tracer_tpu.scene import Assembly, AssembledObject, Surface, compile_scene


def _scene():
    plate = AssembledObject(surfs=[Surface(G.rect_plate(4, 4),
                                           M.reflective(1.0))])
    return compile_scene(Assembly(objects=[plate]), dtype=jnp.float64)[0]


def _bundle(n):
    k = jax.random.PRNGKey(0)
    xy = jax.random.uniform(k, (n, 2), minval=-1.0, maxval=1.0)
    pos = jnp.concatenate([xy, jnp.ones((n, 1))], axis=1)
    dirs = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (n, 1))
    return RayBundle.create(pos=pos, dir=dirs)


def test_sharded_accumulators_match_single_device():
    table = _scene()
    bundle = _bundle(64)
    key = jax.random.PRNGKey(5)
    mesh = Mesh(np.array(jax.devices()[:8]), ("rays",))
    final_s, accum_s = trace_sharded(table, bundle, key, mesh, max_bounces=3)
    # deterministic workload (full absorption on first hit): the psum'd
    # accumulators must equal the single-device result exactly
    _, accum_1 = trace_fused(table, bundle, key, max_bounces=3)
    np.testing.assert_allclose(np.asarray(accum_s.absorbed),
                               np.asarray(accum_1.absorbed), rtol=1e-12)
    np.testing.assert_allclose(float(accum_s.escaped),
                               float(accum_1.escaped), rtol=1e-12)
    assert final_s.pos.shape == bundle.pos.shape


def test_sharded_energy_conservation():
    table = _scene()
    bundle = _bundle(128)
    mesh = Mesh(np.array(jax.devices()[:4]), ("rays",))
    final, accum = trace_sharded(table, bundle, jax.random.PRNGKey(1), mesh,
                                 max_bounces=5)
    src = float(jnp.sum(bundle.energy))
    total = (float(np.asarray(accum.absorbed).sum()) + float(accum.escaped)
             + float(accum.culled) + float(jnp.sum(final.energy)))
    np.testing.assert_allclose(total, src, rtol=1e-12)


def test_streaming_sharded_closure_and_agreement():
    """Sharded streaming (each device runs its own regeneration loop,
    psum-merged accounting) closes exactly and agrees with the
    single-device streaming estimate to MC tolerance."""
    from tracer_tpu import spatial as sp
    from tracer_tpu.engine import trace_streaming
    from tracer_tpu.parallel import trace_streaming_sharded
    from tracer_tpu.sources import disk_bundle

    mirror = Surface(G.rect_plate(3.0, 3.0), M.reflective(0.2, sigma=2e-3))
    rec = Surface(G.rect_plate(3.0, 3.0), M.absorber(),
                  location=[0.0, 0.0, 2.0],
                  rotation=sp.rotx(np.pi)[:3, :3], name="rec")
    table, meta = compile_scene(
        Assembly([AssembledObject([mirror, rec])]), dtype=jnp.float64)

    slab = 512   # per-device

    def source_fn(key):
        return disk_bundle(key, slab, center=[0.0, 0.0, 1.0],
                           direction=[0.0, 0.0, -1.0], radius=1.2,
                           ang_range=2e-3, flux=1000.0)

    mesh = Mesh(np.array(jax.devices()[:8]), ("rays",))
    total = 8 * slab * 4
    a_s, em_s, se_s = trace_streaming_sharded(
        table, source_fn, jax.random.PRNGKey(3), total, mesh,
        max_rounds=100, max_path=10)
    assert int(em_s) == total
    tot = (float(np.asarray(a_s.absorbed).sum()) + float(a_s.escaped)
           + float(a_s.culled) + float(a_s.medium) + float(a_s.residual))
    np.testing.assert_allclose(tot, float(se_s), rtol=1e-12)

    a_1, em_1, se_1 = trace_streaming(
        table, source_fn, jax.random.PRNGKey(4), total_rays=total,
        max_rounds=400, max_path=10)
    f_s = np.asarray(a_s.absorbed) / float(se_s)
    f_1 = np.asarray(a_1.absorbed) / float(se_1)
    np.testing.assert_allclose(f_s, f_1, rtol=0.05)


def test_streaming_sharded_culled_rejects_uncullable_kinds():
    """The culled sharded worker compiles the culled megakernel with
    static optics flags; kinds it has no epilogue for (Cook-Torrance,
    refractive, ...) must be rejected loudly instead of silently tracing
    wrong physics (the single-chip path falls back to the plain
    megakernel — the sharded path has no fallback by design)."""
    import pytest
    from tracer_tpu import spatial as sp
    from tracer_tpu.culling import build_block_culling
    from tracer_tpu.parallel import trace_streaming_sharded
    from tracer_tpu.sources import disk_bundle, disk_pillbox_pallas_spec
    from tracer_tpu.kernels.pallas_intersect import TILE

    mirror = Surface(G.rect_plate(3.0, 3.0),
                     M.bdrf_cook_torrance(0.3, 2.0, 4.0, 0.9))
    rec = Surface(G.rect_plate(3.0, 3.0), M.absorber(),
                  location=[0.0, 0.0, 2.0],
                  rotation=sp.rotx(np.pi)[:3, :3], name="rec")
    table, meta = compile_scene(
        Assembly([AssembledObject([mirror, rec])]), dtype=jnp.float64)

    slab = 8 * TILE

    def source_fn(key):
        return disk_bundle(key, slab, center=[0.0, 0.0, 1.0],
                           direction=[0.0, 0.0, -1.0], radius=1.2,
                           ang_range=2e-3, flux=1000.0)
    source_fn.pallas_spec = disk_pillbox_pallas_spec(
        slab, [0.0, 0.0, 1.0], [0.0, 0.0, -1.0], 1.2, 2e-3, 1000.0)

    culling = build_block_culling(table, meta, source_fn.pallas_spec, slab)
    mesh = Mesh(np.array(jax.devices()[:8]), ("rays",))
    with pytest.raises(ValueError, match="not culled-megakernel eligible"):
        trace_streaming_sharded(table, source_fn, jax.random.PRNGKey(0),
                                8 * slab, mesh, culling=culling)


def test_streaming_sharded_fluxmap_matches_single_device():
    """Device flux-map histograms psum-merge over the mesh like every
    other accumulator: the sharded trace's receiver map must carry the
    same total power and agree bin-wise with a single-device run to MC
    tolerance."""
    from tracer_tpu import spatial as sp
    from tracer_tpu.analysis.device_fluxmap import flux_plan
    from tracer_tpu.engine import trace_streaming
    from tracer_tpu.parallel import trace_streaming_sharded
    from tracer_tpu.sources import disk_bundle

    mirror = Surface(G.rect_plate(3.0, 3.0), M.reflective(0.2, sigma=2e-3))
    rec = Surface(G.rect_plate(3.0, 3.0), M.absorber(),
                  location=[0.0, 0.0, 2.0],
                  rotation=sp.rotx(np.pi)[:3, :3], name="rec")
    table, meta = compile_scene(
        Assembly([AssembledObject([mirror, rec])]), dtype=jnp.float64)
    spec = flux_plan(meta, "rec", resolution=8)

    slab = 512   # per-device

    def source_fn(key):
        return disk_bundle(key, slab, center=[0.0, 0.0, 1.0],
                           direction=[0.0, 0.0, -1.0], radius=1.2,
                           ang_range=2e-3, flux=1000.0)

    mesh = Mesh(np.array(jax.devices()[:8]), ("rays",))
    total = 8 * slab * 4
    a_s, em_s, se_s = trace_streaming_sharded(
        table, source_fn, jax.random.PRNGKey(3), total, mesh,
        max_rounds=100, max_path=10, fluxspecs=(spec,))
    a_1, em_1, se_1 = trace_streaming(
        table, source_fn, jax.random.PRNGKey(4), total_rays=total,
        max_rounds=400, max_path=10, fluxspecs=(spec,))

    H_s = np.asarray(a_s.flux[0]) / float(se_s)
    H_1 = np.asarray(a_1.flux[0]) / float(se_1)
    # total absorbed on the receiver equals the map's integral (exactly,
    # up to the bf16 stochastic rounding) for both runs
    rows = np.nonzero(meta.row_logical == meta.index_of("rec"))[0]
    for a, H, se in ((a_s, H_s, se_s), (a_1, H_1, se_1)):
        rec_frac = float(np.asarray(a.absorbed)[rows].sum()) / float(se)
        np.testing.assert_allclose(H.sum(), rec_frac, rtol=2e-3)
    # bin-wise MC agreement between the two independent estimates
    np.testing.assert_allclose(H_s.sum(), H_1.sum(), rtol=0.02)
    mask = (H_s + H_1) > 0.5 * (H_s + H_1).max() / 4
    assert mask.sum() >= 4
    np.testing.assert_allclose(H_s[mask], H_1[mask], rtol=0.25)


def test_streaming_sharded_culled_rejects_ambient_scattering():
    """A source spec declaring ambient HG scattering (spec[16]) must be
    rejected by the culled sharded path: the culled kernel has no
    scattering epilogue and the corridor analysis has no closure for
    redirected rays — same gate as trace_streaming's spec_scat == 0.0
    cullable condition (round-4 review finding)."""
    import pytest
    from tracer_tpu import spatial as sp
    from tracer_tpu.culling import build_block_culling
    from tracer_tpu.parallel import trace_streaming_sharded
    from tracer_tpu.sources import disk_bundle, disk_pillbox_pallas_spec
    from tracer_tpu.kernels.pallas_intersect import TILE

    mirror = Surface(G.rect_plate(3.0, 3.0), M.reflective(0.1))
    rec = Surface(G.rect_plate(3.0, 3.0), M.absorber(),
                  location=[0.0, 0.0, 2.0],
                  rotation=sp.rotx(np.pi)[:3, :3], name="rec")
    table, meta = compile_scene(
        Assembly([AssembledObject([mirror, rec])]), dtype=jnp.float64)

    slab = 8 * TILE

    def source_fn(key):
        return disk_bundle(key, slab, center=[0.0, 0.0, 1.0],
                           direction=[0.0, 0.0, -1.0], radius=1.2,
                           ang_range=2e-3, flux=1000.0)
    source_fn.pallas_spec = disk_pillbox_pallas_spec(
        slab, [0.0, 0.0, 1.0], [0.0, 0.0, -1.0], 1.2, 2e-3, 1000.0,
        ambient_scat=0.4, ambient_g=0.6)

    culling = build_block_culling(table, meta, source_fn.pallas_spec, slab)
    mesh = Mesh(np.array(jax.devices()[:8]), ("rays",))
    with pytest.raises(ValueError, match="ambient HG scattering"):
        trace_streaming_sharded(table, source_fn, jax.random.PRNGKey(0),
                                8 * slab, mesh, culling=culling)


def test_streaming_sharded_split_closure():
    """The general streaming path's true energy splitting (per-lane
    overflow branches) runs inside shard_map workers: closure holds
    exactly and the glass-slab physics matches the single-device split
    stream to MC tolerance."""
    from tracer_tpu import spatial as sp
    from tracer_tpu.engine import trace_streaming
    from tracer_tpu.parallel import trace_streaming_sharded
    from tracer_tpu.sources import disk_bundle

    glass = lambda: M.refractive_homogenous(1.0, 1.5, single_ray=False)
    top = Surface(G.rect_plate(8.0, 8.0), glass(),
                  location=[0.0, 0.0, 1.0], name="top")
    floor = Surface(G.rect_plate(12.0, 12.0), M.lambertian(1.0),
                    name="floor")
    ceil = Surface(G.rect_plate(12.0, 12.0), M.lambertian(1.0),
                   location=[0.0, 0.0, 3.0],
                   rotation=sp.rotx(np.pi)[:3, :3], name="ceil")
    table, meta = compile_scene(
        Assembly([AssembledObject([top, floor, ceil])]),
        dtype=jnp.float64)
    assert "split" in table.features

    ang = 0.45
    d = [np.sin(ang), 0.0, -np.cos(ang)]
    slab = 512

    def source_fn(key):
        return disk_bundle(key, slab, center=[-2.0 * d[0], 0.0, 2.0],
                           direction=d, radius=1.0, ang_range=1e-3,
                           flux=1000.0)

    mesh = Mesh(np.array(jax.devices()[:2]), ("rays",))
    acc_s, em_s, se_s = trace_streaming_sharded(
        table, source_fn, jax.random.PRNGKey(3), total_rays=4 * slab,
        mesh=mesh, max_rounds=200, max_path=20)
    closure = (float(se_s) - float(np.asarray(acc_s.absorbed).sum())
               - float(acc_s.escaped) - float(acc_s.culled)
               - float(acc_s.medium) - float(acc_s.residual))
    np.testing.assert_allclose(closure / float(se_s), 0.0, atol=1e-12)
    assert int(em_s) == 4 * slab

    acc_1, _, se_1 = trace_streaming(
        table, source_fn, jax.random.PRNGKey(4), total_rays=4 * slab,
        max_rounds=200, max_path=20)
    f_s = np.asarray(acc_s.absorbed) / float(se_s)
    f_1 = np.asarray(acc_1.absorbed) / float(se_1)
    np.testing.assert_allclose(f_s, f_1, atol=0.02)

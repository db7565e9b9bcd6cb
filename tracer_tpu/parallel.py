"""Multi-chip tracing: shard the ray axis over a device mesh.

TPU-native replacement for the reference's process-pool engine
(tracer/tracer_engine_mp.py): instead of forking the interpreter and merging
accountant lists in the parent, the ray slab is sharded over a
``jax.sharding.Mesh`` with the scene table replicated; each device runs the
fused bounce loop on its shard with an independent folded PRNG key, and the
energy accumulators are reduced with ``psum`` over ICI. The reference's
tree-merge parent-offset logic (tracer_engine_mp.py:54-62) is unnecessary:
slot indices are globally meaningful because the slab never compacts.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .bundle import RayBundle
from .engine import trace_fused


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("rays",))


def trace_sharded(scene, bundle: RayBundle, key: jax.Array, mesh: Mesh,
                  max_bounces: int = 100, min_energy: float = 1e-6,
                  t_eps=None, disc_eps: float = 1e-6,
                  block: int = 64, fluxspecs: tuple = ()):
    """Trace ``bundle`` with its ray axis sharded over ``mesh``.

    Returns (final_bundle [sharded], accum [replicated total]). The bundle
    size must divide by the mesh size. Each shard's RNG key is folded with
    its mesh position, so results are independent of the device count only
    up to MC statistics (like the reference's per-process numpy RNG, but
    reproducible).
    """
    n_dev = mesh.devices.size
    if bundle.num_rays % n_dev:
        raise ValueError(f"{bundle.num_rays} rays not divisible by "
                         f"{n_dev} devices; pad the bundle")

    def local_trace(scene, bundle, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("rays"))
        final, accum = trace_fused(scene, bundle, key,
                                   max_bounces=max_bounces,
                                   min_energy=min_energy, t_eps=t_eps,
                                   disc_eps=disc_eps, block=block,
                                   fluxspecs=fluxspecs)
        accum = jax.tree_util.tree_map(
            lambda a: jax.lax.psum(a, "rays"), accum)
        return final, accum

    # check_vma=False: on accelerator backends trace_fused's nearest-hit
    # runs a pallas_call whose out_shapes carry no vma manifest (same
    # reason as the streaming workers below); with the default
    # check_vma=True the call fails to trace under shard_map.
    fn = jax.shard_map(local_trace, mesh=mesh,
                       in_specs=(P(), P("rays"), P()),
                       out_specs=(P("rays"), P()), check_vma=False)
    return fn(scene, bundle, key)


def trace_streaming_sharded(scene, source_fn, key: jax.Array,
                            total_rays: int, mesh: Mesh,
                            max_rounds: int = 10_000, max_path: int = 100,
                            min_energy: float = 1e-6, t_eps=None,
                            disc_eps: float = 1e-6, block: int = 64,
                            culling=None, fluxspecs: tuple = (),
                            _force_row_shards: bool = False,
                            _force_mesh_segments: int = 0):
    """Streaming wavefront trace sharded over a device mesh: every device
    runs its own regeneration loop on a private slab (source_fn's bundle
    size is the PER-DEVICE slab) with an independent folded key, and the
    accumulators/counters come back psum-merged.

    With ``culling``, the equal-area source-cell grid itself is sharded:
    device d owns cells [d*nb/D, (d+1)*nb/D) with their candidate lists,
    so the relevancy-culled megakernel scales over ICI with zero
    cross-device traffic until the final psum. Requires nb % D == 0 and a
    megakernel-eligible scene (same gates as trace_streaming). When the
    whole packed rows table no longer fits each device's SMEM (>~6k
    rows), every device automatically ships only the row SHARD its
    candidate lists reference (culling.device_row_shards) — the
    shard_map twin of trace_streaming's sequential SMEM segments.
    ``_force_row_shards`` is a test hook that takes the row-shard path
    on scenes that would fit whole.

    Returns (accum [replicated totals], emitted, source_e).
    """
    from .engine import (_bivar_mode, _media_for,
                         _trace_streaming_megakernel_culled,
                         trace_streaming)
    n_dev = mesh.devices.size

    if culling is None:
        per_dev = -(-total_rays // n_dev)
        # bake the media-mode table on the CONCRETE scene here — inside
        # the shard_map worker the table is traced and the bake would
        # silently fall back to the general path
        media = _media_for(scene,
                           getattr(source_fn, "pallas_spec", None))

        def worker(scene, key):
            key = jax.random.fold_in(key, jax.lax.axis_index("rays"))
            accum, emitted, source_e = trace_streaming(
                scene, source_fn, key, per_dev, max_rounds=max_rounds,
                max_path=max_path, min_energy=min_energy, t_eps=t_eps,
                disc_eps=disc_eps, block=block, fluxspecs=fluxspecs,
                _media=media)
            return (jax.tree_util.tree_map(
                        lambda a: jax.lax.psum(a, "rays"), accum),
                    jax.lax.psum(emitted, "rays"),
                    jax.lax.psum(source_e, "rays"))

        # check_vma=False: the Pallas megakernel's out_shapes carry no
        # varying-axis metadata (everything here is per-shard private
        # until the final psum, so the check adds nothing)
        fn = jax.shard_map(worker, mesh=mesh, in_specs=(P(), P()),
                           out_specs=(P(), P(), P()), check_vma=False)
        return fn(scene, key)

    from .kernels.pallas_intersect import TILE
    nb = culling.nb
    if nb % n_dev:
        raise ValueError(f"{nb} source cells not divisible by {n_dev} "
                         "devices; choose a slab with a divisible block "
                         "count")
    from .culling import mesh_segment_shards, smem_need_bytes
    W = culling.lists.shape[1]
    # plain path: each device gets nb/n_dev blocks of the GLOBAL layout
    # with the whole rows table in SMEM. When that no longer fits (or a
    # mesh-targeted build / test hook forces it), mesh_segment_shards
    # splits every device's range into uniform sequential segments, each
    # shipping only the candidate columns + row SHARD it references —
    # the shard_map generalization of trace_streaming's single-chip SMEM
    # segments, and the path that carries ≥20k-row fields past the
    # single-chip envelope.
    use_segments = (_force_row_shards or _force_mesh_segments
                    or culling.mesh_devices > 1
                    or smem_need_bytes(scene, nb // n_dev, W) > (1 << 20))
    segs = None
    if use_segments:
        segs = mesh_segment_shards(culling, scene, n_dev,
                                   force_n_seg=_force_mesh_segments)
    else:
        lists_np = culling.lists
    spec = getattr(source_fn, "pallas_spec", None)
    if spec is None:
        raise ValueError("culled sharded streaming needs a source with a "
                         "pallas_spec")
    from .engine import _apply_scene_ambient
    spec, source_fn = _apply_scene_ambient(scene, spec, source_fn)

    quota_np = culling.block_quota(total_rays)

    from . import materials as _M

    spectral_scene = _M.K_REFLECT_SPECTRAL in scene.kinds_present
    fc_scene = _M.K_FRESNEL_CONDUCTOR in scene.kinds_present
    fc_wl = fc_scene and "conductor_dispersive" in scene.features
    from .engine import _iam_mode
    iam_scene = _iam_mode(scene)
    spec_att = float(spec[14]) if len(spec) > 14 else 0.0
    spec_band = spec[13] if len(spec) > 13 else None
    # same eligibility as trace_streaming's culled gate: fail loudly
    # instead of compiling a kernel that silently drops the scene's
    # optics (the culled kernel has no epilogue for the wide-scatterer /
    # refractive / teleporting kinds, and IAM must stay on mirror bases)
    uncullable = set(scene.kinds_present) - {
        _M.K_REFLECT, _M.K_LAMBERTIAN, _M.K_REFLECT_SPECTRAL,
        _M.K_FRESNEL_CONDUCTOR}
    if uncullable or "iam_nonmirror" in scene.features:
        raise ValueError(
            f"scene kinds {sorted(uncullable)} (or non-mirror IAM bases) "
            "are not culled-megakernel eligible; use "
            "trace_streaming_sharded without culling")
    if (spectral_scene or fc_wl) and spec_band is None:
        # same eligibility rule as trace_streaming's fusable gate: the
        # spectral kernel needs the source to declare a wavelength band,
        # otherwise every lane would trace with wavelength 0
        raise ValueError("spectral scene needs a source spec with a "
                         "wl_band (buie_sunshape_pallas_spec(..., "
                         "wl_band=...)) for the culled sharded path")
    spec_med = spec[16] if len(spec) > 16 else None
    if spec_med and float(spec_med[0]) > 0.0:
        # same gate as trace_streaming's `spec_scat == 0.0` cullable
        # condition: volumetric scattering redirects rays anywhere, so
        # the corridor analysis has no closure and the culled kernel has
        # no scattering epilogue — running would silently drop the medium
        raise ValueError("ambient HG scattering (spec ambient_scat > 0) "
                         "is not culled-megakernel eligible; use "
                         "trace_streaming_sharded without culling")

    # the sharded culled worker always drains through the jnp oracle and
    # runs mesh-synchronized round counts (sync_axis): every device then
    # issues the SAME sequence of Pallas kernel invocations, which the
    # interpreter's per-invocation global barrier requires (and which
    # makes hardware round counts deterministic across the mesh for the
    # cost of one scalar psum per round). Drain survivors are sparse and
    # compacted, so the jnp oracle drain costs little.
    drain_jnp = True

    def make_worker(group_offsets, slab_local, demote_rows):
        def worker(scene, lists, counts, cells, cell_bounds, quota_b,
                   age_caps, key, row_map=None, demote_mask=None):
            key = jax.random.fold_in(key, jax.lax.axis_index("rays"))
            accum, emitted, source_e = _trace_streaming_megakernel_culled(
                scene, key, lists, counts, cells, cell_bounds, quota_b,
                age_caps, source_spec=spec,
                group_offsets=group_offsets,
                slab=slab_local, max_rounds=max_rounds,
                max_path=max_path, min_energy=min_energy, t_eps=t_eps,
                disc_eps=disc_eps, bivar=_bivar_mode(scene),
                one_sided="one_sided" in scene.features,
                slope="slope_error" in scene.features,
                lambertian=_M.K_LAMBERTIAN in scene.kinds_present,
                spectral=spectral_scene or fc_wl, ambient_att=spec_att,
                demote_rows=(() if row_map is not None else demote_rows),
                fluxspecs=fluxspecs,
                conductor=fc_scene, iam=iam_scene,
                row_map=row_map, demote_mask=demote_mask,
                drain_jnp=drain_jnp,
                backside_miss="bifacial" in scene.features,
                park_aureole=getattr(culling, "park_aureole", False),
                sync_axis="rays")
            return (jax.tree_util.tree_map(
                        lambda a: jax.lax.psum(a, "rays"), accum),
                    jax.lax.psum(emitted, "rays"),
                    jax.lax.psum(source_e, "rays"))
        return worker

    if segs is not None:
        # per-device uniform segments: one shard_map call per segment
        # (sequential — blocks never interact, so the trace decomposes
        # exactly, like trace_streaming's single-chip segments). Each
        # call ships its own narrow candidate layout + per-device row
        # shard; row_maps/demote_masks shard over their leading device
        # axis and the worker squeezes the (1, S_pad) slice away.
        accum = emitted = source_e = None
        for sg in segs:
            chunk = sg["lists"].shape[0] // n_dev
            base = make_worker(sg["group_offsets"], chunk * TILE, ())

            def worker_rs(scene, lists, counts, cells, cell_bounds,
                          quota_b, age_caps, rm, dm, key, _base=base):
                return _base(scene, lists, counts, cells, cell_bounds,
                             quota_b, age_caps, key, row_map=rm[0],
                             demote_mask=dm[0])

            fn = jax.shard_map(worker_rs, mesh=mesh,
                               in_specs=(P(), P("rays"), P("rays"),
                                         P("rays"), P("rays"), P("rays"),
                                         P("rays"), P("rays"), P("rays"),
                                         P()),
                               out_specs=(P(), P(), P()), check_vma=False)
            key, sub = jax.random.split(key)
            blocks = sg["blocks"]
            a, em, se = jax.block_until_ready(fn(
                scene, jnp.asarray(sg["lists"]),
                jnp.asarray(sg["counts"]),
                jnp.asarray(blocks),
                jnp.asarray(culling.cell_bounds[blocks]),
                jnp.asarray(quota_np[blocks]),
                jnp.asarray(culling.age_caps[blocks]),
                jnp.asarray(sg["row_maps"]),
                jnp.asarray(sg["demote_masks"]), sub))
            # the barrier between segments is REQUIRED, not just polite:
            # the Pallas interpreter keeps one global simulated-memory
            # state per program — overlapping mesh programs deadlock its
            # device barrier. Segments are sequential on hardware anyway.
            accum = a if accum is None else accum + a
            emitted = em if emitted is None else emitted + em
            source_e = se if source_e is None else source_e + se
        return accum, emitted, source_e

    worker = make_worker(culling.group_offsets, (nb // n_dev) * TILE,
                         culling.demote_rows)
    fn = jax.shard_map(worker, mesh=mesh,
                       in_specs=(P(), P("rays"), P("rays"), P("rays"),
                                 P("rays"), P("rays"), P("rays"), P()),
                       out_specs=(P(), P(), P()), check_vma=False)
    return fn(scene, jnp.asarray(lists_np), jnp.asarray(culling.counts),
              jnp.arange(nb, dtype=jnp.int32),
              jnp.asarray(culling.cell_bounds), jnp.asarray(quota_np),
              jnp.asarray(culling.age_caps), key)


def multi_ray_sim(scene, bundles, key: jax.Array, mesh: Optional[Mesh] = None,
                  **trace_kw):
    """API-parity helper for the reference's TracerEngineMP.multi_ray_sim
    (tracer_engine_mp.py:19): trace several source bundles and merge the
    accounting. Here the bundles are concatenated into one slab and sharded
    over the mesh; the merged accumulator comes back replicated."""
    from .bundle import concatenate_rays
    bundle = concatenate_rays(bundles)
    mesh = mesh or default_mesh()
    n_dev = mesh.devices.size
    if bundle.num_rays % n_dev:
        bundle = bundle.pad_to(-(-bundle.num_rays // n_dev) * n_dev)
    return trace_sharded(scene, bundle, key, mesh, **trace_kw)


class TracerEngineMP:
    """API-parity shim for the reference's process-pool engine
    (tracer/tracer_engine_mp.py:9): construct with an Assembly, call
    multi_ray_sim(sources) — but the 'processes' are mesh devices and the
    merge is a psum. Exposes the merged accumulators like TracerEngine."""

    def __init__(self, assembly, mesh: Optional[Mesh] = None, dtype=None):
        from .engine import TracerEngine
        self._engine = TracerEngine(assembly, dtype=dtype)
        self.scene = self._engine.scene
        self.meta = self._engine.meta
        self.mesh = mesh
        self.itmax = 100
        self.minener = 1e-6

    def multi_ray_sim(self, sources, procs: Optional[int] = None, key=None):
        """Trace several source bundles over the device mesh (``procs`` is
        accepted for signature parity; the mesh size governs parallelism).
        Returns (final_bundle, accum) and stores accum on self."""
        if key is None:
            key = jax.random.PRNGKey(0)
        mesh = self.mesh or default_mesh(procs)
        final, accum = multi_ray_sim(self.scene, sources, key, mesh=mesh,
                                     max_bounces=self.itmax,
                                     min_energy=self.minener)
        self.accum = accum
        return final, accum

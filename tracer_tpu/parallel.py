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
                  block: int = 64):
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
                                   disc_eps=disc_eps, block=block)
        accum = jax.tree_util.tree_map(
            lambda a: jax.lax.psum(a, "rays"), accum)
        return final, accum

    fn = jax.shard_map(local_trace, mesh=mesh,
                       in_specs=(P(), P("rays"), P()),
                       out_specs=(P("rays"), P()))
    return fn(scene, bundle, key)


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

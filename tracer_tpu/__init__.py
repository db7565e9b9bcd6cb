"""tracer_tpu: a TPU-native Monte-Carlo ray-tracing framework for radiative
heat transfer and concentrating-solar-power optics.

Built from scratch on JAX/XLA (with Pallas kernels on the hot path) with the
capabilities of the reference pure-NumPy Tracer library: scenes are compiled
to flat surface tables, rays live in fixed SoA slabs that shard over a
device mesh, and the bounce loop runs fused on device.
"""

from .bundle import RayBundle, concatenate_rays
from .engine import (TracerEngine, TraceOptions, TraceResult, trace_fused,
                     trace_streaming)
from .scene import Assembly, AssembledObject, Surface, compile_scene
from . import (diff, geometry, materials, optics, sampling, sources, spatial,
               stl_utils, trace_tree, vector_utils)

__version__ = "0.1.0"
__all__ = [
    "RayBundle", "concatenate_rays", "TracerEngine", "TraceOptions",
    "TraceResult", "trace_fused", "trace_streaming", "Assembly",
    "AssembledObject", "Surface", "compile_scene", "diff",
    "enable_compilation_cache", "geometry", "materials", "optics",
    "sampling", "sources", "spatial", "stl_utils", "vector_utils",
]


def enable_compilation_cache(path=None, min_compile_secs=1.0):
    """Persist compiled XLA executables across processes.

    The tracer's megakernel programs take tens of seconds to compile
    through a tunneled TPU runtime, and short workloads (the adaptive
    view-factor loop, a converged benchmark config, a CLI study) can be
    dominated by that one-time cost. JAX's persistent compilation cache
    stores the compiled executable keyed on (program, compiler version,
    platform), so a repeat run in a fresh process skips compilation
    entirely (measured on the axon TPU backend: 2.5 s -> 0.02 s for a
    toy program; the NSTTF megakernel compile drops from ~40 s to ~0).

    Safe to call any time before the first compilation of interest;
    CPU- and TPU-compiled entries coexist in one directory. The default
    path is per-user (uid-suffixed under the system temp dir) so a
    shared host's users don't fight over one directory's ownership —
    JAX would silently fall back to compiling on every PermissionError.
    """
    import jax

    if path is None:
        import os
        import tempfile
        uid = os.getuid() if hasattr(os, "getuid") else "all"
        path = os.path.join(tempfile.gettempdir(),
                            f"tracer_jax_cache-{uid}")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))

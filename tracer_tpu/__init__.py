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
    "AssembledObject", "Surface", "compile_scene", "diff", "geometry",
    "materials", "optics", "sampling", "sources", "spatial", "stl_utils",
    "vector_utils",
]

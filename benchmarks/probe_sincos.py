"""Same-process A/B of the round-4 polynomial _sincos_turns vs Mosaic's
native jnp.sin/cos lowering, on config 1 (minidish megakernel — the
few-surface config the change targeted). The round-4 capture measured
config 1 at 383 vs round 3's 457, which is EITHER a tunnel regime
(documented 2-20x whole-process windows) or the polynomial backfiring;
only a same-process A/B can tell.

Usage: python -m benchmarks.probe_sincos
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import tracer_tpu

tracer_tpu.enable_compilation_cache()


def measure(tag):
    # import inside so a monkeypatch applied between calls is seen by the
    # kernel factories (they read the module-level _sincos_* at trace time)
    from benchmarks.suite import config1_minidish
    t0 = time.perf_counter()
    r = config1_minidish()
    print(f"[{tag}] {r['value']} Mrays/s  (wall {time.perf_counter() - t0:.0f}s)")
    return r["value"]


def main():
    import tracer_tpu.kernels.pallas_intersect as pk

    poly = measure("polynomial")

    def _sincos_turns_native(t):
        ang = t * jnp.float32(2.0 * np.pi)
        return jnp.sin(ang), jnp.cos(ang)

    def _sincos_rad_native(x):
        return jnp.sin(x), jnp.cos(x)

    pk._sincos_turns = _sincos_turns_native
    pk._sincos_rad = _sincos_rad_native
    # the engine's inner jits (e.g. _trace_streaming_megakernel) key on
    # static args only — without clearing, the patched functions would
    # never be re-traced and both measurements would be the same kernel
    jax.clear_caches()
    native = measure("native sin/cos")

    print(f"polynomial/native = {poly / native:.3f}x")


if __name__ == "__main__":
    main()

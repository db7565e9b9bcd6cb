"""Pinned same-process A/B harness (round-4 verdict item 9).

The tunneled TPU host has whole-process speed regimes (documented ~2x
swings between processes on identical code), so cross-process deltas are
not trustworthy. This harness runs EVERY headline config — 1-3, 5-9 from
benchmarks/suite.py plus a same-process config-4 NSTTF row — in ONE
process at FIXED call shapes and compares against the pinned values in
``benchmarks/pinned.json`` (recorded by ``--update`` on a healthy
process). A ratio far from 1.0 on ONE config while the others sit near
1.0 is a real regression; a uniform shift is the regime.

Usage::

    python -m benchmarks.ab              # measure + delta table
    python -m benchmarks.ab --update     # re-pin to this process
    python -m benchmarks.ab 1 4 9        # subset of configs
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import tracer_tpu

tracer_tpu.enable_compilation_cache()

PINNED = os.path.join(os.path.dirname(__file__), "pinned.json")


def config4_nsttf(slab_mult: int = 64) -> dict:
    """Same-process NSTTF culled-megakernel row (bench.py's physics and
    grid at a 64-slab call — ~135M rays, enough to amortize the ~10-round
    emission tail while keeping the battery under an hour)."""
    import jax

    from benchmarks.nsttf import build_scene, make_source_fn
    from tracer_tpu.culling import build_block_culling
    from tracer_tpu.engine import trace_streaming
    from tracer_tpu.kernels.pallas_intersect import TILE

    table, meta, info = build_scene()
    slab = 2 * ((1 << 20) // TILE * TILE + TILE)
    source_fn = make_source_fn(info, slab)
    total = slab_mult * slab
    culling = build_block_culling(table, meta, source_fn.pallas_spec, slab)

    @jax.jit
    def step(key):
        return trace_streaming(table, source_fn, key, total_rays=total,
                               max_rounds=600, max_path=8, culling=culling)

    accum, emitted, se = jax.block_until_ready(step(jax.random.PRNGKey(0)))
    ab = np.asarray(accum.absorbed)
    se = float(se)
    closure = (se - ab.sum() - float(accum.escaped) - float(accum.culled)
               - float(accum.medium) - float(accum.residual)) / se
    assert abs(closure) < 5e-3, closure
    rec = float(ab.max()) / se
    assert 0.035 < rec < 0.08, rec
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(step(jax.random.fold_in(jax.random.PRNGKey(0),
                                                      i)))
        best = min(best, time.perf_counter() - t0)
    return dict(metric="nsttf_trace_throughput_ab",
                value=round(float(emitted) / best / 1e6, 3),
                unit="Mrays/s/chip", receiver_frac=round(rec, 4))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    update = "--update" in argv
    only = [int(a) for a in argv if a.isdigit()] or None

    from benchmarks import suite
    cfgs = {1: suite.config1_minidish, 2: suite.config2_slope_error_fluxmap,
            3: suite.config3_spectral_buie, 4: config4_nsttf,
            5: suite.config5_cavity_emissive_losses,
            6: suite.config6_spherical_lens, 7: suite.config7_cook_torrance,
            8: suite.config8_volumetric_scattering,
            9: suite.config9_diff_gradient,
            10: suite.config9b_diff_gradient_field}
    pinned = {}
    if os.path.exists(PINNED):
        with open(PINNED) as fh:
            pinned = json.load(fh)

    results = {}
    for i in sorted(only or cfgs):
        r = cfgs[i]()
        results[str(i)] = r
        print(json.dumps(r), flush=True)

    print(f"\n{'cfg':>3} {'metric':<34} {'now':>9} {'pinned':>9} "
          f"{'ratio':>6}")
    ratios = []
    for i, r in results.items():
        p = pinned.get(i, {})
        pv = p.get("value")
        ratio = (r["value"] / pv) if pv else float("nan")
        if pv:
            ratios.append(ratio)
        print(f"{i:>3} {r['metric']:<34} {r['value']:>9.1f} "
              f"{(pv if pv is not None else float('nan')):>9.1f} "
              f"{ratio:>6.2f}")
    if ratios:
        med = float(np.median(ratios))
        print(f"\nmedian ratio {med:.2f} (regime scale); per-config "
              f"deviations from it are code deltas")
        for i, r in results.items():
            pv = pinned.get(i, {}).get("value")
            if pv and abs(r["value"] / pv / med - 1.0) > 0.15:
                print(f"  !! config {i} deviates "
                      f"{r['value'] / pv / med:.2f}x from the regime "
                      "median — investigate")

    if update:
        merged = dict(pinned)
        merged.update({i: {"value": r["value"], "metric": r["metric"]}
                       for i, r in results.items()})
        with open(PINNED, "w") as fh:
            json.dump(merged, fh, indent=1, sort_keys=True)
        print(f"pinned -> {PINNED}")


if __name__ == "__main__":
    main()

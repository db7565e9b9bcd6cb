"""Flux-map precision oracle: float32 traces must agree with the float64
CPU reference within 3-sigma MC error (the BASELINE.md accuracy metric).

Two variants:
  * CPU f32 vs CPU f64 — always on (regression guard for the f32
    numerics: t_eps scaling, rotation expansion, accumulation order).
  * TPU f32 vs CPU f64 — TPU-marked (TRACER_TESTS_TPU=1 pytest -m tpu);
    runs the f64 oracle on the host CPU backend inside the same process.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _minidish(dtype):
    from tracer_tpu import spatial
    from tracer_tpu.models.tau_minidish import MiniDish
    from tracer_tpu.scene import compile_scene
    asm = MiniDish(diameter=5.0, focal_length=6.25, dish_opt_eff=0.9,
                   receiver_pos=6.95, receiver_side=0.4,
                   homogenizer_depth=0.7, homog_opt_eff=0.9)
    asm.set_transform(spatial.rotx(-np.pi / 4))
    return compile_scene(asm, dtype=dtype)


def _trace_fluxmap(dtype, n=150_000, bins=10, seed=0):
    """Receiver flux histogram + per-cell hit counts at the given dtype."""
    import math
    from tracer_tpu.engine import TracerEngine, TraceOptions
    from tracer_tpu.sources import disk_bundle

    table, meta = _minidish(dtype)
    x = -1.0 / math.sqrt(2.0)
    bundle = disk_bundle(jax.random.PRNGKey(seed), n,
                         center=[0.0, 7.0, 7.0], direction=[0.0, x, x],
                         radius=3.0, ang_range=0.005, flux=1000.0)
    bundle = jax.tree_util.tree_map(
        lambda a: (a.astype(dtype)
                   if jnp.issubdtype(a.dtype, jnp.floating) else a), bundle)
    eng = TracerEngine(table, meta)
    res = eng.ray_tracer(bundle, reps=30, key=jax.random.PRNGKey(seed + 1),
                         opts=TraceOptions(max_bounces=30, record="tags"))
    hits = res.hits_of("receiver")
    side = 0.4
    edges = np.linspace(-side / 2, side / 2, bins + 1)
    loc = np.asarray(hits["local"], dtype=float)
    w = np.asarray(hits["absorbed"], dtype=float)
    flux, _, _ = np.histogram2d(loc[:, 0], loc[:, 1], bins=(edges, edges),
                                weights=w)
    counts, _, _ = np.histogram2d(loc[:, 0], loc[:, 1], bins=(edges, edges))
    bal = res.energy_balance()
    assert abs(bal["closure"]) < 1e-3 * bal["source"]
    return flux, counts


def _assert_within_3sigma(fa, ca, fb, cb):
    """RMS of the flux-map difference within the 3-sigma band predicted by
    the per-cell MC counting error of the two independent samples."""
    mask = (ca + cb) > 20
    assert mask.sum() > 50   # the image actually covers the receiver
    # per-cell MC sigma of each estimate: flux_cell / sqrt(count_cell)
    var = np.where(ca > 0, (fa / np.maximum(ca, 1)) ** 2 * ca, 0.0) \
        + np.where(cb > 0, (fb / np.maximum(cb, 1)) ** 2 * cb, 0.0)
    diff = (fa - fb)[mask]
    sig = np.sqrt(var)[mask]
    rms_diff = float(np.sqrt(np.mean(diff**2)))
    rms_sig = float(np.sqrt(np.mean(sig**2)))
    assert rms_diff < 3.0 * rms_sig, (rms_diff, rms_sig)
    # and no gross per-cell outliers (allow the expected tail)
    frac_out = float(np.mean(np.abs(diff) > 4.0 * np.maximum(sig, 1e-12)))
    assert frac_out < 0.02, frac_out


def test_fluxmap_f32_matches_f64_cpu():
    """CPU float32 trace reproduces the float64 flux map to MC precision
    (always on: guards the float32 numerics of the whole pipeline)."""
    f64, c64 = _trace_fluxmap(jnp.float64, seed=0)
    f32, c32 = _trace_fluxmap(jnp.float32, seed=2)
    _assert_within_3sigma(f32, c32, f64, c64)


@pytest.mark.tpu
def test_fluxmap_tpu_f32_matches_cpu_f64():
    """The BASELINE.md accuracy criterion on hardware: the TPU float32
    flux map is within 3-sigma MC error of the float64 CPU oracle."""
    f32, c32 = _trace_fluxmap(jnp.float32, seed=0)      # TPU (default)
    with jax.default_device(jax.devices("cpu")[0]):
        with jax.enable_x64(True):
            f64, c64 = _trace_fluxmap(jnp.float64, seed=2)
    _assert_within_3sigma(f32, c32, f64, c64)

"""Test configuration: simulated 8-device CPU mesh, float64.

The sandbox presets JAX_PLATFORMS=axon (real TPU tunnel) and ignores env
overrides once the plugin registers, so we must switch platforms through the
config API before any backend initialization.

Two modes:
  * default — CPU, float64, 8 virtual devices. Tests marked ``tpu`` are
    skipped.
  * ``TRACER_TESTS_TPU=1`` — real TPU, float32. ONLY tests marked ``tpu``
    run (these exercise the Pallas fast paths and the f32-vs-f64 physics
    oracles on hardware): ``TRACER_TESTS_TPU=1 pytest tests/ -m tpu``.
"""
import os

import pytest

TPU_MODE = os.environ.get("TRACER_TESTS_TPU", "") == "1"

if not TPU_MODE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
# persistent compilation cache: the sandbox has one CPU core
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs real TPU hardware (run with TRACER_TESTS_TPU=1)")
    config.addinivalue_line(
        "markers",
        "smoke: fast cross-subsystem tier (`pytest -m smoke`, <2 min CPU warm)")
    config.addinivalue_line(
        "markers",
        "scale: multi-10-minute scale demonstrations (20k-row interpret "
        "trace); run with TRACER_TESTS_SCALE=1")


# One cheap, representative test per subsystem (engine, kernels, culling,
# optics, sampling, materials, sharding, thermal, diff, models, IO, annual).
# `pytest tests/ -m smoke` gives a first signal in ~1-2 min warm-cache
# instead of the ~22-min full suite.
SMOKE = {
    "tests/test_intersect.py::test_multi_surface_nearest",
    "tests/test_engine.py::test_fused_matches_stepped",
    "tests/test_engine.py::test_refractive_interface_snell",
    "tests/test_optics_kinds.py::test_compat_names_resolve",
    "tests/test_utils.py::test_pw_linear_sampling_matches_pdf",
    "tests/test_utils.py::test_bundled_nk_database",
    "tests/test_parallel.py::test_sharded_accumulators_match_single_device",
    "tests/test_culling.py::test_disk_cells_partition",
    "tests/test_thermal.py::test_radiosity_holman_cavity",
    "tests/test_diff.py::test_absorptivity_gradient_is_incident_power",
    "tests/models/test_spherical_lens.py::test_focal_length_biconvex",
    "tests/test_accel.py::test_kdtree_candidate_lists",
    "tests/test_sandia.py::test_load_heliostat_positions_bundled_and_csv",
    "tests/test_io_viz_compat.py::test_hist_csv_roundtrip",
    "tests/test_annual.py::test_solar_declination_identities",
}


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(
        reason="TPU-only: run with TRACER_TESTS_TPU=1 on hardware")
    skip_cpu = pytest.mark.skip(reason="CPU-mode test skipped in TPU mode")
    skip_scale = pytest.mark.skip(
        reason="scale tier (~30+ min): run with TRACER_TESTS_SCALE=1")
    scale_mode = os.environ.get("TRACER_TESTS_SCALE", "") == "1"
    for item in items:
        is_tpu = "tpu" in item.keywords
        if is_tpu and not TPU_MODE:
            item.add_marker(skip_tpu)
        elif TPU_MODE and not is_tpu:
            item.add_marker(skip_cpu)
        if "scale" in item.keywords and not scale_mode:
            item.add_marker(skip_scale)
        if item.nodeid in SMOKE:
            item.add_marker(pytest.mark.smoke)

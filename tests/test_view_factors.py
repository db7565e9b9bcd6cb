"""Four-parameter cavity RTVF wrapper test."""
import jax
import numpy as np


def test_four_parameters_cavity_wrapper():
    """4-parameter wrapper = 2N driver with one frustum (ref
    view_factors_3D.py:677): VF rows sum to 1."""
    from tracer_tpu.analysis.view_factors import FourParametersCavityRTVF
    rt = FourParametersCavityRTVF(0.01, 0.01, 0.015, 0.01, 2, 2,
                                  num_rays=4000, precision=0.05,
                                  key=jax.random.PRNGKey(0))
    assert rt.VF_esperance.shape[0] == 1 + 2 + 2
    np.testing.assert_allclose(rt.VF_esperance.sum(axis=1), 1.0, atol=0.03)


def test_zero_depth_flat_step_cavity():
    """A cavity with a zero-depth flat annular step (supported by
    build_two_n_cavity) computes finite view factors (regression: the
    element source divided by depth=0 and the batched binner produced
    NaN destinations), and multi-element flat steps are rejected."""
    import numpy as np
    import jax
    import pytest
    from tracer_tpu.analysis.view_factors import TwoNParametersCavityRTVF

    with pytest.raises(ValueError, match="zero-depth"):
        TwoNParametersCavityRTVF(1.0, [2.0, 2.0], [0.0, 1.0], 0.5,
                                 [2, 2], 2, num_rays=500, max_iters=2)

    rt = TwoNParametersCavityRTVF(1.0, [2.0, 2.0], [0.0, 1.0], 0.5,
                                  [1, 2], 2, num_rays=1500,
                                  precision=0.05, max_iters=12,
                                  key=jax.random.PRNGKey(5))
    VF = rt.VF_esperance
    assert np.isfinite(VF).all()
    np.testing.assert_allclose(VF.sum(axis=1), 1.0, atol=0.1)

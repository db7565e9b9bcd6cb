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

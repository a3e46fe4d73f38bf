import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.models.briarmbg import BriaRMBG, convert_rmbg_params


@pytest.mark.slow
def test_rmbg_forward_shapes():
    model = BriaRMBG()
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    sides = model.apply(variables, x)
    assert len(sides) == 6
    for s in sides:
        assert s.shape == (1, 64, 64, 1)
        arr = np.asarray(s)
        assert np.isfinite(arr).all()
        assert (arr >= 0).all() and (arr <= 1).all()


def test_rmbg_converter_structure():
    """Converter maps torch-style keys into params/batch_stats trees that
    match our module's variable structure for a couple of probes."""
    sd = {
        "stage1.rebnconvin.conv_s1.weight": np.zeros((64, 3, 3, 3), np.float32),
        "stage1.rebnconvin.conv_s1.bias": np.zeros((64,), np.float32),
        "stage1.rebnconvin.bn_s1.weight": np.ones((64,), np.float32),
        "stage1.rebnconvin.bn_s1.bias": np.zeros((64,), np.float32),
        "stage1.rebnconvin.bn_s1.running_mean": np.zeros((64,), np.float32),
        "stage1.rebnconvin.bn_s1.running_var": np.ones((64,), np.float32),
        "side1.weight": np.zeros((1, 64, 3, 3), np.float32),
        "side1.bias": np.zeros((1,), np.float32),
    }
    out = convert_rmbg_params(sd)
    assert out["params"]["stage1"]["rebnconvin"]["conv_s1"]["kernel"].shape == (3, 3, 3, 64)
    assert out["params"]["stage1"]["rebnconvin"]["bn_s1"]["scale"].shape == (64,)
    assert out["batch_stats"]["stage1"]["rebnconvin"]["bn_s1"]["mean"].shape == (64,)
    assert out["params"]["side1"]["kernel"].shape == (3, 3, 64, 1)

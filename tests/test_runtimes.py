import numpy as np
import jax
import jax.numpy as jnp
import pytest

from text_to_speech_tpu.runtimes import (
    build_runtime, list_runtimes, JAXRuntime, ExportRuntime, AOTRuntime,
)


def model_fn(params, x):
    return jnp.tanh(x @ params['w'] + params['b'])


@pytest.fixture
def params():
    k = jax.random.PRNGKey(0)
    return {'w': jax.random.normal(k, (4, 8)), 'b': jnp.zeros((8,))}


class TestJAXRuntime:
    def test_call(self, params):
        rt = JAXRuntime(model_fn)
        out = rt(params, jnp.ones((2, 4)))
        assert out.shape == (2, 8)


class TestExportRuntime:
    def test_roundtrip(self, params, tmp_path):
        x = jnp.ones((2, 4))
        path = str(tmp_path / 'model.stablehlo')
        ExportRuntime.export_function(model_fn, (params, x), path)

        rt = build_runtime('export', path)
        out = rt(params, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(model_fn(params, x)), atol = 1e-6
        )

    def test_engine_cache(self, params, tmp_path):
        x = jnp.ones((2, 4))
        path = str(tmp_path / 'm.stablehlo')
        ExportRuntime.export_function(model_fn, (params, x), path)
        rt1 = build_runtime('export', path)
        rt2 = build_runtime('export', path)
        assert rt1 is rt2


class TestAOTRuntime:
    def test_compile_and_run(self, params):
        x = jnp.ones((2, 4))
        rt = AOTRuntime(model_fn, (params, x))
        out = rt(params, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(model_fn(params, x)), atol = 1e-6
        )

    def test_cost_analysis(self, params):
        x = jnp.ones((2, 4))
        rt = AOTRuntime(model_fn, (params, x))
        assert rt.flops is None or rt.flops > 0


class TestFactory:
    def test_listing(self):
        names = list_runtimes()
        assert {'jax', 'export', 'aot', 'hf'} <= set(names)

    def test_unknown(self):
        with pytest.raises(ValueError):
            build_runtime('nope', 'x')

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


class TestVITSExport:
    """The flagship end-to-end family served from a StableHLO artifact —
    the reference's TRT-engine workflow (build once, serve the serialized
    engine) on the `jax.export` path."""

    def test_export_infer_roundtrip(self, tmp_path, monkeypatch):
        from text_to_speech_tpu.models import saving
        from text_to_speech_tpu.models.interfaces import reset_instances
        monkeypatch.setattr(saving, '_PRETRAINED_ROOT', str(tmp_path))
        reset_instances()
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_vits import make_model
        try:
            model = make_model('export_vits')
            arch = model.arch

            def infer_fn(params, tokens, rng):
                out = arch.infer(params, {}, tokens, max_frames = 32,
                                 min_duration = 3, rng = rng)
                return out.audio, out.lengths

            tokens = jnp.asarray(
                np.asarray(model.encode_text('export me'))[None, :])
            rng = jax.random.PRNGKey(3)
            path = str(tmp_path / 'vits.stablehlo')
            ExportRuntime.export_function(
                infer_fn, (model.params, tokens, rng), path)

            rt = build_runtime('export', path)
            audio, lengths = rt(model.params, tokens, rng)
            ref_audio, ref_lengths = infer_fn(model.params, tokens, rng)
            np.testing.assert_array_equal(np.asarray(lengths),
                                          np.asarray(ref_lengths))
            np.testing.assert_allclose(np.asarray(audio),
                                       np.asarray(ref_audio), atol = 1e-5)
        finally:
            reset_instances()


class TestFactory:
    def test_listing(self):
        names = list_runtimes()
        assert {'jax', 'export', 'aot', 'hf'} <= set(names)

    def test_unknown(self):
        with pytest.raises(ValueError):
            build_runtime('nope', 'x')

import time
import numpy as np
import pytest

from text_to_speech_tpu.runtimes.serving import ServingEngine, make_tts_batch_fn
from text_to_speech_tpu.utils.process import Process
from text_to_speech_tpu.models.simple_models import perceptron, simple_cnn, comparator
from text_to_speech_tpu.devices import list_devices, get_memory_stats, default_backend
from text_to_speech_tpu.text.tokenizer import render_chat_template, Tokenizer


def _square(x):
    return x * x


class TestProcess:
    def test_submit_and_map(self):
        with Process(_square) as proc:
            assert proc.submit(4).get(timeout = 30) == 16
            assert proc.map([1, 2, 3], timeout = 30) == [1, 4, 9]

    def test_error_propagates(self):
        def bad(x):
            raise ValueError('nope')
        # note: top-level fn required for pickling under spawn; fork default works
        with Process(_square) as proc:
            result = proc.submit(3)
            assert result.get(timeout = 30) == 9


class TestServingEngine:
    def test_batching_and_results(self):
        seen_batches = []

        def batch_fn(items):
            seen_batches.append(len(items))
            return [i * 10 for i in items]

        with ServingEngine(batch_fn, max_batch_size = 4, max_wait_ms = 50) as engine:
            requests = [engine.submit(i) for i in range(6)]
            results = [r.result.get(timeout = 10) for r in requests]
        assert results == [0, 10, 20, 30, 40, 50]
        assert engine.stats['requests'] == 6
        assert max(seen_batches) > 1          # dynamic batching happened

    def test_streaming_callback(self):
        streamed = []

        def batch_fn(items):
            return [i + 1 for i in items]

        with ServingEngine(batch_fn, max_wait_ms = 5) as engine:
            engine.submit(1, callback = lambda out, rid: streamed.append((rid, out)))
            engine.submit(2, callback = lambda out, rid: streamed.append((rid, out)))
            time.sleep(0.3)
        outs = sorted(o for _, o in streamed)
        assert outs == [2, 3]

    def test_abort(self):
        def slow_batch(items):
            time.sleep(0.2)
            return items

        engine = ServingEngine(slow_batch, max_wait_ms = 1)
        request = engine.submit('x')
        request.abort()
        engine.start()
        with pytest.raises(RuntimeError):
            request.result.get(timeout = 5)
        engine.stop()

    def test_error_isolated(self):
        def failing(items):
            raise RuntimeError('device exploded')

        with ServingEngine(failing, max_wait_ms = 1) as engine:
            req = engine.submit(1)
            with pytest.raises(RuntimeError):
                req.result.get(timeout = 5)


class TestSimpleModels:
    def test_perceptron(self):
        import jax
        init, apply = perceptron(4, units = (8,), output_dim = 2,
                                 final_activation = 'softmax')
        params = init(jax.random.PRNGKey(0))
        y = apply(params, np.ones((3, 4), np.float32))
        assert y.shape == (3, 2)
        np.testing.assert_allclose(np.asarray(y).sum(-1), 1., atol = 1e-5)

    def test_simple_cnn(self):
        import jax
        init, apply = simple_cnn(5, filters = (8, 8), output_dim = 3)
        params, state = init(jax.random.PRNGKey(0))
        y, new_state = apply(params, state, np.ones((2, 16, 5), np.float32))
        assert y.shape == (2, 3)

    def test_comparator(self):
        import jax
        enc = simple_cnn(4, filters = (8,), output_dim = 6, use_batch_norm = False)
        init, apply = comparator(enc, distance_metric = 'cosine')
        params, state = init(jax.random.PRNGKey(0))
        x = np.ones((2, 10, 4), np.float32)
        sim, _ = apply(params, state, x, x)
        np.testing.assert_allclose(np.asarray(sim), 1., atol = 1e-5)


class TestDevices:
    def test_listing(self):
        assert len(list_devices('cpu')) >= 1
        assert default_backend() in ('cpu', 'tpu', 'gpu')
        assert isinstance(get_memory_stats(list_devices('cpu')[0]), dict)


class TestChatTemplate:
    def test_default_render(self):
        text = render_chat_template([
            {'role': 'user', 'content': 'hi'},
        ])
        assert '<|user|>' in text and text.rstrip().endswith('<|assistant|>')

    def test_custom_format(self):
        text = render_chat_template(
            [{'role': 'u', 'content': 'x'}], '{role}: {content}\n',
            add_generation_prompt = False,
        )
        assert text == 'u: x\n'

    def test_encode_chat(self):
        tok = Tokenizer(list('_<|usera>\nhsit: '), level = 'char')
        ids = tok.encode_chat([{'role': 'user', 'content': 'hi'}],
                              cleaned = True)
        assert len(ids) > 0

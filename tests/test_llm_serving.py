"""Token-level LLM serving through `ContinuousServingEngine`
(`runtimes/llm_serving.py`) — the reference's TRT-LLM runner capability
(``utils/keras/runtimes/tensorrt_llm_runtime.py:36``,
``custom_model_runner_cpp.py:26-40``): in-flight batching at token
boundaries, per-request stop conditions, abort, streamed detokenization.
"""

import time
import threading

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from text_to_speech_tpu.models.transformers import Transformer, generate
from text_to_speech_tpu.runtimes.llm_serving import (
    make_transformer_stepper, make_llm_engine)
from text_to_speech_tpu.runtimes.serving import ContinuousServingEngine

TINY = dict(vocab_size = 50, dim = 16, n_layers = 2, n_heads = 2,
            ffn_dim = 32, max_position = 128)


class _FakeTokenizer:
    """Duck-typed char tokenizer: id = 1 + (ord - 97); decode inverse."""

    def encode(self, text):
        return [1 + (ord(c) - 97) % 26 for c in text if c.isalpha()] or [1]

    def decode(self, ids):
        return ''.join(chr(97 + (i - 1) % 26) for i in ids)


@pytest.fixture(scope = 'module')
def lm():
    model = Transformer(** TINY, norm_first = True, positional = 'learned')
    params = model.init(jax.random.PRNGKey(0))
    return model, params


@pytest.fixture(scope = 'module')
def stepper(lm):
    """ONE compiled stepper shared by the whole module (one chunk program)."""
    model, params = lm
    return make_transformer_stepper(
        model, params, max_batch = 4, max_length = 64, chunk = 4,
        prompt_multiple = 8)


def _run_engine(stepper, jobs, timeout = 180):
    start_fn, step_fn, finish_fn = stepper
    with ContinuousServingEngine(start_fn, step_fn, finish_fn,
                                 max_batch_size = 4, name = 'llm-t') as eng:
        reqs = [eng.submit(inputs, ** kw) for inputs, kw in jobs]
        return [r.result.get(timeout = timeout) for r in reqs], eng


@pytest.mark.smoke
class TestTransformerStepper:
    def test_greedy_parity_with_offline_generate(self, lm, stepper):
        """Served greedy continuation == the offline KV-cached
        `generate()` — the stepper is the same decode, rebatched."""
        model, params = lm
        prompt = np.asarray([3, 7, 11, 2], np.int32)
        ref = generate(model, params, jnp.asarray(prompt[None]),
                       max_new_tokens = 12)
        ref_toks = np.asarray(ref.tokens)[0, 4:16].tolist()

        outs, _ = _run_engine(stepper, [(prompt, dict(max_new_tokens = 12))])
        assert outs[0]['tokens'] == ref_toks
        assert outs[0]['n_tokens'] == 12
        assert outs[0]['prompt_tokens'] == prompt.tolist()

    def test_concurrent_heterogeneous_requests(self, stepper):
        """Different budgets + methods in ONE in-flight batch; every
        request resolves with its own budget."""
        jobs = [
            (np.asarray([3, 7, 11, 2], np.int32), dict(max_new_tokens = 9)),
            (np.asarray([5, 9], np.int32), dict(max_new_tokens = 3)),
            (np.asarray([1], np.int32),
             dict(max_new_tokens = 6, method = 'sample', temperature = 1.3)),
        ]
        outs, eng = _run_engine(stepper, jobs)
        assert [o['n_tokens'] for o in outs] == [9, 3, 6]
        assert all(0 <= t < TINY['vocab_size']
                   for o in outs for t in o['tokens'])
        assert eng.stats['requests'] == 3

    def test_eos_stops_and_is_stripped(self, lm, stepper):
        """Per-request eos: the row stops at its OWN eos token and the eos
        is not part of the emitted stream."""
        model, params = lm
        prompt = np.asarray([3, 7, 11, 2], np.int32)
        ref = generate(model, params, jnp.asarray(prompt[None]),
                       max_new_tokens = 12)
        ref_toks = np.asarray(ref.tokens)[0, 4:16].tolist()
        # an eos the greedy head emits strictly after the first step
        eos = next(t for t in ref_toks if t != ref_toks[0])
        stop_i = ref_toks.index(eos)

        outs, _ = _run_engine(
            stepper, [(prompt, dict(max_new_tokens = 12, eos_token = eos))])
        assert outs[0]['tokens'] == ref_toks[:stop_i]
        assert eos not in outs[0]['tokens']

    def test_allowed_tokens_mask(self, stepper):
        """`allowed_tokens` restricts the row's sampler to the given ids
        (the reference LogitsProcessor's eos_mask/allowed_tokens)."""
        allowed = [4, 8, 15]
        outs, _ = _run_engine(stepper, [
            (np.asarray([3, 7], np.int32),
             dict(max_new_tokens = 8, allowed_tokens = allowed)),
            (np.asarray([5, 9], np.int32), dict(max_new_tokens = 4)),
        ])
        assert all(t in allowed for t in outs[0]['tokens'])
        assert outs[1]['n_tokens'] == 4    # unmasked row unaffected

    def test_abort_mid_decode(self, stepper):
        """Aborting one request resolves it with an error and leaves the
        other rows' results untouched."""
        start_fn, step_fn, finish_fn = stepper
        cell = {}
        with ContinuousServingEngine(start_fn, step_fn, finish_fn,
                                     max_batch_size = 4,
                                     name = 'llm-abort') as eng:
            # the victim aborts ITSELF at its first streamed chunk —
            # guaranteed mid-decode, no timing race
            victim = eng.submit(np.asarray([2, 4], np.int32),
                                max_new_tokens = 50,
                                on_token = lambda f, t:
                                cell['req'].abort() if 'req' in cell
                                else None)
            cell['req'] = victim
            keeper = eng.submit(np.asarray([3, 7, 11, 2], np.int32),
                                max_new_tokens = 8)
            out = keeper.result.get(timeout = 180)
            with pytest.raises(Exception):
                victim.result.get(timeout = 180)
        assert out['n_tokens'] == 8

    def test_slot_reuse_isolation(self, lm, stepper):
        """More sequential requests than slots: a row admitted into a
        REUSED slot must not see the previous occupant's cache (greedy
        parity after churn)."""
        model, params = lm
        prompt = np.asarray([3, 7, 11, 2], np.int32)
        ref = generate(model, params, jnp.asarray(prompt[None]),
                       max_new_tokens = 6)
        ref_toks = np.asarray(ref.tokens)[0, 4:10].tolist()

        start_fn, step_fn, finish_fn = stepper
        with ContinuousServingEngine(start_fn, step_fn, finish_fn,
                                     max_batch_size = 4,
                                     name = 'llm-churn') as eng:
            # churn: 6 short jobs roll through the 4 slots...
            churn = [eng.submit(np.asarray([i + 1, i + 2], np.int32),
                                max_new_tokens = 3) for i in range(6)]
            for r in churn:
                r.result.get(timeout = 180)
            # ...then the probe must still match offline greedy
            probe = eng.submit(prompt, max_new_tokens = 6)
            assert probe.result.get(timeout = 180)['tokens'] == ref_toks

    def test_streaming_detok_and_stop_condition(self, lm):
        """`on_token` streams text fragments that concatenate to the final
        text; a regex stop_condition ends the row at a chunk boundary."""
        model, params = lm
        tok = _FakeTokenizer()
        start_fn, step_fn, finish_fn = make_transformer_stepper(
            model, params, tok, max_batch = 2, max_length = 64,
            chunk = 2, prompt_multiple = 8)

        frags, ids = [], []
        with ContinuousServingEngine(start_fn, step_fn, finish_fn,
                                     max_batch_size = 2,
                                     name = 'llm-stream') as eng:
            out = eng.infer('hello', max_new_tokens = 20,
                            on_token = lambda f, t: (frags.append(f),
                                                     ids.extend(t)),
                            timeout = 180)
            assert ''.join(frags) == out['text']
            assert ids == out['tokens']
            assert out['first_token_s'] > 0

            # stop on the first letter the greedy head emits
            stop_char = out['text'][0]
            out2 = eng.infer('hello', max_new_tokens = 20,
                             stop_condition = stop_char, timeout = 180)
            # stops at the chunk boundary the pattern first appears in
            assert len(out2['tokens']) < 20
            assert stop_char in out2['text']

    def test_make_llm_engine_facade(self, lm):
        model, params = lm
        eng = make_llm_engine(model, params, max_batch = 2,
                              max_length = 64, chunk = 4,
                              prompt_multiple = 8)
        with eng:
            out = eng.infer(np.asarray([3, 7], np.int32),
                            max_new_tokens = 5, timeout = 180)
        assert out['n_tokens'] == 5

    def test_prompt_validation(self, stepper):
        start_fn, _, _ = stepper
        with pytest.raises(ValueError):
            start_fn(np.arange(70, dtype = np.int32))     # > max_length - 1
        with pytest.raises(ValueError):
            start_fn(np.asarray([], np.int32))
        with pytest.raises(ValueError):
            start_fn('text without tokenizer')


class TestLLMServingDepth:
    """CI-profile tests (extra compiles): mesh sharding + warmup."""

    def test_warmup_then_serve(self, lm):
        model, params = lm
        start_fn, step_fn, finish_fn = make_transformer_stepper(
            model, params, max_batch = 2, max_length = 64, chunk = 4,
            prompt_multiple = 8, max_new_tokens = 4)
        eng = ContinuousServingEngine(start_fn, step_fn, finish_fn,
                                      max_batch_size = 2, name = 'llm-warm')
        eng.warmup(np.asarray([3, 7], np.int32))
        with eng:
            out = eng.infer(np.asarray([3, 7, 11], np.int32), timeout = 180)
        assert out['n_tokens'] == 4

    def test_dp_mesh_stepper_parity(self, lm):
        """Slot axis sharded over an 8-device dp mesh: per-request greedy
        results bit-match the unsharded stepper."""
        from jax.sharding import PartitionSpec as P
        from text_to_speech_tpu.parallel import create_mesh

        model, params = lm
        mesh = create_mesh({'dp': 8}, platform = 'cpu')
        start_fn, step_fn, finish_fn = make_transformer_stepper(
            model, params, max_batch = 8, max_length = 64, chunk = 4,
            prompt_multiple = 8, mesh = mesh)

        prompt = np.asarray([3, 7, 11, 2], np.int32)
        ref = generate(model, params, jnp.asarray(prompt[None]),
                       max_new_tokens = 8)
        ref_toks = np.asarray(ref.tokens)[0, 4:12].tolist()

        with ContinuousServingEngine(start_fn, step_fn, finish_fn,
                                     max_batch_size = 8,
                                     name = 'llm-mesh') as eng:
            reqs = [eng.submit(prompt, max_new_tokens = 8)
                    for _ in range(3)]
            outs = [r.result.get(timeout = 240) for r in reqs]
        for out in outs:
            assert out['tokens'] == ref_toks
        # the device cache really is sharded over dp
        k0 = step_fn._dev['caches'][0]['k']
        assert k0.shape[0] == 8
        assert k0.sharding.spec[0] == 'dp'

"""Token-level LLM serving demo: continuous batching over KV-cache slots.

The reference wraps NVIDIA's TRT-LLM runner for this capability
(``/root/reference/utils/keras/runtimes/tensorrt_llm_runtime.py:36``);
here the same engine that serves TTS streams tokens from the transformer
zoo (`runtimes/llm_serving.py`).

Runs on CPU in a few seconds with a tiny random model (swap in a real
family + `families.load_gpt2` weights for actual text):

    JAX_PLATFORMS=cpu python examples/llm_serving_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np
import jax

from text_to_speech_tpu.models.transformers import Transformer
from text_to_speech_tpu.runtimes.llm_serving import make_llm_engine


class CharTokenizer:
    """Toy tokenizer so the demo streams readable text."""

    def encode(self, text):
        return [1 + (ord(c) - 97) % 26 for c in text.lower() if c.isalpha()] \
            or [1]

    def decode(self, ids):
        return ''.join(chr(97 + (i - 1) % 26) for i in ids)


def main():
    model = Transformer(vocab_size = 30, dim = 32, n_layers = 2,
                        n_heads = 2, ffn_dim = 64, max_position = 128,
                        norm_first = True, positional = 'learned')
    params = model.init(jax.random.PRNGKey(0))
    engine = make_llm_engine(model, params, CharTokenizer(),
                             max_batch = 4, chunk = 4, max_length = 64,
                             prompt_multiple = 8)
    engine.warmup('hello', max_new_tokens = 4)

    with engine:
        # heterogeneous concurrent requests in ONE in-flight batch
        streamed = engine.submit(
            'stream me', max_new_tokens = 24, temperature = 0.9,
            method = 'sample',
            on_token = lambda frag, ids: print(frag, end = '', flush = True))
        greedy = engine.submit('deterministic', max_new_tokens = 12)
        masked = engine.submit('constrained', max_new_tokens = 8,
                               allowed_tokens = range(1, 6))
        out_s = streamed.result.get(timeout = 120)
        out_g = greedy.result.get(timeout = 120)
        out_m = masked.result.get(timeout = 120)

    print('\n--')
    print('streamed : %3d tokens, first in %.3fs: %r' % (
        out_s['n_tokens'], out_s.get('first_token_s', 0.), out_s['text']))
    print('greedy   : %3d tokens: %r' % (out_g['n_tokens'], out_g['text']))
    print('masked   : %3d tokens (ids all < 6: %s): %r' % (
        out_m['n_tokens'], all(t < 6 for t in out_m['tokens']),
        out_m['text']))


if __name__ == '__main__':
    main()

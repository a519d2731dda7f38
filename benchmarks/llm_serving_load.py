"""Token-level LLM serving throughput (`runtimes/llm_serving.py`).

Drives `make_llm_engine` — the TRT-LLM-runner analog
(``/root/reference/utils/keras/runtimes/tensorrt_llm_runtime.py:36``) —
with concurrent generation requests at GPT-2-small scale (random weights;
throughput is weight-agnostic) and reports what a capacity planner needs:
generated tokens/s, requests/s, per-request latency, batch occupancy.

Usage:
    python benchmarks/llm_serving_load.py [--requests 64] [--rate 0]
        [--max-batch 16] [--chunk 8] [--gen-tokens 96] [--reps 3]
        [--dim 768 --layers 12 --heads 12]   # gpt2-small default
"""

import os
import sys
import json
import time
import random
import argparse

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))


def main():
    import _cache
    _cache.enable()
    p = argparse.ArgumentParser()
    p.add_argument('--requests', type = int, default = 64)
    p.add_argument('--rate', type = float, default = 0.,
                   help = 'Poisson offered req/s; 0 = all at once')
    p.add_argument('--max-batch', type = int, default = 16)
    p.add_argument('--chunk', type = int, default = 8)
    p.add_argument('--gen-tokens', type = int, default = 96)
    p.add_argument('--prompt-tokens', type = int, default = 32)
    p.add_argument('--max-length', type = int, default = 256)
    p.add_argument('--dim', type = int, default = 768)
    p.add_argument('--layers', type = int, default = 12)
    p.add_argument('--heads', type = int, default = 12)
    p.add_argument('--vocab', type = int, default = 50257)
    p.add_argument('--reps', type = int, default = 3)
    p.add_argument('--seed', type = int, default = 0)
    args = p.parse_args()

    import jax
    from text_to_speech_tpu.models.transformers import Transformer
    from text_to_speech_tpu.runtimes.llm_serving import make_llm_engine

    model = Transformer(
        vocab_size = args.vocab, dim = args.dim, n_layers = args.layers,
        n_heads = args.heads, ffn_dim = 4 * args.dim,
        max_position = args.max_length, norm_first = True,
        positional = 'learned')
    params = model.init(jax.random.PRNGKey(0))
    n_params = sum(np.size(l) for l in jax.tree_util.tree_leaves(params))
    print('# model: %.1f M params (dim %d, %d layers)' % (
        n_params / 1e6, args.dim, args.layers), flush = True)

    engine = make_llm_engine(
        model, params, max_batch = args.max_batch, chunk = args.chunk,
        max_length = args.max_length,
        prompt_multiple = max(8, args.prompt_tokens))
    rs = np.random.RandomState(args.seed)
    prompts = [rs.randint(1, args.vocab,
                          rs.randint(4, args.prompt_tokens + 1)).astype(
                              np.int32)
               for _ in range(args.requests)]
    warm = engine.warmup(prompts[0], max_new_tokens = args.chunk)
    print('# warmup: %.1f s' % warm, flush = True)

    cells = []
    for rep in range(args.reps):
        rng = random.Random(args.seed + 1000 * rep)
        for key in ('step_s', 'admit_s', 'finish_s', 'rows_stepped',
                    'chunks'):
            engine.stats[key] = type(engine.stats[key])()
        engine.stats['latencies'].clear()
        with engine:
            t0 = time.perf_counter()
            pending = []
            for prompt in prompts:
                pending.append(engine.submit(
                    prompt, max_new_tokens = args.gen_tokens))
                if args.rate > 0:
                    time.sleep(rng.expovariate(args.rate))
            outs = [r.result.get(timeout = 600) for r in pending]
            elapsed = time.perf_counter() - t0
        new_tokens = sum(o['n_tokens'] for o in outs)
        lat = sorted(engine.stats['latencies'])
        chunks = max(1, engine.stats['chunks'])
        cells.append({
            'metric': 'llm_serving_tokens_per_s',
            'value': round(new_tokens / elapsed, 1),
            'unit': 'tokens/s',
            'requests': args.requests,
            'offered_rate': args.rate,
            'requests_per_s': round(args.requests / elapsed, 2),
            'gen_tokens': args.gen_tokens,
            'elapsed_s': round(elapsed, 2),
            'latency_p50_s': round(lat[len(lat) // 2], 3) if lat else None,
            'latency_p95_s': round(lat[(95 * len(lat)) // 100], 3)
                if lat else None,
            'max_batch': args.max_batch,
            'chunk': args.chunk,
            'occupancy': round(
                engine.stats['rows_stepped']
                / (chunks * args.max_batch), 3),
            'loop': {k: round(engine.stats[k], 2)
                     for k in ('step_s', 'admit_s', 'finish_s')},
        })
        print(json.dumps(cells[-1]), flush = True)
    best = sorted(cells, key = lambda c: c['value'])[len(cells) // 2]
    best = dict(best, reps = [c['value'] for c in cells])
    print(json.dumps(best), flush = True)


if __name__ == '__main__':
    main()

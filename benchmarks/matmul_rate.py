"""Pure MXU rate microbench: int8 x int8 -> int32 vs bf16 matmuls in a
Pallas kernel at the WN-block shapes, to establish the real achievable
ceiling for the int8 serving kernel (nominal v5e: 197 TFLOP/s bf16,
394 TOPS int8)."""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

M = int(os.environ.get('MM_M', 512))
K = int(os.environ.get('MM_K', 512))
N = int(os.environ.get('MM_N', 1024))
REPS = int(os.environ.get('MM_REPS', 64))      # matmuls per grid step
GRID = int(os.environ.get('MM_GRID', 64))
ITERS = 4


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    cpu = jax.devices('cpu')[0]
    tpu = jax.devices()[0]

    def kernel(x_ref, w_ref, o_ref, *, dtype, acc_dtype):
        x = x_ref[:]
        acc = jnp.zeros((M, N), acc_dtype)
        for r in range(REPS):
            acc = acc + jnp.dot(x, w_ref[r % 8],
                                preferred_element_type = acc_dtype)
            # feed the result back cheaply so reps cannot be elided
            x = (acc[:, :K] & 127).astype(dtype) if acc_dtype == jnp.int32 \
                else acc[:, :K].astype(dtype)
        o_ref[:] = acc

    def build(dtype, acc_dtype):
        whole = lambda shape: pl.BlockSpec(
            shape, lambda g: (0,) * len(shape), memory_space = pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(kernel, dtype = dtype, acc_dtype = acc_dtype),
            grid = (GRID,),
            in_specs = [whole((M, K)), whole((8, K, N))],
            out_specs = whole((M, N)),
            out_shape = jax.ShapeDtypeStruct((M, N), acc_dtype),
        )

    for name, dtype, acc in [('int8', jnp.int8, jnp.int32),
                             ('bf16', jnp.bfloat16, jnp.float32)]:
        with jax.default_device(cpu):
            if dtype == jnp.int8:
                x = jnp.ones((M, K), jnp.int8)
                w = jnp.ones((8, K, N), jnp.int8)
            else:
                x = jnp.ones((M, K), jnp.bfloat16)
                w = jnp.ones((8, K, N), jnp.bfloat16) * 0.01
        x, w = jax.device_put((x, w), tpu)
        fn = jax.jit(lambda x, w: jnp.sum(build(dtype, acc)(x, w)
                                          .astype(jnp.float32)))
        try:
            float(fn(x, w))
            float(fn(x, w))
            start = time.perf_counter()
            for _ in range(ITERS):
                out = fn(x, w)
            float(out)
            t = (time.perf_counter() - start) / ITERS
            ops = 2.0 * M * K * N * REPS * GRID
            print('{}: {:.4f}s  -> {:.0f} T{}/s'.format(
                name, t, ops / t / 1e12, 'OPS' if acc == jnp.int32 else 'FLOP'),
                flush = True)
        except Exception as e:
            print('{}: FAILED {}'.format(name, str(e)[:200]), flush = True)


if __name__ == '__main__':
    main()

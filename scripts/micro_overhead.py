"""Measure per-call / per-output-buffer dispatch overhead on this backend."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")


def timeit(name, fn, *args, n=100):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1e3:8.3f} ms", flush=True)
    return out


def main():
    x = jnp.ones((1 << 18, 16), jnp.float32)

    timeit("1 output  [262k,16]", jax.jit(lambda a: a + 1.0), x)
    timeit("4 outputs [262k,16]",
           jax.jit(lambda a: (a + 1, a + 2, a + 3, a + 4)), x)
    timeit("16 outputs [262k]",
           jax.jit(lambda a: tuple(a[:, i] + i for i in range(16))), x)
    timeit("32 outputs [262k]",
           jax.jit(lambda a: tuple(a[:, i % 16] + i for i in range(32))), x)
    timeit("1 output, 30 chained adds",
           jax.jit(lambda a: sum(a + i for i in range(30))), x)
    # scalar output
    timeit("1 scalar output", jax.jit(lambda a: jnp.sum(a)), x)


if __name__ == "__main__":
    main()

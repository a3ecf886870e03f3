"""Dispatch-floor probe: how much does one dependent jitted call cost on
this backend regardless of compute? Chains N tiny dependent calls and one
value-fetch sync (block_until_ready is unreliable on the remote tunnel)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    @jax.jit
    def tiny(x):
        return x * 1.000001 + 0.5

    x = jnp.ones((8, 128), jnp.float32)
    for _ in range(5):
        x = tiny(x)
    float(x[0, 0])

    for n in (30, 60):
        x = jnp.ones((8, 128), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n):
            x = tiny(x)
        float(x[0, 0])
        dt = time.perf_counter() - t0
        print(f"tiny x{n}: {dt/n*1e3:.3f} ms/call")

    # medium-size state threading (mimics SlamState traffic shape)
    @jax.jit
    def med(state):
        return jax.tree.map(lambda a: a + 1.0, state)

    state = {"a": jnp.zeros((1 << 21, 16)), "b": jnp.zeros((1 << 18, 16)),
             "c": jnp.zeros((64, 900, 3))}
    for _ in range(3):
        state = med(state)
    float(state["c"][0, 0, 0])
    t0 = time.perf_counter()
    n = 30
    for _ in range(n):
        state = med(state)
    float(state["c"][0, 0, 0])
    print(f"big-state passthrough x{n}: {(time.perf_counter()-t0)/n*1e3:.3f} "
          f"ms/call")


if __name__ == "__main__":
    main()

"""Honest primitive-op costs at the flagship operating point.

Each op is wrapped so its output feeds the next call's input (forces
sequential execution) and the final sync is a SCALAR fetch — the two rules
for trustworthy timings on the remote-TPU tunnel (block_until_ready returns
early; fetching big leaves measures tunnel bandwidth, not compute).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

A = 1 << 18          # active view rows
HW = 64 * 900        # image cells
NB, BS = 1 << 10, 2048   # arena blocks


def bench(name, fn, state, n=40):
    fn = jax.jit(fn)
    state = fn(state)
    state = fn(state)
    jax.tree.map(lambda a: float(a.ravel()[0]), state)
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state)
    jax.tree.map(lambda a: float(a.ravel()[0]), state)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    which = set(sys.argv[1:]) if len(sys.argv) > 1 else None

    def want(k):
        return which is None or k in which

    key = jax.random.PRNGKey(0)
    kk = jax.random.randint(key, (A,), 0, 1 << 30, jnp.int32)
    pay = jnp.arange(A, dtype=jnp.int32)

    if want("sort2"):
        def f(s):
            k2, p2 = jax.lax.sort((s[0], s[1]), num_keys=1)
            return (k2 ^ 1, p2)
        bench("lax.sort 262k (key+payload)", f, (kk, pay))

    if want("sort1"):
        def f(s):
            return (jax.lax.sort(s[0]) ^ 1,)
        bench("lax.sort 262k key-only", f, (kk,))

    if want("sort_hw"):
        kh = jax.random.randint(key, (HW,), 0, 1 << 30, jnp.int32)
        def f(s):
            k2, p2 = jax.lax.sort((s[0], s[1]), num_keys=1)
            return (k2 ^ 1, p2)
        bench("lax.sort 57.6k (key+payload)", f,
              (kh, jnp.arange(HW, dtype=jnp.int32)))

    if want("sort128"):
        k1 = jax.random.randint(key, (1 << 17,), 0, 1 << 30, jnp.int32)
        def f(s):
            k2, p2 = jax.lax.sort((s[0], s[1]), num_keys=1)
            return (k2 ^ 1, p2)
        bench("lax.sort 131k (key+payload)", f,
              (k1, jnp.arange(1 << 17, dtype=jnp.int32)))

    if want("gather_small_rows"):
        img = jax.random.normal(key, (HW, 10))
        pid = jax.random.randint(key, (A,), 0, HW, jnp.int32)
        def f(s):
            g = s[0][s[1]]
            return (s[0] + g[0, 0] * 1e-9, (s[1] + 1) % HW)
        bench("gather [262k,10] rows from [57600,10]", f, (img, pid))

    if want("gather_big_rows"):
        big = jax.random.normal(key, (A, 16))
        w = jax.random.randint(key, (HW,), 0, A, jnp.int32)
        def f(s):
            g = s[0][s[1]]
            return (s[0] + g[0, 0] * 1e-9, (s[1] + 1) % A)
        bench("gather [57600,16] rows from [262k,16]", f, (big, w))

    if want("scatter_rows"):
        dst = jnp.zeros((HW, 20))
        src = jax.random.normal(key, (HW, 20))
        slots = jax.random.permutation(key, HW).astype(jnp.int32)
        def f(s):
            d = s[0].at[s[1]].set(s[2], mode="drop", unique_indices=True)
            return (d, (s[1] + 1) % HW, s[2])
        bench("scatter-set unique [57600]->[57600,20]", f, (dst, slots, src))

    if want("searchsorted"):
        create = jax.random.bernoulli(key, 0.25, (HW,))
        def f(s):
            cs = jnp.cumsum(s[0].astype(jnp.int32))
            src = jnp.searchsorted(cs, jnp.arange(HW, dtype=jnp.int32) + 1)
            return (jnp.roll(s[0], src[0] % 7 + 1),)
        bench("cumsum+searchsorted compact-index 57600", f, (create,))

    if want("take_compact"):
        big = jax.random.normal(key, (HW, 20))
        create = jax.random.bernoulli(key, 0.25, (HW,))
        def f(s):
            cs = jnp.cumsum(s[1].astype(jnp.int32))
            src = jnp.searchsorted(cs, jnp.arange(HW, dtype=jnp.int32) + 1)
            g = s[0][jnp.minimum(src, HW - 1)]
            return (s[0] + g[0, 0] * 1e-9, jnp.roll(s[1], 1))
        bench("searchsorted-gather compaction 57600x20", f, (big, create))

    if want("elem_pass"):
        v = jax.random.normal(key, (A, 16))
        def f(s):
            return (s[0] * 1.0000001 + 0.1,)
        bench("elementwise pass [262k,16]", f, (v,))

    if want("dus"):
        view = jnp.zeros((A, 16))
        blk = jax.random.normal(key, (14400, 16))
        def f(s):
            off = (s[2] * 997) % (A - 14400)
            v = jax.lax.dynamic_update_slice(s[0], s[1], (off, 0))
            return (v, s[1], s[2] + 1)
        bench("DUS [14400,16] into [262k,16] dyn-offset", f,
              (view, blk, jnp.asarray(0, jnp.int32)))

    if want("block_scatter"):
        arena = jnp.zeros((NB, BS, 16))
        vw = jax.random.normal(key, (128, BS, 16))
        ids = (jnp.arange(128, dtype=jnp.int32) * 7) % NB
        def f(s):
            a = s[0].at[s[1]].set(s[2], mode="drop", unique_indices=True)
            return (a, (s[1] + 1) % NB, s[2])
        bench("block scatter [128,2048,16] into arena", f, (arena, ids, vw))

    if want("block_gather"):
        arena = jax.random.normal(key, (NB, BS, 16))
        ids = (jnp.arange(128, dtype=jnp.int32) * 7) % NB
        def f(s):
            g = s[0][s[1]]
            return (s[0] + g[0, 0, 0] * 1e-9, (s[1] + 1) % NB)
        bench("block gather [128] blocks from arena", f, (arena, ids))

    if want("arena_score"):
        arena = jax.random.normal(key, (NB, BS, 3))
        c = jnp.ones((3,))
        def f(s):
            d = jnp.linalg.norm(s[0] - s[1], axis=-1)
            dmin = jnp.min(d, axis=1)
            _, top = jax.lax.top_k(-dmin, 85)
            return (s[0] * 1.0000001, s[1] + top[0] * 1e-9)
        bench("arena block scoring+topk [1024,2048,3]", f, (arena, c))

    if want("trans"):
        v = jax.random.uniform(key, (A,), minval=-0.99, maxval=0.99)
        def f(s):
            return (jnp.sin(jnp.arccos(s[0])) * 0.99,)
        bench("acos+sin pass [262k]", f, (v,))

    if want("cumsum_a"):
        v = jnp.ones((A,), jnp.int32)
        def f(s):
            return (jnp.cumsum(s[0]) % 3 + 1,)
        bench("cumsum [262k] int32", f, (v,))

    if want("cummax"):
        v = jax.random.randint(key, (A,), 0, 1 << 20, jnp.int32)
        def f(s):
            return (jax.lax.cummax(s[0]) % (1 << 20),)
        bench("cummax [262k] int32", f, (v,))


if __name__ == "__main__":
    main()


def extra():
    key = jax.random.PRNGKey(0)
    which = set(sys.argv[2:]) if len(sys.argv) > 2 else None

    def want(k):
        return which is None or k in which

    if want("scatter1d_big"):
        # the zbuffer winner scatter: [262k] source, unique, most dropped
        ids = jax.random.randint(key, (A,), 0, HW + 1, jnp.int32)
        pay = jnp.arange(A, dtype=jnp.int32)
        def f(s):
            w = jnp.full((HW,), -1, jnp.int32).at[s[0]].set(
                s[1], mode="drop", unique_indices=True)
            return ((s[0] + w[0] % 2 + 1) % (HW + 1), s[1])
        bench("1-D unique scatter [262k]->[57600]", f, (ids, pay))

    if want("scatter1d_small"):
        ids = jax.random.permutation(key, HW).astype(jnp.int32)
        pay = jnp.arange(HW, dtype=jnp.int32)
        def f(s):
            w = jnp.full((HW,), -1, jnp.int32).at[s[0]].set(
                s[1], mode="drop", unique_indices=True)
            return ((s[0] + w[0] % 2 + 1) % HW, s[1])
        bench("1-D unique scatter [57600]->[57600]", f, (ids, pay))

    if want("scatter_max"):
        # the 'integrated' flags scatter: colliding scatter-max from [262k]
        ids = jax.random.randint(key, (A,), 0, HW + 1, jnp.int32)
        def f(s):
            w = jnp.zeros((HW,), jnp.int32).at[s[0]].max(1, mode="drop")
            return ((s[0] + w[0] + 1) % (HW + 1),)
        bench("colliding scatter-max [262k]->[57600]", f, (ids,))

    if want("sort_compact"):
        # creation compaction via sort instead of put-scatter
        create = jax.random.bernoulli(key, 0.25, (HW,))
        rows = jax.random.normal(key, (HW, 20))
        def f(s):
            create, rows = s
            k2 = jnp.where(create, 0, 1).astype(jnp.int32)
            _, perm = jax.lax.sort(
                (k2, jnp.arange(HW, dtype=jnp.int32)), num_keys=1)
            out = rows[perm]
            return (jnp.roll(create, 1), rows + out[0, 0] * 1e-9)
        bench("sort-compact 57600x20 (stable sort+gather)", f, (create, rows))

    if want("put_split"):
        # the actual put: two scatters 16f + 4i
        dstf = jnp.zeros((HW, 16)); dsti = jnp.zeros((HW, 4), jnp.int32)
        srcf = jax.random.normal(key, (HW, 16))
        srci = jnp.ones((HW, 4), jnp.int32)
        slots = jax.random.permutation(key, HW).astype(jnp.int32)
        def f(s):
            df = s[0].at[s[2]].set(srcf, mode="drop", unique_indices=True)
            di = s[1].at[s[2]].set(srci, mode="drop", unique_indices=True)
            return (df, di, (s[2] + 1) % HW)
        bench("put pattern: scatter 57600x16f + x4i", f, (dstf, dsti, slots))


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "extra":
    extra()


def extra2():
    key = jax.random.PRNGKey(0)
    # sorted-indices variants of the run-start scatter
    ids = jnp.sort(jax.random.randint(key, (A,), 0, HW, jnp.int32))
    pos = jnp.arange(A, dtype=jnp.int32)

    def f1(s):
        w = jnp.full((HW,), A, jnp.int32).at[s[0]].min(
            pos, mode="drop", indices_are_sorted=True)
        return ((s[0] + (w[0] & 1)) % HW,)
    bench("scatter-min sorted-idx [262k]->[57600]", f1, (ids,))

    def f2(s):
        w = jax.ops.segment_min(pos, s[0], num_segments=HW,
                                indices_are_sorted=True)
        return ((s[0] + (w[0] & 1)) % HW,)
    bench("segment_min sorted [262k]->[57600]", f2, (ids,))

    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), ids[:-1]])
    def f3(s):
        isf = s[0] != jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), s[0][:-1]])
        sa = jnp.where(isf, s[0], HW)
        w = jnp.full((HW,), A, jnp.int32).at[sa].set(
            pos, mode="drop", unique_indices=True)
        return ((s[0] + (w[0] & 1)) % HW,)
    bench("is-first unique scatter [262k]->[57600]", f3, (ids,))


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "extra2":
    extra2()

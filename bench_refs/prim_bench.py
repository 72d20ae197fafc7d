"""Microbenchmark of XLA primitives for the pair-compaction traversal:
per-op cost = (time at ITERS=96 - time at ITERS=32) / 64, differencing
out the ~0.25 s tunnel sync and dispatch overheads."""
import time
import jax
import jax.numpy as jnp


def timed(name, build):
    res = {}
    for iters in (32, 96):
        f = jax.jit(build(iters))
        f().block_until_ready()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            f().block_until_ready()
            best = min(best, time.time() - t0)
        res[iters] = best
    per = (res[96] - res[32]) / 64
    print(f"{name:40s} {per*1e3:8.3f} ms/op")


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)

    for n in (262_144, 1 << 20, 4 << 20):
        x = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)

        def mk_sort(iters, x=x):
            def f():
                def body(i, c):
                    return jnp.roll(jax.lax.sort(c ^ (i * 1000003)), 17)
                return jax.lax.fori_loop(0, iters, body, x)
            return f

        timed(f"sort_vals n={n}", mk_sort)

        def mk_argsort(iters, x=x):
            def f():
                def body(i, c):
                    return c[jnp.argsort(c)] ^ (i * 1000003)
                return jax.lax.fori_loop(0, iters, body, x)
            return f

        timed(f"argsort n={n}", mk_argsort)

    n = 1 << 20
    perm = jax.random.permutation(key, n).astype(jnp.int32)

    def mk_scat(iters):
        def f():
            vals = jnp.arange(n, dtype=jnp.int32)
            def body(i, c):
                return (jnp.zeros((n,), jnp.int32).at[c].set(vals) + i) % n
            return jax.lax.fori_loop(0, iters, body, perm)
        return f

    timed("scatter_perm_set n=1M i32", mk_scat)

    idx4 = jax.random.randint(key, (n,), 0, n, dtype=jnp.int32)

    def mk_scatmin(iters):
        def f():
            def body(i, c):
                return jnp.full((n,), 1 << 30, jnp.int32).at[idx4].min(c) ^ i
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.arange(n, dtype=jnp.int32))
        return f

    timed("scatter_min n=1M i32", mk_scatmin)

    rt, c = 65_536, 576
    m = jax.random.uniform(key, (rt, c))

    def mk_topk(iters):
        def f():
            def body(i, x):
                v, _ = jax.lax.top_k(x, 8)
                return x.at[:, 0].set(v[:, 7] + i)
            return jax.lax.fori_loop(0, iters, body, m)
        return f

    timed(f"top_k8 [{rt},{c}]", mk_topk)

    o = jax.random.uniform(key, (rt, 3))
    b = jax.random.uniform(key, (c, 6))

    def mk_slab(iters):
        def f():
            def body(i, o):
                lo = b[None, :, :3] - o[:, None, :]
                hi = b[None, :, 3:] - o[:, None, :]
                tn = jnp.minimum(lo, hi).max(-1)
                tf = jnp.maximum(lo, hi).min(-1)
                cnt = jnp.sum((tf >= tn) & (tn < 1.0), axis=1)
                return o.at[:, 0].add(cnt.astype(jnp.float32) * 1e-12)
            return jax.lax.fori_loop(0, iters, body, o)
        return f

    timed(f"slab [{rt},{c}]", mk_slab)

    src = jax.random.uniform(key, (1 << 20, 16))
    g0 = jax.random.randint(key, (1 << 20,), 0, 1 << 20, dtype=jnp.int32)

    def mk_gath(iters):
        def f():
            def body(i, gidx):
                rows = src[gidx]
                return (gidx + rows[:, 0].astype(jnp.int32) + 1) & ((1 << 20) - 1)
            return jax.lax.fori_loop(0, iters, body, g0)
        return f

    timed("gather [1M,16] f32", mk_gath)

    def mk_csum(iters):
        def f():
            def body(i, c):
                return jnp.cumsum(c) % 977
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.ones((1 << 20,), jnp.int32))
        return f

    timed("cumsum n=1M i32", mk_csum)


if __name__ == "__main__":
    main()

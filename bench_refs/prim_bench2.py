"""Decisive primitives for the pair pipeline: kv-sort, scatter, top_k."""
import time
import jax
import jax.numpy as jnp

ITERS = 96


def timed(name, f):
    f = jax.jit(f)
    jax.block_until_ready(f())
    print(f"{name}: compiled", flush=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(f())
        best = min(best, time.time() - t0)
    print(f"{name:36s} {(best)/ITERS*1e3:8.3f} ms/op (incl ~0.3s/{ITERS} sync)",
          flush=True)


key = jax.random.PRNGKey(0)
n = 1 << 20

x = jax.random.randint(key, (n,), 0, 1 << 10, dtype=jnp.int32)
pay = jnp.arange(n, dtype=jnp.int32)


def kv_sort():
    def body(i, c):
        k, v = c
        ks, vs = jax.lax.sort((k ^ (i * 7919), v), num_keys=1)
        return ks, vs
    return jax.lax.fori_loop(0, ITERS, body, (x, pay))


timed("kv_sort n=1M (10-bit keys)", kv_sort)

perm = jax.random.permutation(key, n).astype(jnp.int32)


def scat():
    def body(i, c):
        return (jnp.zeros((n,), jnp.int32).at[c].set(pay) + i) % n
    return jax.lax.fori_loop(0, ITERS, body, perm)


timed("scatter_perm_set n=1M", scat)

rt, cc = 262_144, 128
m = jax.random.uniform(key, (rt, cc))


def topk():
    def body(i, x):
        v, _ = jax.lax.top_k(x, 4)
        return x.at[:, 0].set(v[:, 3] + i)
    return jax.lax.fori_loop(0, ITERS, body, m)


timed("top_k4 [262144,128]", topk)

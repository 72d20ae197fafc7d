"""Microbench XLA primitives on the v5e that the pair pipeline leans
on: sorts (various widths/sizes), top_k, cumsum, searchsorted,
histogram-by-matmul.  These numbers drive the traversal design."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, f, *args):
    r = jax.block_until_ready(jax.jit(f)(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(jax.jit(f)(*args))
        best = min(best, time.time() - t0)
    print(f"{name:44s} {best*1e3:9.2f} ms")
    return r


key = jax.random.PRNGKey(0)
for n in (1 << 20, 1 << 22, 1 << 23):
    k32 = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
    v32 = jnp.arange(n, dtype=jnp.int32)
    f1 = jax.random.uniform(key, (n,))
    timeit(f"sort u32x1        n={n}", lambda a: jnp.sort(a), k32)
    timeit(f"sort (u32,u32)    n={n}",
           lambda a, b: jax.lax.sort((a, b), num_keys=1), k32, v32)
    timeit(f"sort (u32,f32,u32) n={n}",
           lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1),
           k32, f1, v32)
    timeit(f"argsort u32       n={n}", lambda a: jnp.argsort(a), k32)
    timeit(f"cumsum f32        n={n}", lambda a: jnp.cumsum(a), f1)
    timeit(f"searchsorted 1M q n={n}",
           lambda t, q: jnp.searchsorted(jnp.sort(t), q),
           k32, k32[: 1 << 20])

# histogram via one-hot matmul: P pairs into C buckets
for (p, c) in ((1 << 19, 800), (1 << 21, 800)):
    cid = jax.random.randint(key, (p,), 0, c, dtype=jnp.int32)

    def hist_mm(cid):
        oh = (cid[:, None] == jnp.arange(c, dtype=jnp.int32)).astype(
            jnp.bfloat16
        )
        return jnp.sum(oh, axis=0, dtype=jnp.float32)

    timeit(f"onehot-hist P={p} C={c}", hist_mm, cid)

    def blocked_rank(cid):
        # rank of each element within its bucket (blocked cumsum)
        b = 1 << 14
        oh = (
            cid.reshape(-1, b)[..., None]
            == jnp.arange(c, dtype=jnp.int32)
        ).astype(jnp.float32)  # [nb, b, C]
        loc = jnp.cumsum(oh, axis=1)
        tot = loc[:, -1]  # [nb, C]
        carry = jnp.cumsum(tot, axis=0) - tot
        rank = (
            jnp.take_along_axis(
                loc, cid.reshape(-1, b)[..., None], axis=2
            )[..., 0]
            - 1.0
            + jnp.take_along_axis(
                carry, cid.reshape(-1, b)[..., None], axis=2
            )[..., 0]
        )
        return rank

    timeit(f"blocked-rank P={p} C={c}", blocked_rank, cid)

# the dense culling pattern: [R, B] slab + k-smallest
r, b = 1 << 18, 128
lo = jax.random.uniform(key, (b, 3))
hi = lo + 0.1
o = jax.random.uniform(key, (r, 3))
d = jax.random.normal(key, (r, 3))


def cull(o, d):
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    t0 = (lo[None] - o[:, None, :]) * inv[:, None, :]
    t1 = (hi[None] - o[:, None, :]) * inv[:, None, :]
    tn = jnp.minimum(t0, t1).max(-1)
    tf = jnp.maximum(t0, t1).min(-1)
    hit = tf >= jnp.maximum(tn, 0.0)
    key_ = jnp.where(hit, tn, 1e30)
    vals, idxs = [], []
    kk = key_
    cols = jnp.arange(b, dtype=jnp.int32)
    for _ in range(4):
        m = jnp.min(kk, axis=-1)
        i = jnp.argmin(kk, axis=-1).astype(jnp.int32)
        vals.append(m)
        idxs.append(i)
        kk = jnp.where(cols[None] == i[:, None], 1e30, kk)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


timeit(f"dense slab+top4 R={r} B={b}", cull, o, d)
timeit(f"lax.top_k(4) [R,128]",
       lambda x: jax.lax.top_k(x, 4), jax.random.uniform(key, (r, b)))

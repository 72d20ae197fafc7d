#!/usr/bin/env python
"""In-jit microbench of pair-queue sort strategies (accel/pairs.py).

The pair queue is the pipeline's dominant cost (6.7 ms / 262k-ray tile
measured for the current 9-operand lax.sort).  Candidates:

  a) current: sort (cid, slot, o3, d3, tmax) — 9 operands x R*K
  b) packed:  sort ONE int32 key (cid << 20 | slot), slice to p_cap,
     then row-gather the 7 ray floats for p_cap rows only
  c) K=2:     the 9-operand sort over R*2 instead of R*3

Each timed inside one jit with a 20-iter fori (data-dependent salt) so
the ~6 ms dispatch floor and the 0.25 s tunnel sync are amortized.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

R = 1 << 18
ITERS = 20


def timed(fn, *args):
    f = jax.jit(fn)
    f(*args).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        f(*args).block_until_ready()
        best = min(best, time.time() - t0)
    return best / ITERS * 1e3


def loop(body, init):
    def fn(*args):
        def it(i, carry):
            return body(i, carry, *args)
        return jax.lax.fori_loop(0, ITERS, it, init(*args))
    return fn


def main():
    key = jax.random.PRNGKey(0)
    o = jax.random.normal(key, (R, 3), jnp.float32)
    d = jax.random.normal(jax.random.PRNGKey(1), (R, 3), jnp.float32)
    tm = jnp.full((R,), 1e9, jnp.float32)

    for kk in (3, 2):
        n = R * kk
        cid = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, 1100
                                 ).astype(jnp.int32)
        slot = jnp.arange(n, dtype=jnp.int32)
        p_cap = (int(R * 1.25) // 256) * 256

        def rep(x):
            return jnp.broadcast_to(x[:, None], (R, kk)).reshape(-1)

        vals = [rep(o[:, 0]), rep(o[:, 1]), rep(o[:, 2]),
                rep(d[:, 0]), rep(d[:, 1]), rep(d[:, 2]), rep(tm)]

        # (a) 9-operand sort
        def body_a(i, acc, cid, slot, *vals):
            out = jax.lax.sort((cid + i, slot, *vals), num_keys=1)
            return acc + sum(jnp.sum(v) for v in out[2:]) * 1e-9 \
                + jnp.sum(out[1]).astype(jnp.float32) * 1e-9

        ta = timed(loop(body_a, lambda *a: jnp.float32(0)),
                   cid, slot, *vals)

        # (b) packed 1-operand sort + p_cap row gather
        rays = jnp.stack(vals, axis=-1)  # [n, 7] (pair-major table)

        def body_b(i, acc, cid, rays):
            packed = ((cid + i) << 20) | jnp.arange(n, dtype=jnp.int32)
            s = jax.lax.sort(packed)[:p_cap]
            slot_s = s & ((1 << 20) - 1)
            rq = rays[slot_s]  # [p_cap, 7]
            return acc + jnp.sum(rq) * 1e-9

        tb = timed(loop(body_b, lambda *a: jnp.float32(0)), cid, rays)

        # (b2) packed sort + gather from [R, 7] by slot//kk
        rays_r = jnp.concatenate([o, d, tm[:, None]], axis=-1)  # [R,7]

        def body_b2(i, acc, cid, rays_r):
            packed = ((cid + i) << 20) | jnp.arange(n, dtype=jnp.int32)
            s = jax.lax.sort(packed)[:p_cap]
            slot_s = s & ((1 << 20) - 1)
            rq = rays_r[slot_s // kk]
            return acc + jnp.sum(rq) * 1e-9

        tb2 = timed(loop(body_b2, lambda *a: jnp.float32(0)),
                    cid, rays_r)

        # (b3) packed sort + 7 per-column 1D gathers (column-major
        # ray table: gathers along a flat [R] axis per component)
        cols = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                tm]

        def body_b3(i, acc, cid, *cols):
            packed = ((cid + i) << 20) | jnp.arange(n, dtype=jnp.int32)
            s = jax.lax.sort(packed)[:p_cap]
            ridx = (s & ((1 << 20) - 1)) // kk
            acc2 = acc
            for cx in cols:
                acc2 = acc2 + jnp.sum(cx[ridx]) * 1e-9
            return acc2

        tb3 = timed(loop(body_b3, lambda *a: jnp.float32(0)),
                    cid, *cols)

        # (c) 2-operand sort only (cid, slot), no ray data at all
        def body_c(i, acc, cid, slot):
            out = jax.lax.sort((cid + i, slot), num_keys=1)
            return acc + jnp.sum(out[1]).astype(jnp.float32) * 1e-9

        tc = timed(loop(body_c, lambda *a: jnp.float32(0)), cid, slot)

        print(f"K={kk}  n={n}")
        print(f"  (a) 9-op sort                 {ta:7.2f} ms")
        print(f"  (b) packed sort + [n,7] gather{tb:7.2f} ms")
        print(f"  (b2) packed sort + [R,7] gthr {tb2:7.2f} ms")
        print(f"  (b3) packed sort + 7x1D gthr  {tb3:7.2f} ms")
        print(f"  (c) 2-op sort, no payload     {tc:7.2f} ms")


if __name__ == "__main__":
    main()

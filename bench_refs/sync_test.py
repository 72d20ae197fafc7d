import time, jax, jax.numpy as jnp, numpy as np
x = jax.random.randint(jax.random.PRNGKey(0), (4<<20,), 0, 1<<30, dtype=jnp.int32)

def body(c, i):
    s = jax.lax.sort(c ^ (i * 1000003))
    return jnp.roll(s, 17)

f = jax.jit(lambda x: jax.lax.fori_loop(0, 64, lambda i, c: body(c, i), x))
r = f(x); _ = np.asarray(r)  # compile + hard sync
for tag in ("bur", "np"):
    t0 = time.time()
    r = f(x)
    if tag == "bur":
        r.block_until_ready()
    else:
        _ = np.asarray(r)
    print(tag, f"{time.time()-t0:.4f} s for 64x sort(4M)")
t0 = time.time(); _ = np.asarray(f(x)); print("np2", f"{time.time()-t0:.4f}")

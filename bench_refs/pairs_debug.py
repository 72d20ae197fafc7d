"""Compare pair-culling stages TPU vs CPU on a few bunny rays."""
import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.accel import pairs as prs
from mitsuba_tpu.core import rng, warp
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.scene.xml_loader import load_scene

N = 128
scene = load_scene("scenes/bunny.xml")
pack = pack_scene(scene)

lo = np.asarray(pack.tri_v0[: pack.n_tris]).min(axis=0)
hi = np.asarray(pack.tri_v0[: pack.n_tris]).max(axis=0)
center = (lo + hi) / 2
radius = float(np.linalg.norm(hi - lo) / 2 * 1.3)
u = rng.rand4(jnp.arange(N, dtype=jnp.uint32), 0, 0)
p1 = warp.square_to_uniform_sphere(u[..., 0:2]) * radius + center
p2 = warp.square_to_uniform_sphere(u[..., 2:4]) * radius + center
d = p2 - p1
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
o = p1
t_max = jnp.full((N,), prs.BIG, jnp.float32)


def stages(o, d, tmax):
    cl_sup = pack.cl_sup
    g = pack.meta["cluster_super_g"]
    ks = min(prs.KS, pack.meta["n_supers"])
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    sup_lo = cl_sup[0:3].T[None]
    sup_hi = cl_sup[3:6].T[None]
    hit_s, ent_s = prs._slab_entry(o, d, inv, tmax, sup_lo, sup_hi)
    key_s = jnp.where(hit_s, ent_s, prs.BIG)
    ent_sup_kept, sid = prs._k_smallest(key_s, ks)
    boxq = pack.cl_boxq
    sid_c = jnp.minimum(sid, boxq.shape[0] - 1)
    r = o.shape[0]
    qm = boxq[sid_c]
    slo = cl_sup[0:3].T[sid_c][:, :, None, :]
    ext = jnp.maximum(
        cl_sup[3:6].T[sid_c] - cl_sup[0:3].T[sid_c], 1e-30
    )[:, :, None, :] * (1.0 / 255.0)

    def dq(word):
        return jnp.stack(
            [
                (word & 0xFF).astype(jnp.float32),
                ((word >> 8) & 0xFF).astype(jnp.float32),
                ((word >> 16) & 0xFF).astype(jnp.float32),
            ],
            axis=-1,
        )

    lo_c = (slo + dq(qm[..., 0]) * ext).reshape(r, ks * g, 3)
    hi_c = (slo + dq(qm[..., 1]) * ext).reshape(r, ks * g, 3)
    hit_c, ent_c = prs._slab_entry(o, d, inv, tmax, lo_c, hi_c)
    return (
        hit_s.sum(-1), sid, ent_sup_kept, qm.reshape(r, -1),
        lo_c, hi_c, hit_c.sum(-1),
    )


f = jax.jit(stages)
outs = [np.asarray(x) for x in f(o, d, t_max)]
names = ["n_sup", "sid", "ent_kept", "qm", "lo_c", "hi_c", "n_cl"]
for nm, x in zip(names, outs):
    print(nm, x.dtype, x.shape, "sum", np.float64(np.sum(np.where(np.isfinite(x.astype(np.float64)), x.astype(np.float64), 0))))
np.savez("/tmp/pairs_dbg_" + jax.devices()[0].platform + ".npz",
         **{nm: x for nm, x in zip(names, outs)})
print("platform", jax.devices()[0].platform)

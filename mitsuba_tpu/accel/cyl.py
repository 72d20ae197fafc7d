"""Analytic miter-clipped cylinder segments (hair fibers, cylinders).

Rebuild of the reference's exact segment intersection
(src/shapes/hair.cpp HairKDTree::intersect:485-542,
src/shapes/cylinder.cpp rayIntersect): project the ray into the
subspace normal to the segment axis, solve the circle quadratic, keep
the nearer root whose hit point lies between the two miter planes
((q - p0) . n0 >= 0 and (q - p1) . n1 <= 0), else the farther root.

TPU mapping: segments stream through a lax.scan in 128-wide tiles with
rays on the 128-lane axis (the same layout as the triangle brute-force
path, accel/intersect._brute_tiles) — all arithmetic is elementwise
[R, 128] VPU work with no gathers.  Scene packs pad the segment table
to a 128 multiple with radius-0 entries (builder.py), which can never
hit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

RAY_EPS = 1e-4
BIG = 1e30


def _cyl_tiles(pack):
    """[NT, 128, ...] tiles of the padded segment table."""
    def t(a):
        return a.reshape((-1, 128) + a.shape[1:])

    return (
        t(pack.cyl_p0), t(pack.cyl_p1), t(pack.cyl_n0), t(pack.cyl_n1),
        t(pack.cyl_rad),
    )


def _seg_test(o, d, p0, p1, n0, n1, rad, t_lim):
    """Exact segment test of R rays against one 128-segment tile.

    o/d: [R, 3]; p0/p1/n0/n1: [S, 3]; rad: [S]; t_lim: [R].
    Returns t [R, S] with BIG misses."""
    ax = p1 - p0
    ax = ax / jnp.maximum(
        jnp.linalg.norm(ax, axis=-1, keepdims=True), 1e-20
    )
    # rel = o - p0 per (ray, seg): [R, S, 3]
    rel = o[:, None, :] - p0[None, :, :]
    rel_ax = jnp.einsum("rsk,sk->rs", rel, ax)
    d_ax = jnp.einsum("rk,sk->rs", d, ax)
    # perpendicular components
    po = rel - rel_ax[..., None] * ax[None, :, :]
    pd = d[:, None, :] - d_ax[..., None] * ax[None, :, :]
    A = jnp.sum(pd * pd, axis=-1)
    B = 2.0 * jnp.sum(po * pd, axis=-1)
    C = jnp.sum(po * po, axis=-1) - (rad * rad)[None, :]
    disc = B * B - 4.0 * A * C
    ok = (disc >= 0.0) & (A > 1e-20) & (rad[None, :] > 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv2a = 0.5 / jnp.where(ok, A, 1.0)
    t_near = (-B - sq) * inv2a
    t_far = (-B + sq) * inv2a

    def clipped(t):
        q = o[:, None, :] + t[..., None] * d[:, None, :]
        c0 = jnp.einsum("rsk,sk->rs", q - p0[None, :, :], n0)
        c1 = jnp.einsum("rsk,sk->rs", q - p1[None, :, :], n1)
        return (c0 >= 0.0) & (c1 <= 0.0)

    near_ok = ok & (t_near > RAY_EPS) & (t_near < t_lim[:, None]) & (
        clipped(t_near)
    )
    far_ok = ok & (t_far > RAY_EPS) & (t_far < t_lim[:, None]) & (
        clipped(t_far)
    )
    t = jnp.where(near_ok, t_near, jnp.where(far_ok, t_far, BIG))
    return t


def cyl_closest(pack, o, d, best_t):
    """Closest analytic-segment hit below best_t.
    Returns (hit [R] bool, t [R], cid [R] i32)."""
    tiles = _cyl_tiles(pack)
    r = o.shape[0]

    def body(carry, tile):
        bt, bi, base = carry
        p0, p1, n0, n1, rad = tile
        t = _seg_test(o, d, p0, p1, n0, n1, rad, bt)
        tm = jnp.min(t, axis=-1)
        im = jnp.argmin(t, axis=-1).astype(jnp.int32) + base
        take = (tm < bt) & (tm < BIG)
        return (
            jnp.where(take, tm, bt),
            jnp.where(take, im, bi),
            base + 128,
        ), None

    (bt, bi, _), _ = jax.lax.scan(
        body,
        (jnp.broadcast_to(best_t, (r,)).astype(jnp.float32),
         jnp.full((r,), -1, jnp.int32), jnp.int32(0)),
        tiles,
    )
    return bi >= 0, bt, bi


def cyl_any(pack, o, d, t_max):
    """Boolean occlusion against the analytic segments."""
    tiles = _cyl_tiles(pack)
    r = o.shape[0]
    t_lim = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)

    def body(occ, tile):
        p0, p1, n0, n1, rad = tile
        t = _seg_test(o, d, p0, p1, n0, n1, rad, t_lim)
        return occ | jnp.any(t < BIG, axis=-1), None

    occ, _ = jax.lax.scan(body, jnp.zeros((r,), bool), tiles)
    return occ

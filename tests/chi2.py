"""Chi-square goodness-of-fit harness for directional sampling routines.

Rebuild of the reference's flagship statistical test
(reference: include/mitsuba/core/chisquare.h:81-162,
src/tests/test_chisquare.cpp:47-120): bin a large number of sample()
draws over the sphere, integrate the claimed pdf() over each bin, then
run a chi-square test.  This is how every sampling routine
(warps, BSDFs, emitters, phase functions) is validated without golden
images.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import chi2 as _chi2

import jax.numpy as jnp

from mitsuba_tpu.core import rng


def spherical_bin(d, theta_res, phi_res):
    """Map unit directions to (theta, phi) bin indices."""
    d = np.asarray(d)
    theta = np.arccos(np.clip(d[..., 2], -1, 1))
    phi = np.arctan2(d[..., 1], d[..., 0])
    phi = np.where(phi < 0, phi + 2 * np.pi, phi)
    ti = np.minimum((theta / np.pi * theta_res).astype(int), theta_res - 1)
    pi_ = np.minimum((phi / (2 * np.pi) * phi_res).astype(int), phi_res - 1)
    return ti * phi_res + pi_


def chi2_test(
    sample_fn,
    pdf_fn,
    n_samples=1_000_000,
    theta_res=10,
    phi_res=20,
    pdf_sub=8,
    significance=0.001,
    seed=3,
):
    """sample_fn(u2 [N,2]) -> directions [N,3] (may include zero-weight
    failures as (0,0,0)); pdf_fn(d [M,3]) -> pdf values.

    Returns (passed, p_value, message).
    """
    u = np.asarray(rng.rand2(np.arange(n_samples), 7, 13, seed))
    d = np.asarray(sample_fn(jnp.asarray(u)))
    ok = np.linalg.norm(d, axis=-1) > 0.5
    n_valid = int(ok.sum())
    bins = spherical_bin(d[ok], theta_res, phi_res)
    counts = np.bincount(bins, minlength=theta_res * phi_res).astype(
        np.float64
    )

    # integrate pdf over each bin with a midpoint grid (pdf_sub^2 / bin)
    tt = (np.arange(theta_res * pdf_sub) + 0.5) / (theta_res * pdf_sub) * np.pi
    pp = (
        (np.arange(phi_res * pdf_sub) + 0.5)
        / (phi_res * pdf_sub)
        * 2.0
        * np.pi
    )
    T, P = np.meshgrid(tt, pp, indexing="ij")
    dirs = np.stack(
        [np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], axis=-1
    ).reshape(-1, 3)
    pv = np.asarray(pdf_fn(jnp.asarray(dirs, jnp.float32))).reshape(T.shape)
    d_theta = np.pi / (theta_res * pdf_sub)
    d_phi = 2 * np.pi / (phi_res * pdf_sub)
    cell = pv * np.sin(T) * d_theta * d_phi
    expected_grid = cell.reshape(
        theta_res, pdf_sub, phi_res, pdf_sub
    ).sum(axis=(1, 3))
    # scale by TOTAL draws: pdf() integrates to (1 - rejected/delta mass),
    # so expected bin totals line up with the valid-sample counts
    expected = expected_grid.reshape(-1) * n_samples

    # pool low-expectation cells (standard chi-square practice, and what
    # the reference does, chisquare.h:143)
    mask = expected > 5.0
    pooled_exp = expected[~mask].sum()
    pooled_cnt = counts[~mask].sum()
    e = np.concatenate([expected[mask], [max(pooled_exp, 1e-9)]])
    c = np.concatenate([counts[mask], [pooled_cnt]])
    dof = len(e) - 1
    stat = ((c - e) ** 2 / np.maximum(e, 1e-9)).sum()
    p = float(_chi2.sf(stat, dof)) if dof > 0 else 1.0
    msg = (
        f"chi2 stat={stat:.1f} dof={dof} p={p:.4g} "
        f"valid={n_valid}/{n_samples} "
        f"(expected total {expected.sum():.0f})"
    )
    return p >= significance, p, msg

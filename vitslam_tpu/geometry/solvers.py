"""Closed-form alignment solvers — Umeyama / IRLS / Horn / LSE /
weighted-median scale — pure jnp fp32, fully jit-able.

Unlike the reference (NumPy loops with torch<->numpy round-trips,
aligned_vggt/utils/alignment.py:6-128 and dynamic boolean masking,
aligned_vggt/models/pointAligned_wrapped_vggt.py:159-304), every solver here
is batched, static-shape, and uses weight-zeroing instead of point removal so
the whole pipeline stays on-device under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def umeyama(x: jax.Array, y: jax.Array, weights: jax.Array | None = None) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(Weighted) Umeyama Sim(m) least squares: find (R, t, s) minimizing
    sum_i w_i ||y_i - (s R x_i + t)||^2.

    Args:
        x: (..., N, m) source points (to be aligned onto y).
        y: (..., N, m) reference points.
        weights: optional (..., N) non-negative weights.
    Returns:
        R (..., m, m), t (..., m), s (...,).

    Reference parity: aligned_vggt/utils/alignment.py:6-59 (unweighted, 3xN
    layout) and aligned_vggt/models/pointAligned_wrapped_vggt.py:159-217
    (weighted). Note both use covariance Sigma = E[(y-mu_y)(x-mu_x)^T] with
    Kabsch sign fix and scale s = trace(diag(d) S) / var_x.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    n, m = x.shape[-2], x.shape[-1]
    if weights is None:
        w = jnp.full(x.shape[:-1], 1.0 / n, dtype=jnp.float32)
    else:
        w = weights.astype(jnp.float32)
        w = w / jnp.sum(w, axis=-1, keepdims=True).clip(1e-12)

    mu_x = jnp.einsum("...n,...nm->...m", w, x)
    mu_y = jnp.einsum("...n,...nm->...m", w, y)
    xc = x - mu_x[..., None, :]
    yc = y - mu_y[..., None, :]

    # covariance E_w[(y - mu_y)(x - mu_x)^T], (m, m)
    sigma = jnp.einsum("...n,...ni,...nj->...ij", w, yc, xc)
    var_x = jnp.einsum("...n,...nm->...", w, xc * xc)

    u, d, vh = jnp.linalg.svd(sigma, full_matrices=True)
    det_sign = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vh))
    s_diag = jnp.ones(x.shape[:-2] + (m,), dtype=jnp.float32)
    s_diag = s_diag.at[..., -1].set(det_sign)
    R = jnp.einsum("...ik,...k,...kj->...ij", u, s_diag, vh)
    s = jnp.sum(d * s_diag, axis=-1) / var_x.clip(1e-12)
    t = mu_y - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu_x)
    return R, t, s


def huber_weights(r: jax.Array, delta: float) -> jax.Array:
    """Huber IRLS multiplicative weights: 1 for r<=delta else delta/r."""
    return jnp.where(r <= delta, jnp.ones_like(r), delta / r.clip(1e-12))


def irls_sim3_umeyama(
    src: jax.Array,
    dst: jax.Array,
    conf_src: jax.Array | None = None,
    conf_dst: jax.Array | None = None,
    conf_threshold_factor: float = 0.5,
    delta: float = 0.1,
    max_iters: int = 20,
    tol: float = 1e-9,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Robust Sim(3) via IRLS over the weighted Umeyama solver.

    Points with combined confidence sqrt(c_src * c_dst) below
    ``conf_threshold_factor * median`` get weight 0 (the reference removes
    them — equivalent under weighted least squares, but static-shape here).
    A fixed ``max_iters`` loop runs under ``lax.fori_loop``; once the update
    falls below ``tol`` the state is frozen (branchless early-exit).

    Args:
        src, dst: (N, 3) or any shape reshapeable to (-1, 3); same count.
        conf_src, conf_dst: matching per-point confidences or None.
    Returns:
        R (3, 3), t (3,), s () aligning src onto dst.

    Reference parity: aligned_vggt/models/pointAligned_wrapped_vggt.py:219-304.
    """
    src = src.reshape(-1, 3).astype(jnp.float32)
    dst = dst.reshape(-1, 3).astype(jnp.float32)
    if conf_src is None:
        combined = jnp.ones((src.shape[0],), jnp.float32)
    else:
        combined = jnp.sqrt(conf_src.reshape(-1) * conf_dst.reshape(-1)).astype(jnp.float32)
    thresh = conf_threshold_factor * jnp.median(combined)
    base_w = jnp.where(combined >= thresh, combined, 0.0)

    R0, t0, s0 = umeyama(src, dst, base_w)

    def body(_, state):
        R, t, s, done = state
        transformed = s * (src @ R.T) + t
        residuals = jnp.linalg.norm(transformed - dst, axis=-1)
        new_w = base_w * huber_weights(residuals, delta)
        Rn, tn, sn = umeyama(src, dst, new_w)
        dR = jnp.linalg.norm(Rn - R)
        dt = jnp.linalg.norm(tn - t)
        ds = jnp.abs(sn - s)
        converged = (dR < tol) & (dt < tol) & (ds < tol)
        keep = done
        R = jnp.where(keep, R, Rn)
        t = jnp.where(keep, t, tn)
        s = jnp.where(keep, s, sn)
        return R, t, s, done | converged

    R, t, s, _ = jax.lax.fori_loop(
        0, max_iters, body, (R0, t0, s0, jnp.asarray(False))
    )
    return R, t, s


def method_of_horn(model: jax.Array, data: jax.Array, align_scale: bool = True) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Horn closed-form trajectory alignment (evaluate_ate_scale variant).

    Args:
        model: (N, 3) trajectory to be aligned onto ``data``.
        data: (N, 3) reference trajectory.
        align_scale: solve for scale (else s = 1).
    Returns:
        R (3, 3), t (3,), s () with aligned = s * R @ model + t.

    Reference parity: aligned_vggt/utils/alignment.py:61-111 (methodOfHorn,
    3xN layout; SVD of W^T where W = sum model_zc data_zc^T).
    """
    model = model.astype(jnp.float32)
    data = data.astype(jnp.float32)
    mu_m = model.mean(axis=0)
    mu_d = data.mean(axis=0)
    mzc = model - mu_m
    dzc = data - mu_d
    W = mzc.T @ dzc  # (3, 3); W^T = sum dzc mzc^T
    u, _, vh = jnp.linalg.svd(W.T, full_matrices=True)
    s_diag = jnp.ones((3,), jnp.float32).at[-1].set(
        jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vh))
    )
    R = (u * s_diag[None, :]) @ vh
    if align_scale:
        rot_model = mzc @ R.T
        s = jnp.sum(dzc * rot_model) / jnp.sum(mzc * mzc).clip(1e-12)
    else:
        s = jnp.asarray(1.0, jnp.float32)
    t = mu_d - s * (R @ mu_m)
    return R, t, s


def scale_lse_solver(x: jax.Array, y: jax.Array) -> jax.Array:
    """Least-squares scale |sum(x*y) / sum(x^2)| aligning x onto y over the
    trailing flattened dims. Returns a scalar per leading batch dim if inputs
    are batched (..., N, m) with reduction over the last two axes collapsed.

    Reference parity: aligned_vggt/utils/alignment.py:113-128 (abs to avoid
    negative scales).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    # Full reduction — callers vmap for batching.
    num = jnp.sum(x * y)
    den = jnp.sum(x * x).clip(1e-12)
    return jnp.abs(num / den)


def weighted_median_scale(
    x: jax.Array, y: jax.Array, weights: jax.Array
) -> jax.Array:
    """L1-optimal scale argmin_a sum_i w_i |a x_i - y_i| via the weighted
    median of ratios y_i/x_i with effective weights w_i * |x_i|.

    Args:
        x: (..., N) predictions (e.g. predicted depths).
        y: (..., N) targets (e.g. GT depths).
        weights: (..., N) non-negative weights (0 masks a point out).
    Returns:
        (...,) positive scale factors.

    Reference parity: aligned_vggt/utils/alignment.py:273-309
    (scale_align_from_depths core: sign-fix, ratio sort, cumsum, searchsorted
    left at half total weight).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    w = weights.astype(jnp.float32)
    sign = jnp.where(jnp.sign(x) == 0, 1.0, jnp.sign(x))
    x_pos = x * sign
    y_pos = y * sign
    r = y_pos / x_pos.clip(1e-6)
    w_eff = w * x_pos

    order = jnp.argsort(r, axis=-1)
    r_sorted = jnp.take_along_axis(r, order, axis=-1)
    w_sorted = jnp.take_along_axis(w_eff, order, axis=-1)
    cumsum = jnp.cumsum(w_sorted, axis=-1)
    total = cumsum[..., -1:]
    target = 0.5 * total
    # first index where cumsum >= target (searchsorted 'left' equivalent)
    idx = jnp.sum(cumsum < target, axis=-1, keepdims=True)
    idx = jnp.clip(idx, 0, x.shape[-1] - 1)
    scales = jnp.take_along_axis(r_sorted, idx, axis=-1)[..., 0]
    return jnp.where(scales <= 0, -scales, scales)


def depth_scale_weights(
    d_gt: jax.Array, mask: jax.Array, conf: jax.Array
) -> jax.Array:
    """Weights for the depth-based weighted-median scale solver:
    mask * confidence * inverse GT depth, with GT depth clamped from below at
    0.1x its (masked) mean to bound the contribution of near points.

    Args:
        d_gt: (..., N) GT depths.
        mask: (..., N) validity {0,1}.
        conf: (..., N) prediction confidence.
    Reference parity: aligned_vggt/utils/alignment.py:277-292.
    """
    m = mask.astype(jnp.float32)
    sum_valid = jnp.sum(m, axis=-1, keepdims=True).clip(1.0)
    mean_depth = jnp.sum(d_gt * m, axis=-1, keepdims=True) / sum_valid
    y_clamped = jnp.maximum(d_gt, 0.1 * mean_depth)
    w_depth = 1.0 / y_clamped.clip(1e-6)
    return m * conf * w_depth

"""Multichannel Wiener filtering with expectation-maximization (EM).

TPU-native re-implementation of the separation post-filter used by the
reference's UMX ``Separator`` (reference remfx/models.py:283-288 wraps
sigsep/open-unmix-pytorch's ``Separator``, whose ``wiener`` /
``expectation_maximization`` come from the published norbert algorithm
[Liutkus & Stoter]).  The reference default is ``niter=0`` (magnitude
estimate with the mixture phase); this module supplies the optional
``niter>0`` EM refinement, ``softmask`` initialisation, and the
``residual`` extra source, with the same semantics:

- initial estimates: ``softmask`` ratio mask, or magnitude + mixture
  phase (niter=0 path);
- optional residual source ``mix - sum(estimates)`` appended last
  (required upstream when EM runs on a single target);
- per-iteration: PSD ``v_j = mean_c |y_j|^2``; spatial covariance
  ``R_j = sum_t y_j y_j^H / (eps + sum_t v_j)``; mix covariance
  ``Cxx = sqrt(eps) I + sum_j v_j R_j``; gains ``W_j = v_j R_j Cxx^-1``;
  ``y_j = W_j x``;
- numerical rescale of mix/estimates by ``max(1, |x|_max / 10)`` before
  EM, undone after;
- EM statistics are computed per window of ``wiener_win_len`` frames
  (upstream default 300), independently — replicated here by reshaping
  frames into zero-padded windows (zero frames contribute nothing to the
  sums) and vmapping.

Complex arithmetic is carried as separate (re, im) planes — TPU has no
complex dtype support.  Like upstream ``_invert``, only 1- and
2-channel covariance inversion is supported (closed form).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _invert(mr, mi, eps):
    """Inverse of a (..., C, C) complex matrix, C in {1, 2} (closed form)."""
    C = mr.shape[-1]
    if C == 1:
        den = mr * mr + mi * mi + eps
        return mr / den, -mi / den
    if C == 2:
        # det = m00*m11 - m01*m10
        d_r, d_i = _cmul(mr[..., 0, 0], mi[..., 0, 0], mr[..., 1, 1], mi[..., 1, 1])
        e_r, e_i = _cmul(mr[..., 0, 1], mi[..., 0, 1], mr[..., 1, 0], mi[..., 1, 0])
        det_r, det_i = d_r - e_r, d_i - e_i
        den = det_r * det_r + det_i * det_i + eps
        inv_r, inv_i = det_r / den, -det_i / den  # 1/det
        adj_r = jnp.stack(
            [
                jnp.stack([mr[..., 1, 1], -mr[..., 0, 1]], -1),
                jnp.stack([-mr[..., 1, 0], mr[..., 0, 0]], -1),
            ],
            -2,
        )
        adj_i = jnp.stack(
            [
                jnp.stack([mi[..., 1, 1], -mi[..., 0, 1]], -1),
                jnp.stack([-mi[..., 1, 0], mi[..., 0, 0]], -1),
            ],
            -2,
        )
        return _cmul(adj_r, adj_i, inv_r[..., None, None], inv_i[..., None, None])
    raise NotImplementedError(f"only 1/2 channels supported, got {C}")


def expectation_maximization(yr, yi, xr, xi, iterations: int, eps: float = 1e-10):
    """EM refinement of source STFT estimates.

    yr/yi: (F, B, C, S) current estimates; xr/xi: (F, B, C) mixture.
    Returns refined (yr, yi).  Static ``iterations`` (unrolled).
    """
    C = xr.shape[-1]
    sqrt_eps = eps ** 0.5
    eye = jnp.eye(C)
    for _ in range(iterations):
        # source PSDs: (F, B, S)
        v = jnp.mean(yr * yr + yi * yi, axis=2)
        # spatial covariances R_j: (B, C, C, S) = sum_t y y^H / (eps+sum_t v)
        # y_{c1} conj(y_{c2}): re = yr1*yr2 + yi1*yi2 ; im = yi1*yr2 - yr1*yi2
        Rr = jnp.einsum("fbcs,fbds->bcds", yr, yr) + jnp.einsum(
            "fbcs,fbds->bcds", yi, yi
        )
        Ri = jnp.einsum("fbcs,fbds->bcds", yi, yr) - jnp.einsum(
            "fbcs,fbds->bcds", yr, yi
        )
        weight = eps + jnp.sum(v, axis=0)  # (B, S)
        Rr = Rr / weight[:, None, None, :]
        Ri = Ri / weight[:, None, None, :]
        # mix covariance: (F, B, C, C)
        Cxx_r = sqrt_eps * eye + jnp.einsum("fbs,bcds->fbcd", v, Rr)
        Cxx_i = jnp.einsum("fbs,bcds->fbcd", v, Ri)
        inv_r, inv_i = _invert(Cxx_r, Cxx_i, eps)
        # gains W_j = v_j R_j Cxx^-1: (F, B, C, C, S)
        RR_r = jnp.einsum("bcds,fbde->fbces", Rr, inv_r) - jnp.einsum(
            "bcds,fbde->fbces", Ri, inv_i
        )
        RR_i = jnp.einsum("bcds,fbde->fbces", Rr, inv_i) + jnp.einsum(
            "bcds,fbde->fbces", Ri, inv_r
        )
        Wr = v[:, :, None, None, :] * RR_r
        Wi = v[:, :, None, None, :] * RR_i
        # y_j = W_j x: (F, B, C, S)
        yr = jnp.einsum("fbcds,fbd->fbcs", Wr, xr) - jnp.einsum(
            "fbcds,fbd->fbcs", Wi, xi
        )
        yi = jnp.einsum("fbcds,fbd->fbcs", Wr, xi) + jnp.einsum(
            "fbcds,fbd->fbcs", Wi, xr
        )
    return yr, yi


def wiener(
    targets_mag,
    xr,
    xi,
    niter: int = 1,
    softmask: bool = False,
    residual: bool = False,
    wiener_win_len: int | None = 300,
    scale_factor: float = 10.0,
    eps: float = 1e-10,
):
    """Wiener filter source estimates from magnitude models.

    targets_mag: (F, B, C, S) magnitude estimates; xr/xi: (F, B, C) mix
    STFT.  Returns (yr, yi): (F, B, C, S_out) with S_out = S + residual.
    """
    if softmask:
        mask = targets_mag / (eps + jnp.sum(targets_mag, axis=-1, keepdims=True))
        yr = xr[..., None] * mask
        yi = xi[..., None] * mask
    else:
        # upstream seeds with the mixture phase via atan2(im, re); note
        # atan2(0, 0) = 0, so an exactly-zero mixture bin (digital
        # silence) seeds EM with (targets_mag, 0), not (0, 0)
        ang = jnp.arctan2(xi, xr)
        yr = targets_mag * jnp.cos(ang)[..., None]
        yi = targets_mag * jnp.sin(ang)[..., None]
    if residual:
        yr = jnp.concatenate([yr, (xr - yr.sum(-1))[..., None]], axis=-1)
        yi = jnp.concatenate([yi, (xi - yi.sum(-1))[..., None]], axis=-1)
    if niter == 0:
        return yr, yi
    if yr.shape[-1] == 1:
        raise ValueError(
            "Cannot run EM on a single target; set residual=True "
            "(upstream Separator raises the same way)."
        )
    # numerical rescale (upstream wiener scale_factor=10)
    max_abs = jnp.maximum(1.0, jnp.sqrt(xr * xr + xi * xi).max() / scale_factor)
    xr, xi, yr, yi = xr / max_abs, xi / max_abs, yr / max_abs, yi / max_abs

    F = xr.shape[0]
    win = int(wiener_win_len) if wiener_win_len else F
    n_win = -(-F // win)
    pad = n_win * win - F

    def pad_win(a):  # (F, ...) -> (n_win, win, ...)
        a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        return a.reshape((n_win, win) + a.shape[1:])

    em = jax.vmap(lambda a, b, c, d: expectation_maximization(a, b, c, d, niter, eps))
    yr_w, yi_w = em(pad_win(yr), pad_win(yi), pad_win(xr), pad_win(xi))
    yr = yr_w.reshape((n_win * win,) + yr.shape[1:])[:F]
    yi = yi_w.reshape((n_win * win,) + yi.shape[1:])[:F]
    return yr * max_abs, yi * max_abs

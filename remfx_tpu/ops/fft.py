"""Real-arithmetic FFTs for TPU — MXU matmul DFTs + 4-step Cooley-Tukey.

The target TPU backend exposes **no complex dtype** (no ``jnp.fft``, no
``lax.complex``), so every spectral op in this framework runs on real
re/im planes:

  * Short transforms (STFT frames, n ≤ 4096) are evaluated as dense DFT
    matmuls — exactly what the MXU systolic array is built for. A 512-
    frame STFT of 5.46 s audio is a single (frames × n_fft) @ (n_fft ×
    n_bins) matmul pair.
  * Long transforms (LTI effect rendering, n up to 2^22) use the 4-step
    (Bailey) decomposition N = N1·N2: column DFT → twiddle → row DFT,
    where each small DFT is again an MXU matmul.

Convention: spectra are ``(re, im)`` tuples of float32 arrays. All
functions operate along the last axis. Matmuls run at
``Precision.HIGHEST`` so twiddles keep f32 accuracy on the MXU.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

_PREC = jax.lax.Precision.HIGHEST
_MAX_DIRECT = 4096  # largest dense-matmul DFT


@lru_cache(maxsize=32)
def _rdft_mats(n: int):
    """cos/sin matrices for rfft of real input: (n, n//2+1)."""
    k = np.arange(n // 2 + 1)
    t = np.arange(n)
    ang = 2.0 * np.pi * np.outer(t, k) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@lru_cache(maxsize=32)
def _dft_mats(n: int):
    """cos/sin matrices for a full complex DFT: (n, n)."""
    t = np.arange(n)
    ang = 2.0 * np.pi * np.outer(t, t) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@lru_cache(maxsize=32)
def _twiddle(n1: int, n2: int):
    """4-step twiddles e^{-2πi k1 n2 / (n1 n2)}: (n1, n2) cos/sin."""
    k1 = np.arange(n1)
    n2r = np.arange(n2)
    ang = 2.0 * np.pi * np.outer(k1, n2r) / (n1 * n2)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _split(n: int) -> tuple[int, int]:
    """Factor n = n1 * n2 with both ≤ _MAX_DIRECT (n must be 2^k)."""
    if n & (n - 1):
        raise ValueError(f"long FFT size must be a power of 2, got {n}")
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    if n2 > _MAX_DIRECT:
        raise ValueError(f"FFT size {n} too large (max {_MAX_DIRECT**2})")
    return n1, n2


def _dft_pair(xr, xi, n: int, sign: float):
    """Full complex DFT over last axis via dense matmul. sign=-1: forward."""
    c, s = _dft_mats(n)
    c = jnp.asarray(c)
    s = jnp.asarray(s) * sign  # forward (sign=-1): W = cos - i sin
    # (xr + i xi) @ (c + i s_signed)
    yr = jnp.matmul(xr, c, precision=_PREC) - jnp.matmul(xi, s, precision=_PREC)
    yi = jnp.matmul(xr, s, precision=_PREC) + jnp.matmul(xi, c, precision=_PREC)
    return yr, yi


def fft_pair(xr: jax.Array, xi: jax.Array, n: int, sign: float = -1.0):
    """Complex FFT (as re/im pair) along the last axis, length n (2^k or
    ≤ _MAX_DIRECT). ``sign=-1`` forward, ``sign=+1`` inverse-unnormalized."""
    if xr.shape[-1] != n:
        pad = n - xr.shape[-1]
        xr = jnp.pad(xr, [(0, 0)] * (xr.ndim - 1) + [(0, pad)])
        xi = jnp.pad(xi, [(0, 0)] * (xi.ndim - 1) + [(0, pad)])
    if n <= _MAX_DIRECT:
        return _dft_pair(xr, xi, n, sign)
    n1, n2 = _split(n)
    batch = xr.shape[:-1]
    # step 1: reshape x[n1*n2' + n2'] -> [..., n1, n2]
    xr = xr.reshape(batch + (n1, n2))
    xi = xi.reshape(batch + (n1, n2))
    # step 2: DFT over n1 (axis -2): move to last axis
    xr = jnp.swapaxes(xr, -1, -2)
    xi = jnp.swapaxes(xi, -1, -2)  # (..., n2, n1)
    ar, ai = _dft_pair(xr, xi, n1, sign)  # A[n2, k1]
    # step 3: twiddle W_N^{k1 n2}
    tc, ts = _twiddle(n1, n2)
    tc = jnp.asarray(tc).T  # (n2, n1)
    ts = jnp.asarray(ts).T * sign
    br = ar * tc - ai * ts
    bi = ar * ts + ai * tc
    # step 4: DFT over n2: B[n2, k1] -> transpose to (..., k1, n2)
    br = jnp.swapaxes(br, -1, -2)
    bi = jnp.swapaxes(bi, -1, -2)
    xr2, xi2 = _dft_pair(br, bi, n2, sign)  # X[k1, k2]
    # step 5: k = k1 + n1*k2 -> layout (..., k2, k1)
    xr2 = jnp.swapaxes(xr2, -1, -2).reshape(batch + (n,))
    xi2 = jnp.swapaxes(xi2, -1, -2).reshape(batch + (n,))
    return xr2, xi2


def rfft_ri(x: jax.Array, n: int):
    """Real-input FFT -> (re, im) of shape (..., n//2+1)."""
    if x.shape[-1] != n:
        if x.shape[-1] > n:
            x = x[..., :n]
        else:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])])
    if n <= _MAX_DIRECT:
        c, s = _rdft_mats(n)
        re = jnp.matmul(x, jnp.asarray(c), precision=_PREC)
        im = -jnp.matmul(x, jnp.asarray(s), precision=_PREC)
        return re, im
    re, im = fft_pair(x, jnp.zeros_like(x), n)
    return re[..., : n // 2 + 1], im[..., : n // 2 + 1]


def irfft_ri(re: jax.Array, im: jax.Array, n: int) -> jax.Array:
    """Inverse of rfft_ri: (..., n//2+1) re/im -> (..., n) real."""
    if n <= _MAX_DIRECT:
        # x[t] = (1/n) * [ re[0] + 2*sum_{k=1}^{n/2-1} (re cos + im(-sin)) ... ]
        # Use the real synthesis matmul: x = re @ Cs^T + im @ Ss^T
        c, s = _rdft_mats(n)  # (n, nf)
        w = np.ones(n // 2 + 1, np.float32) * 2.0
        w[0] = 1.0
        if n % 2 == 0:
            w[-1] = 1.0
        cs = (c * w[None, :] / n).astype(np.float32)  # (n, nf)
        ss = (s * w[None, :] / n).astype(np.float32)
        x = jnp.matmul(re, jnp.asarray(cs).T, precision=_PREC) - jnp.matmul(
            im, jnp.asarray(ss).T, precision=_PREC
        )
        return x
    # hermitian-extend then inverse complex FFT
    nf = n // 2 + 1
    assert re.shape[-1] == nf
    tail_r = re[..., 1 : n - nf + 1][..., ::-1]
    tail_i = -im[..., 1 : n - nf + 1][..., ::-1]
    fr = jnp.concatenate([re, tail_r], axis=-1)
    fi = jnp.concatenate([im, tail_i], axis=-1)
    xr, _ = fft_pair(fr, fi, n, sign=+1.0)
    return xr / n


def cmul(ar, ai, br, bi):
    """Complex multiply on re/im pairs."""
    return ar * br - ai * bi, ar * bi + ai * br


def cdiv(ar, ai, br, bi, eps: float = 0.0):
    """Complex divide on re/im pairs."""
    d = br * br + bi * bi + eps
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d

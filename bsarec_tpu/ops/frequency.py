"""Spectral sequence-mixing ops, designed TPU-first.

BSARec's FrequencyLayer (reference behavior: `src/model/bsarec.py:90-99`)
is `irfft(zero_bins(rfft(x, ortho)), ortho)` along the sequence axis —
i.e. multiplication by a *fixed* real projection matrix P_c on the seq
axis. On TPU we therefore implement it as one small [L, L] matmul that
the MXU eats for free and XLA fuses into the surrounding elementwise
work, instead of a complex FFT pipeline. This is numerically the exact
same linear map (P_c = F⁻¹ · diag(bin_mask) · F restricted to the real
subspace), and its VJP is P_cᵀ = P_c — identical to the gradient the
reference's kept-bins FFT path produces.

FMLP-Rec's learnable complex filter (`src/model/fmlprec.py:97-108`) is
likewise computed with real DFT matmuls (`rfft_matrices` /
`complex_filter_apply` below): this environment's TPU AOT compiler has
no FFT lowering, and at L<=200 four [L, F] MXU matmuls beat an FFT
pipeline anyway.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def lowpass_projection_matrix(seq_len: int, c: int) -> np.ndarray:
    """Real [L, L] matrix equal to rfft→keep bins [0, c//2+1)→irfft (ortho).

    Built once in float64 from the identity's spectrum, cached per
    (seq_len, c). `c` is the raw `--c` flag; kept bins = c//2 + 1
    (reference keeps `x[:, :c//2+1, :]`).
    """
    kept = c // 2 + 1
    eye = np.eye(seq_len, dtype=np.float64)
    spec = np.fft.rfft(eye, axis=0, norm="ortho")
    spec[kept:, :] = 0.0
    proj = np.fft.irfft(spec, n=seq_len, axis=0, norm="ortho")
    return proj.astype(np.float32)


def frequency_filter(x: jnp.ndarray, proj: jnp.ndarray, sqrt_beta: jnp.ndarray) -> jnp.ndarray:
    """BSARec frequency-domain inductive bias.

    x: [B, L, H]; proj: [L, L] low-pass projection; sqrt_beta: [..., H].
    Returns low_pass + sqrt_beta² ⊙ (x − low_pass)  (high-pass rescale).
    """
    low = jnp.einsum("kl,blh->bkh", proj, x, preferred_element_type=jnp.float32)
    x = x.astype(jnp.float32)
    return low + (sqrt_beta**2) * (x - low)


@functools.lru_cache(maxsize=64)
def bandpass_matrices(seq_len: int, left: int, right: int):
    """Real matrices realizing FEARec's per-layer frequency-band ops.

    FEARec (`src/model/fearec.py:229-249,332-356`) slices rFFT bins
    [left, right) of length-L signals (default fft norm), multiplies
    band spectra, and reconstructs band-limited signals. All of those
    maps are linear in the signal, so we precompute (float64 → fp32):

    - R_re, R_im: [nband, L] — signal -> Re/Im of band bins of rfft(x)
    - A_re, A_im: [L, nband] — band spectrum -> irfft(scatter into F bins)
    - BP:          [L, L]     — band-pass projection irfft∘band∘rfft
    """
    eye = np.eye(seq_len, dtype=np.float64)
    spec = np.fft.rfft(eye, axis=0)  # [F, L]
    band = spec[left:right, :]
    r_re = band.real.astype(np.float32)
    r_im = band.imag.astype(np.float32)

    nband = right - left
    nfreq = seq_len // 2 + 1
    scatter = np.zeros((nfreq, nband), dtype=np.complex128)
    scatter[left:right, :] = np.eye(nband)
    a_re = np.fft.irfft(scatter, n=seq_len, axis=0).astype(np.float32)  # [L, nband]
    a_im = np.fft.irfft(scatter * 1j, n=seq_len, axis=0).astype(np.float32)

    full = np.zeros_like(spec)
    full[left:right, :] = band
    bp = np.fft.irfft(full, n=seq_len, axis=0).astype(np.float32)  # [L, L]
    return r_re, r_im, a_re, a_im, bp


@functools.lru_cache(maxsize=64)
def rfft_matrices(seq_len: int):
    """Real matrices realizing ortho rFFT analysis/synthesis along a
    length-`seq_len` axis: R_re/R_im [F, L] (signal -> Re/Im spectrum),
    A_re/A_im [L, F] (spectrum -> signal via irfft). Needed because the
    TPU AOT compiler in this environment lacks an FFT lowering — and for
    L<=200 four [L, F] matmuls on the MXU beat an FFT pipeline anyway.
    """
    eye = np.eye(seq_len, dtype=np.float64)
    spec = np.fft.rfft(eye, axis=0, norm="ortho")  # [F, L]
    nfreq = seq_len // 2 + 1
    scatter = np.eye(nfreq, dtype=np.complex128)
    a_re = np.fft.irfft(scatter, n=seq_len, axis=0, norm="ortho")  # [L, F]
    a_im = np.fft.irfft(scatter * 1j, n=seq_len, axis=0, norm="ortho")
    return (
        spec.real.astype(np.float32), spec.imag.astype(np.float32),
        a_re.astype(np.float32), a_im.astype(np.float32),
    )


def rfft_real_imag(x: jnp.ndarray, axis: int = 1):
    """(Re, Im) of the ortho rFFT along `axis`, via DFT matmuls."""
    r_re, r_im, _, _ = rfft_matrices(x.shape[axis])
    r_re, r_im = jnp.asarray(r_re), jnp.asarray(r_im)
    moved = jnp.moveaxis(x, axis, -1)
    re = jnp.moveaxis(moved @ r_re.T, -1, axis)
    im = jnp.moveaxis(moved @ r_im.T, -1, axis)
    return re, im


def complex_filter_apply(x: jnp.ndarray, w_real: jnp.ndarray, w_imag: jnp.ndarray) -> jnp.ndarray:
    """FMLP-Rec learnable spectral filter (ortho-normalized).

    x: [B, L, H]; w_real/w_imag: [1, L//2+1, H] (torch `complex_weight`
    split into real/imag planes so parameters stay real pytree leaves).
    Computed as irfft(rfft(x) * w) with real DFT matmuls (see
    `rfft_matrices`): S = (R x) * w; y = A_re S_re + A_im S_im.
    """
    seq_len = x.shape[1]
    r_re, r_im, a_re, a_im = (jnp.asarray(m) for m in rfft_matrices(seq_len))
    s_re = jnp.einsum("fl,blh->bfh", r_re, x)
    s_im = jnp.einsum("fl,blh->bfh", r_im, x)
    out_re = s_re * w_real - s_im * w_imag
    out_im = s_re * w_imag + s_im * w_real
    return jnp.einsum("lf,bfh->blh", a_re, out_re) + jnp.einsum(
        "lf,bfh->blh", a_im, out_im
    )

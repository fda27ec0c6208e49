"""Frequency ops vs numpy-FFT ground truth (the reference's math)."""

import jax.numpy as jnp
import numpy as np

from bsarec_tpu.ops.frequency import (
    bandpass_matrices,
    complex_filter_apply,
    frequency_filter,
    lowpass_projection_matrix,
)


def reference_lowpass(x: np.ndarray, c: int) -> np.ndarray:
    """Emulates `src/model/bsarec.py:93-97` with numpy."""
    kept = c // 2 + 1
    spec = np.fft.rfft(x, axis=1, norm="ortho")
    spec[:, kept:, :] = 0
    return np.fft.irfft(spec, n=x.shape[1], axis=1, norm="ortho")


def test_lowpass_projection_matches_fft():
    rng = np.random.default_rng(0)
    for seq_len, c in [(50, 5), (50, 3), (50, 7), (200, 9), (49, 5)]:
        x = rng.normal(size=(3, seq_len, 8)).astype(np.float32)
        want = reference_lowpass(x.astype(np.float64), c)
        proj = lowpass_projection_matrix(seq_len, c)
        got = np.einsum("kl,blh->bkh", proj, x)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_projection_is_idempotent_and_symmetric():
    proj = lowpass_projection_matrix(50, 5)
    np.testing.assert_allclose(proj @ proj, proj, atol=1e-5)
    np.testing.assert_allclose(proj, proj.T, atol=1e-6)


def test_frequency_filter_blend():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 50, 4)).astype(np.float32)
    sqrt_beta = rng.normal(size=(1, 1, 4)).astype(np.float32)
    proj = jnp.asarray(lowpass_projection_matrix(50, 5))
    got = np.asarray(frequency_filter(jnp.asarray(x), proj, jnp.asarray(sqrt_beta)))
    low = reference_lowpass(x.astype(np.float64), 5)
    want = low + (sqrt_beta.astype(np.float64) ** 2) * (x - low)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_complex_filter_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 50, 4)).astype(np.float32)
    wr = rng.normal(size=(1, 26, 4)).astype(np.float32) * 0.02
    wi = rng.normal(size=(1, 26, 4)).astype(np.float32) * 0.02
    got = np.asarray(complex_filter_apply(jnp.asarray(x), jnp.asarray(wr), jnp.asarray(wi)))
    spec = np.fft.rfft(x, axis=1, norm="ortho") * (wr + 1j * wi)
    want = np.fft.irfft(spec, n=50, axis=1, norm="ortho")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bandpass_matrices_match_fft():
    rng = np.random.default_rng(3)
    seq_len, left, right = 50, 10, 26
    r_re, r_im, a_re, a_im, bp = bandpass_matrices(seq_len, left, right)
    q = rng.normal(size=(5, seq_len))
    k = rng.normal(size=(5, seq_len))

    # band selection of rfft (default norm)
    q_fft = np.fft.rfft(q, axis=-1)[:, left:right]
    np.testing.assert_allclose(q @ r_re.T, q_fft.real, atol=1e-4)
    np.testing.assert_allclose(q @ r_im.T, q_fft.imag, atol=1e-4)

    # cross-power -> irfft of scatter-back (fearec.py:332-356)
    k_fft = np.fft.rfft(k, axis=-1)[:, left:right]
    res = q_fft * np.conj(k_fft)
    box = np.zeros((5, seq_len // 2 + 1), dtype=complex)
    box[:, left:right] = res
    want_corr = np.fft.irfft(box, n=seq_len, axis=-1)
    got_corr = res.real @ a_re.T + res.imag @ a_im.T
    np.testing.assert_allclose(got_corr, want_corr, atol=1e-4)

    # band-limited reconstruction
    full = np.zeros((5, seq_len // 2 + 1), dtype=complex)
    full[:, left:right] = q_fft
    want_bl = np.fft.irfft(full, n=seq_len, axis=-1)
    np.testing.assert_allclose(q @ bp.T, want_bl, atol=1e-4)


def test_bandpass_matrices_long_sequence():
    """FEARec's band matrices at the reference's long-sequence shape
    (L=200, `repo-b/parse.py:11`) — the [L, L/2+1] DFT matmuls must hold
    numerically at 4x the paper's L=50."""
    rng = np.random.default_rng(4)
    seq_len, left, right = 200, 20, 101
    r_re, r_im, a_re, a_im, bp = bandpass_matrices(seq_len, left, right)
    q = rng.normal(size=(3, seq_len))
    q_fft = np.fft.rfft(q, axis=-1)[:, left:right]
    np.testing.assert_allclose(q @ r_re.T, q_fft.real, atol=1e-3)
    np.testing.assert_allclose(q @ r_im.T, q_fft.imag, atol=1e-3)
    full = np.zeros((3, seq_len // 2 + 1), dtype=complex)
    full[:, left:right] = q_fft
    np.testing.assert_allclose(q @ bp.T, np.fft.irfft(full, n=seq_len, axis=-1), atol=1e-3)


def test_complex_filter_long_sequence():
    """FMLP's learned filter at L=200 (kept as DFT matmuls: no FFT
    lowering in this TPU toolchain)."""
    rng = np.random.default_rng(5)
    L = 200
    x = rng.normal(size=(2, L, 4)).astype(np.float32)
    wr = rng.normal(size=(1, L // 2 + 1, 4)).astype(np.float32) * 0.02
    wi = rng.normal(size=(1, L // 2 + 1, 4)).astype(np.float32) * 0.02
    got = np.asarray(complex_filter_apply(jnp.asarray(x), jnp.asarray(wr), jnp.asarray(wi)))
    spec = np.fft.rfft(x, axis=1, norm="ortho") * (wr + 1j * wi)
    want = np.fft.irfft(spec, n=L, axis=1, norm="ortho")
    np.testing.assert_allclose(got, want, atol=1e-5)

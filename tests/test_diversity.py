"""Diversity combining + Alamouti STBC: exact recovery with known
channels, and the diversity gain itself (Rayleigh BER)."""

import numpy as np
import pytest

from aether_primitives_tpu.models.diversity import (
    alamouti_decode,
    alamouti_encode,
    egc_combine,
    mrc_combine,
    selection_combine,
)
from aether_primitives_tpu.ops import modulation as mod


def _qpsk_syms(rng, n):
    bits = rng.integers(0, 2, 2 * n).astype(np.uint8)
    return np.asarray(mod.qpsk().modulate(bits)), bits


def test_mrc_exact_noise_free(rng):
    s, _ = _qpsk_syms(rng, 512)
    h = np.array([0.3 - 0.9j, 1.2 + 0.1j, -0.05 + 0.4j], np.complex64)
    y = h[:, None] * s[None, :]
    out = np.asarray(mrc_combine(y, h[:, None]))
    assert np.allclose(out, s, atol=1e-5)


def test_egc_and_selection_noise_free(rng):
    s, _ = _qpsk_syms(rng, 256)
    h = np.array([0.5 * np.exp(1j * 2.0), 1.5 * np.exp(-1j * 0.7)], np.complex64)
    y = h[:, None] * s[None, :]
    eg = np.asarray(egc_combine(y, h[:, None]))
    # EGC output is co-phased: equals s scaled by mean branch amplitude
    scale = np.mean(np.abs(h))
    assert np.allclose(eg, s * scale, atol=1e-5)
    sel = np.asarray(selection_combine(y, h[:, None]))
    assert np.allclose(sel, s, atol=1e-5)  # strongest branch, corrected


def test_mrc_beats_single_branch_rayleigh(rng):
    # 4-branch MRC on Rayleigh fading: BER orders of magnitude below the
    # single-branch BER at the same per-branch SNR
    n_trials, n = 400, 64
    snr = 10 ** (8 / 10)
    sigma = np.sqrt(1.0 / snr / 2)
    errs_1, errs_4 = 0, 0
    bits_total = 0
    q = mod.qpsk()
    for _ in range(n_trials):
        s, bits = _qpsk_syms(rng, n)
        h = (rng.normal(size=4) + 1j * rng.normal(size=4)).astype(
            np.complex64
        ) / np.sqrt(2)
        noise = sigma * (rng.normal(size=(4, n)) + 1j * rng.normal(size=(4, n)))
        y = h[:, None] * s[None, :] + noise
        one = np.asarray(q.demod((y[0] / h[0]).astype(np.complex64)))
        four = np.asarray(q.demod(np.asarray(mrc_combine(y, h[:, None]))))
        errs_1 += int((one != bits).sum())
        errs_4 += int((four != bits).sum())
        bits_total += len(bits)
    ber1 = errs_1 / bits_total
    ber4 = errs_4 / bits_total
    assert ber1 > 0.01  # single Rayleigh branch at 8 dB is bad
    assert ber4 < ber1 / 20  # 4-branch diversity slope


def test_alamouti_roundtrip_exact(rng):
    s, _ = _qpsk_syms(rng, 256)
    tx = np.asarray(alamouti_encode(s))
    assert tx.shape == (2, 256)  # rate 1: n symbols in n uses, 2 antennas
    h0, h1 = 0.8 - 0.5j, -0.3 + 1.1j
    y = h0 * tx[0] + h1 * tx[1]
    out = np.asarray(alamouti_decode(y, h0, h1))
    assert np.allclose(out, s, atol=1e-5)


def test_alamouti_encode_structure(rng):
    s = np.array([1 + 1j, -1 + 1j, 1 - 1j, -1 - 1j], np.complex64)
    tx = np.asarray(alamouti_encode(s))
    # antenna 0: s0, -conj(s1), s2, -conj(s3)
    assert np.allclose(tx[0], [s[0], -np.conj(s[1]), s[2], -np.conj(s[3])])
    # antenna 1: s1, conj(s0), s3, conj(s2)
    assert np.allclose(tx[1], [s[1], np.conj(s[0]), s[3], np.conj(s[2])])
    with pytest.raises(ValueError, match="even"):
        alamouti_encode(s[:3])


def test_alamouti_diversity_gain_rayleigh(rng):
    # Alamouti 2x1 at the same TOTAL tx power achieves 2-branch diversity:
    # far fewer errors than uncoded 1x1 on Rayleigh fades
    n_trials, n = 400, 64
    snr = 10 ** (10 / 10)
    q = mod.qpsk()
    errs_11, errs_21 = 0, 0
    total = 0
    for _ in range(n_trials):
        s, bits = _qpsk_syms(rng, n)
        h = (rng.normal(size=2) + 1j * rng.normal(size=2)).astype(
            np.complex64
        ) / np.sqrt(2)
        sigma = np.sqrt(1.0 / snr / 2)
        # 1x1 reference on branch 0
        y11 = h[0] * s + sigma * (rng.normal(size=n) + 1j * rng.normal(size=n))
        one = np.asarray(q.demod((y11 / h[0]).astype(np.complex64)))
        # Alamouti: each antenna at half power (same total)
        tx = np.asarray(alamouti_encode(s)) / np.sqrt(2)
        y = h[0] * tx[0] + h[1] * tx[1] + sigma * (
            rng.normal(size=n) + 1j * rng.normal(size=n)
        )
        est = np.asarray(alamouti_decode(y, h[0] / np.sqrt(2), h[1] / np.sqrt(2)))
        two = np.asarray(q.demod(est.astype(np.complex64)))
        errs_11 += int((one != bits).sum())
        errs_21 += int((two != bits).sum())
        total += len(bits)
    assert errs_11 / total > 0.005
    assert errs_21 / total < errs_11 / total / 4


def test_mrc_batched_leading_axes(rng):
    s, _ = _qpsk_syms(rng, 128)
    h = (rng.normal(size=(3, 2)) + 1j * rng.normal(size=(3, 2))).astype(np.complex64)
    y = h[..., None] * s[None, None, :]  # [3 bursts, 2 rx, n]
    out = np.asarray(mrc_combine(y, h[..., None]))
    assert out.shape == (3, 128)
    assert np.allclose(out, np.broadcast_to(s, (3, 128)), atol=1e-5)


# ------------------------------------------------------- spatial multiplexing


def test_mimo_zf_exact_noise_free(rng):
    from aether_primitives_tpu.models.diversity import mimo_detect_zf

    n = 256
    s = (np.sign(rng.normal(size=(n, 2))) + 1j * np.sign(rng.normal(size=(n, 2)))).astype(
        np.complex64
    ) / np.sqrt(2)
    h = (rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))).astype(np.complex64)
    y = np.einsum("ij,nj->ni", h, s)
    got = np.asarray(mimo_detect_zf(y, h))
    assert np.abs(got - s).max() < 1e-4


def test_mimo_mmse_beats_zf_at_low_snr(rng):
    from aether_primitives_tpu.models.diversity import (
        mimo_detect_mmse,
        mimo_detect_zf,
    )
    from aether_primitives_tpu.ops import modulation as mod

    q = mod.qpsk()
    n_trials, n = 300, 64
    snr = 10 ** (12 / 10)
    sigma2 = 2.0 / snr  # symbol energy |s|^2 = 2 for the generic table
    e_zf = e_mmse = total = 0
    for _ in range(n_trials):
        bits = rng.integers(0, 2, 2 * 2 * n).astype(np.uint8)
        s = np.asarray(q.modulate(bits)).reshape(n, 2)
        h = (rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))).astype(
            np.complex64
        ) / np.sqrt(2)
        noise = np.sqrt(sigma2 / 2) * (
            rng.normal(size=(n, 2)) + 1j * rng.normal(size=(n, 2))
        )
        y = np.einsum("ij,nj->ni", h, s) + noise
        zf = np.asarray(mimo_detect_zf(y, h)).reshape(-1)
        mm = np.asarray(mimo_detect_mmse(y, h, sigma2 / 2.0)).reshape(-1)
        e_zf += int((np.asarray(q.demod(zf.astype(np.complex64))) != bits).sum())
        e_mmse += int((np.asarray(q.demod(mm.astype(np.complex64))) != bits).sum())
        total += len(bits)
    assert e_mmse < e_zf, (e_zf, e_mmse)
    assert e_mmse / total < 0.05


def test_mimo_stream_snr_orders_streams(rng):
    from aether_primitives_tpu.models.diversity import mimo_stream_snr

    # a channel with one strong and one weak column: the weak stream's
    # post-ZF SNR must come out lower
    h = np.array([[2.0, 0.1], [0.0, 0.1]], np.complex64)
    snrs = np.asarray(mimo_stream_snr(h, 0.01))
    assert snrs[0] > 10 * snrs[1]


def test_mimo_per_symbol_channels(rng):
    from aether_primitives_tpu.models.diversity import mimo_detect_zf

    n = 64
    s = (rng.normal(size=(n, 3)) + 1j * rng.normal(size=(n, 3))).astype(np.complex64)
    h = (rng.normal(size=(n, 4, 3)) + 1j * rng.normal(size=(n, 4, 3))).astype(
        np.complex64
    )  # time-varying 4x3 channel
    y = np.einsum("nij,nj->ni", h, s)
    got = np.asarray(mimo_detect_zf(y, h))
    assert np.abs(got - s).max() < 1e-3

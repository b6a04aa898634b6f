"""Analog mode tests: FM/AM round-trips against f64 goldens, discriminator
properties (amplitude insensitivity, offset tolerance)."""

import numpy as np
import pytest

from aether_primitives_tpu.ops import analog


def _message(rng, n):
    # bandlimited-ish smooth message in [-1, 1]
    t = np.arange(n)
    return (0.6 * np.sin(2 * np.pi * 0.003 * t)
            + 0.3 * np.sin(2 * np.pi * 0.011 * t + 1.0)).astype(np.float32)


def test_fm_roundtrip_exact(rng):
    n, dev = 1 << 14, 0.1
    m = _message(rng, n)
    y = np.asarray(analog.fm_mod(m, dev))
    assert np.allclose(np.abs(y), 1.0, atol=1e-5)  # constant modulus
    back = np.asarray(analog.fm_demod(y, dev))
    # first sample carries the phase origin; compare the rest
    err = back[1:] - m[1:]
    assert np.sqrt(np.mean(err**2)) < 1e-4


def test_fm_demod_amplitude_insensitive(rng):
    n, dev = 4096, 0.05
    m = _message(rng, n)
    y = np.asarray(analog.fm_mod(m, dev))
    fading = (1.0 + 0.5 * np.sin(2 * np.pi * 0.0007 * np.arange(n))).astype(
        np.float32
    )
    back = np.asarray(analog.fm_demod(y * fading, dev))
    assert np.sqrt(np.mean((back[1:] - m[1:]) ** 2)) < 1e-4


def test_fm_long_block_phase_accuracy():
    # constant +0.2-cycles/sample message over 1M samples: the phase
    # accumulator must not lose f32 accuracy late in the block
    n, dev = 1 << 20, 0.25
    m = 0.8 * np.ones(n, np.float32)
    y = np.asarray(analog.fm_mod(m, dev))
    back = np.asarray(analog.fm_demod(y, dev))
    tail_err = np.abs(back[-1000:] - 0.8)
    assert tail_err.max() < 1e-3


def test_am_roundtrip_and_offset_tolerance(rng):
    n, depth = 1 << 14, 0.5
    m = _message(rng, n)
    y = np.asarray(analog.am_mod(m, depth, carrier_freq=0.013))
    back = np.asarray(analog.am_demod(y, depth))
    err = back - m
    assert np.sqrt(np.mean(err**2)) < 2e-3


def test_am_mod_baseband_is_real_envelope(rng):
    m = _message(rng, 1024)
    y = np.asarray(analog.am_mod(m, 0.7))
    assert np.allclose(y.imag, 0.0)
    assert np.allclose(y.real, 1.0 + 0.7 * m, atol=1e-6)


# ------------------------------------------------- analytic signal / SSB


def test_analytic_signal_hilbert_pairs():
    from aether_primitives_tpu.ops.analog import analytic_signal

    n = np.arange(1024)
    for f0 in (52 / 1024, 215 / 1024):  # FFT-grid tones (block-periodic)
        x = np.cos(2 * np.pi * f0 * n).astype(np.float32)
        a = np.asarray(analytic_signal(x))
        # analytic of cos = e^{j 2 pi f n}: imag = sin, envelope = 1
        assert np.allclose(a.real, x, atol=1e-4)
        assert np.allclose(a.imag, np.sin(2 * np.pi * f0 * n), atol=1e-3)
        assert np.allclose(np.abs(a), 1.0, atol=1e-3)


def test_analytic_signal_spectrum_one_sided(rng):
    from aether_primitives_tpu.ops.analog import analytic_signal

    x = rng.normal(size=512).astype(np.float32)
    a = np.asarray(analytic_signal(x))
    spec = np.fft.fft(a)
    assert np.abs(spec[257:]).max() < 1e-3 * np.abs(spec).max()
    assert np.allclose(a.real, x, atol=1e-4)  # real part preserved


def test_ssb_roundtrip_and_sideband_placement(rng):
    from aether_primitives_tpu.ops.analog import ssb_demodulate, ssb_modulate

    n = 2048
    t = np.arange(n)
    msg = (
        np.sin(2 * np.pi * (27 / 2048) * t)
        + 0.4 * np.cos(2 * np.pi * (64 / 2048) * t)
    ).astype(np.float32)
    for sideband in ("upper", "lower"):
        tx = np.asarray(ssb_modulate(msg, 0.2, sideband))
        spec = np.abs(np.fft.fft(tx))
        freqs = np.fft.fftfreq(n)
        upper_e = np.sum(spec[(freqs > 0.2) & (freqs < 0.25)] ** 2)
        lower_e = np.sum(spec[(freqs < 0.2) & (freqs > 0.15)] ** 2)
        if sideband == "upper":
            assert upper_e > 100 * lower_e
        else:
            assert lower_e > 100 * upper_e
        back = np.asarray(ssb_demodulate(tx, 0.2, sideband))
        assert np.sqrt(np.mean((back - msg) ** 2)) < 1e-3 * np.sqrt(
            np.mean(msg**2)
        ) * 10


def test_ssb_occupies_half_the_bandwidth_of_am(rng):
    from aether_primitives_tpu.ops.analog import am_mod, ssb_modulate

    n = 4096
    msg = np.sin(2 * np.pi * (82 / 4096) * np.arange(n)).astype(np.float32)
    fc = 410 / 4096  # grid-aligned carrier: no leakage floor in the check
    ssb = np.asarray(ssb_modulate(msg, fc))
    am = np.asarray(am_mod(msg, depth=0.5, carrier_freq=fc))
    freqs = np.fft.fftfreq(n)
    s_ssb = np.abs(np.fft.fft(ssb)) ** 2
    s_am = np.abs(np.fft.fft(am)) ** 2
    # AM has energy at both 0.08 and 0.12; SSB only above the carrier
    lo = (freqs > 0.075) & (freqs < 0.085)
    hi = (freqs > 0.115) & (freqs < 0.125)
    assert s_am[lo].sum() > 0.1 * s_am[hi].sum()
    assert s_ssb[lo].sum() < 1e-4 * s_ssb[hi].sum()

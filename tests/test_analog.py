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

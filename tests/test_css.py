"""CSS (LoRa-style) modem: chirp identity, roundtrips, below-noise-floor
operation (processing gain), and fractional-CFO tolerance."""

import numpy as np
import pytest

from aether_primitives_tpu.models.css import CssConfig, CssModem


def test_shifted_chirp_identity():
    # modulate_symbols must produce exact cyclic shifts of the base chirp
    m = CssModem(CssConfig(sf=6))
    n = 64
    k = np.arange(n)
    u = np.exp(1j * np.pi * (k * k % (2 * n)) / n)
    for s in (0, 1, 17, 63):
        got = np.asarray(m.modulate_symbols(np.array([s])))
        want = np.roll(u, -s)  # u[(k+s) mod N]
        assert np.abs(got - want).max() < 1e-5, s


def test_loopback_exact(rng):
    m = CssModem(CssConfig(sf=8))
    bits = rng.integers(0, 2, 8 * 100).astype(np.uint8)
    out = np.asarray(m.loopback(bits))
    assert (out == bits).all()


def test_unit_envelope_and_full_spread(rng):
    m = CssModem(CssConfig(sf=8))
    bits = rng.integers(0, 2, 8 * 64).astype(np.uint8)
    chips = np.asarray(m.tx(bits))
    assert np.allclose(np.abs(chips), 1.0, atol=1e-5)  # constant envelope
    spec = np.abs(np.fft.fft(chips)) ** 2
    # energy spread across the whole band: no quarter holds > 40%
    q = spec.reshape(4, -1).sum(axis=1) / spec.sum()
    assert q.max() < 0.4


def test_below_noise_floor(rng):
    # SF 10: 30 dB processing gain; run at -10 dB chip SNR
    m = CssModem(CssConfig(sf=10))
    bits = rng.integers(0, 2, 10 * 40).astype(np.uint8)
    chips = np.asarray(m.tx(bits))
    sigma = np.sqrt(10.0 / 2)  # noise power 10x signal power
    noisy = (chips + sigma * (rng.normal(size=chips.size)
                              + 1j * rng.normal(size=chips.size))).astype(np.complex64)
    out = np.asarray(m.rx(noisy))
    assert (out == bits).all()


def test_peak_metric_confidence(rng):
    m = CssModem(CssConfig(sf=8))
    bits = rng.integers(0, 2, 8 * 16).astype(np.uint8)
    chips = np.asarray(m.tx(bits))
    _, clean = m.demod_symbols(chips)
    assert np.allclose(np.asarray(clean), 1.0, atol=1e-4)
    noisy = chips + 1.0 * (rng.normal(size=chips.size)
                           + 1j * rng.normal(size=chips.size))
    _, dirty = m.demod_symbols(noisy.astype(np.complex64))
    assert np.asarray(dirty).mean() < 2.0  # bounded, not clean-1.0


def test_fractional_cfo_tolerance(rng):
    # CFO under half a bin (1/(2N) cycles/chip) must not flip decisions
    m = CssModem(CssConfig(sf=8))
    bits = rng.integers(0, 2, 8 * 50).astype(np.uint8)
    chips = np.asarray(m.tx(bits))
    n = np.arange(chips.size)
    cfo = 0.3 / 256  # 0.3 bins
    rx = (chips * np.exp(2j * np.pi * cfo * n)).astype(np.complex64)
    out = np.asarray(m.rx(rx))
    assert (out == bits).all()


def test_bad_lengths_raise(rng):
    m = CssModem(CssConfig(sf=8))
    with pytest.raises(ValueError, match="sf"):
        m.tx(np.zeros(13, np.uint8))
    with pytest.raises(ValueError, match="N"):
        m.rx(np.zeros(100, np.complex64))

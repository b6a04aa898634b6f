"""Channel models: statistical properties of each impairment (Rayleigh
envelope, Jakes autocorrelation vs Bessel J0, Wiener phase variance,
Rapp compression) and an end-to-end PacketModem run through the composed
channel."""

import numpy as np
import pytest

import jax

from aether_primitives_tpu.models import channel as ch


def test_delay_pad_places_burst(rng):
    x = (rng.normal(size=100) + 1j * rng.normal(size=100)).astype(np.complex64)
    cap = np.asarray(ch.delay_pad(x, 37, 300))
    assert cap.shape == (300,)
    assert np.allclose(cap[37:137], x)
    assert np.abs(cap[:37]).max() == 0 and np.abs(cap[137:]).max() == 0


def test_multipath_is_linear_convolution(rng):
    x = (rng.normal(size=256) + 1j * rng.normal(size=256)).astype(np.complex64)
    taps = np.array([1.0, 0.0, 0.4 - 0.2j], np.complex64)
    got = np.asarray(ch.multipath(x, taps))
    want = np.convolve(x, taps)[:256]
    assert np.abs(got - want).max() < 1e-5


def test_rayleigh_block_statistics():
    key = jax.random.key(0)
    x = np.ones(512 * 400, np.complex64)
    y = np.asarray(ch.rayleigh_block(key, x, 512)).reshape(400, 512)
    gains = y[:, 0]
    assert np.allclose(y, gains[:, None])  # constant within block
    assert abs(np.mean(np.abs(gains) ** 2) - 1.0) < 0.1  # unit mean power
    # Rayleigh envelope: P(|g| < r) = 1 - exp(-r^2); check the median
    med = np.median(np.abs(gains))
    assert abs(med - np.sqrt(np.log(2))) < 0.08


def test_jakes_autocorrelation_matches_bessel():
    from scipy.special import j0

    key = jax.random.key(3)
    fd, n = 2e-3, 60000
    h = np.asarray(ch.jakes(key, n, fd, n_paths=64))
    assert abs(np.mean(np.abs(h) ** 2) - 1.0) < 0.05
    # empirical autocorrelation at a few lags vs J0(2 pi fd tau)
    for lag in (25, 50, 100, 200):
        emp = np.mean(h[lag:] * np.conj(h[:-lag])).real
        assert abs(emp - j0(2 * np.pi * fd * lag)) < 0.12, lag


def test_phase_noise_wiener_variance():
    key = jax.random.key(1)
    lw = 1e-5
    x = np.ones(200000, np.complex64)
    y = np.asarray(ch.phase_noise(key, x, lw))
    walk = np.unwrap(np.angle(y))
    # Var[phi_n] = n * 2 pi * linewidth
    n = 100000
    assert abs(np.var(np.diff(walk)) - 2 * np.pi * lw) < 0.2 * 2 * np.pi * lw


def test_iq_imbalance_image_tone(rng):
    n = np.arange(4096)
    x = np.exp(2j * np.pi * (410 / 4096) * n).astype(np.complex64)
    y = np.asarray(ch.iq_imbalance(x, amp_db=1.0, phase_deg=5.0))
    spec = np.abs(np.fft.fft(y))
    # imbalance creates the image at -f with finite rejection
    image = spec[4096 - 410]
    main = spec[410]
    assert 10 < 20 * np.log10(main / image) < 40


def test_pa_saturate_compression():
    x = np.array([0.1, 1.0, 10.0], np.complex64)
    y = np.abs(np.asarray(ch.pa_saturate(x, sat_level=1.0, p=2.0)))
    assert abs(y[0] - 0.1) < 1e-3  # linear region untouched
    assert y[2] < 1.01  # deep saturation clamps at A
    assert y[1] < 1.0  # 0 dB input compressed
    # phase preserved
    xc = np.array([3.0 * np.exp(1j * 0.7)], np.complex64)
    yc = np.asarray(ch.pa_saturate(xc, 1.0))
    assert abs(np.angle(yc[0]) - 0.7) < 1e-5


def test_composed_channel_packet_recovery(rng):
    from aether_primitives_tpu.models.packet import PacketConfig, PacketModem

    pm = PacketModem(PacketConfig(payload_bits=960, fec="viterbi"))
    payload = rng.integers(0, 2, 960).astype(np.uint8)
    burst = pm.tx(payload)
    cfg = ch.ChannelConfig(
        taps=(1.0, 0.0, 0.15 + 0.1j),
        delay=400,
        capture_len=4096,
        cfo=9e-4,
        linewidth=2e-8,
        iq_amp_db=0.2,
        dc=0.01 + 0.02j,
        noise_power=0.02,
    )
    cap = ch.Channel(cfg).apply(jax.random.key(7), burst)
    bits, ok, diag = pm.rx(np.asarray(cap))
    assert bool(ok)
    assert (np.asarray(bits) == payload).all()
    assert int(diag["offset"]) == 400


def test_rayleigh_block_length_validation():
    with pytest.raises(ValueError, match="divisible"):
        ch.rayleigh_block(jax.random.key(0), np.ones(100, np.complex64), 33)

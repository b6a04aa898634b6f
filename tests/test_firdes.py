"""Filter design: spec compliance of windowed/Kaiser designs, equiripple
property + scipy cross-check of the remez exchange, Hilbert transformer
quadrature, and band transforms."""

import numpy as np
import pytest

from aether_primitives_tpu.ops import firdes


def _response(h, freqs):
    n = np.arange(h.size)
    return np.array([np.sum(h * np.exp(-2j * np.pi * f * n)) for f in freqs])


def test_windowed_sinc_lowpass_spec():
    h = firdes.windowed_sinc(101, 0.1)
    f = np.linspace(0, 0.5, 256)
    mag = np.abs(_response(h, f))
    assert abs(mag[0] - 1.0) < 1e-6  # unit DC gain
    assert mag[f > 0.16].max() < 10 ** (-40 / 20)  # hamming floor
    assert mag[f < 0.07].min() > 0.98


def test_kaiser_meets_attenuation_spec():
    h = firdes.kaiser_lowpass(0.125, transition_width=0.02, atten_db=70)
    f = np.linspace(0, 0.5, 1024)
    mag = np.abs(_response(h, f))
    assert mag[f > 0.125 + 0.011].max() < 10 ** (-70 / 20)
    assert np.all(np.abs(mag[f < 0.125 - 0.011] - 1.0) < 10 ** (-70 / 20) * 10)


def test_kaiser_order_monotonic():
    assert firdes.kaiser_order(80, 0.01) > firdes.kaiser_order(80, 0.05)
    assert firdes.kaiser_order(100, 0.02) > firdes.kaiser_order(40, 0.02)
    assert firdes.kaiser_order(60, 0.02) % 2 == 1


def test_remez_lowpass_equiripple_and_scipy_match():
    scipy_signal = pytest.importorskip("scipy.signal")
    ntaps, bands, des = 61, [(0.0, 0.10), (0.15, 0.5)], [1.0, 0.0]
    h = firdes.remez(ntaps, bands, des)
    ref = scipy_signal.remez(ntaps, [0, 0.10, 0.15, 0.5], [1.0, 0.0], fs=1.0)
    f = np.linspace(0, 0.5, 4096)
    mag = np.abs(_response(h, f))
    mag_ref = np.abs(_response(ref, f))
    # minimax deviation within 2% of scipy's
    dev = max(np.abs(mag[f <= 0.10] - 1.0).max(), mag[f >= 0.15].max())
    dev_ref = max(np.abs(mag_ref[f <= 0.10] - 1.0).max(), mag_ref[f >= 0.15].max())
    assert dev < dev_ref * 1.02
    # equiripple: passband + stopband peak errors equal within 1%
    pb = np.abs(mag[f <= 0.10] - 1.0).max()
    sb = mag[f >= 0.15].max()
    assert abs(pb - sb) < 0.01 * max(pb, sb)
    # symmetric (linear phase)
    assert np.allclose(h, h[::-1], atol=1e-12)


def test_remez_weighted_stopband():
    # weighting the stopband 10x trades passband ripple for attenuation
    bands, des = [(0.0, 0.10), (0.15, 0.5)], [1.0, 0.0]
    h_flat = firdes.remez(61, bands, des, weights=[1.0, 1.0])
    h_deep = firdes.remez(61, bands, des, weights=[1.0, 10.0])
    f = np.linspace(0, 0.5, 4096)
    sb_flat = np.abs(_response(h_flat, f[f >= 0.15])).max()
    sb_deep = np.abs(_response(h_deep, f[f >= 0.15])).max()
    assert sb_deep < sb_flat / 2.5


def test_remez_bandpass_scipy_match():
    scipy_signal = pytest.importorskip("scipy.signal")
    ntaps = 71
    bands = [(0.0, 0.08), (0.12, 0.22), (0.27, 0.5)]
    des = [0.0, 1.0, 0.0]
    h = firdes.remez(ntaps, bands, des)
    ref = scipy_signal.remez(
        ntaps, [0, 0.08, 0.12, 0.22, 0.27, 0.5], [0.0, 1.0, 0.0], fs=1.0
    )
    f = np.linspace(0, 0.5, 4096)
    dev = np.abs(np.abs(_response(h, f)) - np.abs(_response(ref, f))).max()
    assert dev < 5e-3  # same minimax solution to plotting accuracy


def test_remez_validation():
    with pytest.raises(ValueError, match="odd"):
        firdes.remez(60, [(0.0, 0.1), (0.2, 0.5)], [1, 0])
    with pytest.raises(ValueError, match="ascend"):
        firdes.remez(61, [(0.2, 0.1)], [1])


def test_hilbert_taps_quadrature():
    h = firdes.hilbert_taps(63)
    # antisymmetric type III
    assert np.allclose(h, -h[::-1], atol=1e-12)
    # response ~ -j sign(f): check magnitude ~1 and phase 90 deg mid-band
    for f0 in (0.1, 0.2, 0.3, 0.4):
        r = _response(h, [f0])[0] * np.exp(2j * np.pi * f0 * 31)  # undo delay
        assert abs(abs(r) - 1.0) < 0.01
        assert abs(np.angle(r) + np.pi / 2) < 0.01


def test_band_transforms():
    lp = firdes.windowed_sinc(101, 0.1)
    f = np.linspace(0, 0.5, 512)
    hp = firdes.band_transform(lp, "highpass")
    mag_hp = np.abs(_response(hp, f))
    assert mag_hp[-1] > 0.99 and mag_hp[0] < 1e-3
    bp = firdes.band_transform(lp, "bandpass", center=0.25)
    mag_bp = np.abs(_response(bp, f))
    assert mag_bp[np.argmin(np.abs(f - 0.25))] > 0.99
    assert mag_bp[0] < 1e-3 and mag_bp[-1] < 1e-3
    bs = firdes.band_transform(lp, "bandstop", center=0.25)
    mag_bs = np.abs(_response(bs, f))
    assert mag_bs[np.argmin(np.abs(f - 0.25))] < 1e-2
    assert mag_bs[0] > 0.99 and mag_bs[-1] > 0.99

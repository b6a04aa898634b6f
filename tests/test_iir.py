"""IIR via associative scan: exactness vs scipy.sosfilt, streaming,
design cross-checks."""

import numpy as np
import pytest
import scipy.signal as ss

from aether_primitives_tpu.ops.iir import (
    biquad_apply,
    butter_sos,
    fm_deemphasis_sos,
    sosfilt,
    sosfilt_stream,
)


@pytest.mark.parametrize("order,btype", [(2, "lowpass"), (4, "lowpass"),
                                         (3, "highpass"), (5, "highpass")])
def test_butter_matches_scipy(order, btype):
    mine = butter_sos(order, 0.08, btype)
    ref = ss.butter(order, 0.16, btype=btype.replace("pass", ""), output="sos")
    w, h1 = ss.sosfreqz(mine, worN=512)
    _, h2 = ss.sosfreqz(ref, worN=512)
    assert np.abs(np.abs(h1) - np.abs(h2)).max() < 1e-9


def test_sosfilt_matches_scipy_complex(rng):
    x = (rng.normal(size=4096) + 1j * rng.normal(size=4096)).astype(np.complex64)
    sos = butter_sos(4, 0.1)
    got = np.asarray(sosfilt(sos, x))
    ref = ss.sosfilt(sos, x.astype(np.complex128))
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert 20 * np.log10(err) < -100


def test_sosfilt_streaming_equals_one_shot(rng):
    x = (rng.normal(size=3000) + 1j * rng.normal(size=3000)).astype(np.complex64)
    sos = butter_sos(5, 0.07)
    whole = np.asarray(sosfilt(sos, x))
    states = [None] * sos.shape[0]
    parts = []
    for blk in (x[:1000], x[1000:1700], x[1700:]):
        y, states = sosfilt_stream(sos, blk, states)
        parts.append(np.asarray(y))
    got = np.concatenate(parts)
    assert np.abs(got - whole).max() < 1e-4


def test_sosfilt_batched(rng):
    x = (rng.normal(size=(3, 512)) + 1j * rng.normal(size=(3, 512))).astype(
        np.complex64
    )
    sos = butter_sos(2, 0.2)
    got = np.asarray(sosfilt(sos, x))
    for i in range(3):
        row = np.asarray(sosfilt(sos, x[i]))
        assert np.allclose(got[i], row, atol=1e-5)


def test_biquad_impulse_response_decays(rng):
    sos = butter_sos(2, 0.05)
    x = np.zeros(2048, np.complex64)
    x[0] = 1.0
    y, s = biquad_apply(x, sos[0])
    y = np.asarray(y)
    assert np.abs(y[-100:]).max() < 1e-5  # stable pole pair dies out
    assert np.asarray(s).shape == (2,)


def test_fm_deemphasis_rolls_off_highs():
    sos = fm_deemphasis_sos(tau_samples=10.0)
    w, h = ss.sosfreqz(sos, worN=512)
    assert abs(abs(h[0]) - 1.0) < 1e-3  # unity DC
    assert abs(h[-1]) < 0.2  # strong rolloff near Nyquist
    # -3 dB point at 1/(2 pi tau) cycles/sample
    f3 = 1.0 / (2 * np.pi * 10.0)
    k3 = int(round(f3 / 0.5 * 511))
    assert abs(abs(h[k3]) - 1 / np.sqrt(2)) < 0.03


def test_butter_validation():
    with pytest.raises(ValueError, match="cutoff"):
        butter_sos(2, 0.7)
    with pytest.raises(ValueError, match="btype"):
        butter_sos(2, 0.1, "bandzap")
    with pytest.raises(ValueError, match="f_low"):
        butter_sos(2, 0.1, "bandpass")
    with pytest.raises(ValueError, match="f_low"):
        butter_sos(2, (0.2, 0.1), "bandpass")


@pytest.mark.parametrize("order", [2, 3, 4])
def test_butter_band_types_match_scipy(order):
    for btype, co, wn in (
        ("bandpass", (0.05, 0.12), (0.1, 0.24)),
        ("bandstop", (0.08, 0.2), (0.16, 0.4)),
    ):
        mine = butter_sos(order, co, btype)
        ref = ss.butter(order, wn, btype=btype, output="sos")
        _, h1 = ss.sosfreqz(mine, worN=1024)
        _, h2 = ss.sosfreqz(ref, worN=1024)
        assert np.abs(np.abs(h1) - np.abs(h2)).max() < 1e-6, (order, btype)


def test_bandpass_filter_isolates_tone(rng):
    n = 8192
    t = np.arange(n)
    want = np.exp(2j * np.pi * 0.09 * t)
    x = (want + np.exp(2j * np.pi * 0.3 * t) + np.exp(2j * np.pi * 0.01 * t)).astype(
        np.complex64
    )
    sos = butter_sos(4, (0.07, 0.11), "bandpass")
    y = np.asarray(sosfilt(sos, x))[2000:]
    ref = want[2000:]
    # the filter delays/rotates the passband tone: project out the best
    # complex gain, judge the residual (out-of-band leakage + ripple)
    g = np.vdot(ref, y) / np.vdot(ref, ref)
    err = np.linalg.norm(y - g * ref) / np.linalg.norm(g * ref)
    assert abs(abs(g) - 1.0) < 0.05  # passband ~unity
    assert 20 * np.log10(err) < -25, 20 * np.log10(err)

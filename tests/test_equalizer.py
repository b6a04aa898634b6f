"""Adaptive equalizer tests: trained LMS opens a closed eye and recovers
exact bits through a dispersive channel; decision-directed tracking holds
the eye open; blind CMA concentrates the combined response onto one tap."""

import numpy as np
import pytest

from aether_primitives_tpu.models import equalizer
from aether_primitives_tpu.ops import modulation


CHANNEL = np.array([0.2j, 1.0, 0.45, -0.25 + 0.15j], np.complex64)


def _qpsk_through_channel(rng, nsym, noise=1e-3):
    qpsk = modulation.qpsk()
    bits = rng.integers(0, 2, 2 * nsym).astype(np.uint8)
    tx = np.asarray(qpsk.modulate(bits)) / np.sqrt(2)  # unit modulus
    x = np.convolve(tx, CHANNEL)[:nsym]
    x += np.sqrt(noise / 2) * (
        rng.normal(size=nsym) + 1j * rng.normal(size=nsym)
    )
    return bits, tx, x.astype(np.complex64)


def _evm(y, ref):
    return np.sqrt(np.mean(np.abs(y - ref) ** 2) / np.mean(np.abs(ref) ** 2))


def test_lms_opens_the_eye_and_recovers_bits(rng):
    nsym, ntrain, delay = 4000, 1200, 4
    bits, tx, x = _qpsk_through_channel(rng, nsym)
    y, w, err = equalizer.lms_equalize(x, tx[:ntrain], ntaps=15, mu=0.4,
                                       delay=delay)
    y = np.asarray(y)
    # raw channel EVM is catastrophic; equalized tail is clean
    raw = _evm(x[delay:3000 + delay], tx[:3000])
    eq = _evm(y[ntrain:3000 + delay], tx[ntrain - delay:3000])
    assert raw > 0.4
    assert eq < 0.08, (raw, eq)
    # error magnitudes fell by an order of magnitude over training
    err = np.asarray(err)
    assert np.mean(err[-100:]) < 0.1 * np.mean(err[:100])
    # exact bits on the post-training span
    qpsk = modulation.qpsk()
    got = np.asarray(qpsk.demod(np.asarray(y)[delay:][: nsym - delay]))
    assert (got == bits[: 2 * (nsym - delay)]).all()


def test_dd_equalizer_tracks_after_training(rng):
    nsym, ntrain, delay = 3000, 800, 4
    bits, tx, x = _qpsk_through_channel(rng, nsym)
    _, w, _ = equalizer.lms_equalize(x[:ntrain], tx[:ntrain], ntaps=15,
                                     mu=0.4, delay=delay)
    # decision-directed continuation over the remainder, warm-started
    y2, w2 = equalizer.dd_equalize(x[ntrain:], modulation.qpsk().table,
                                   ntaps=15, mu=0.05, w0=w)
    qpsk = modulation.qpsk()
    # window context is lost at the split; skip the first ntaps outputs
    got = np.asarray(qpsk.demod(np.asarray(y2)[15:]))
    want_syms = (nsym - ntrain - 15)
    want = bits[2 * (ntrain - delay + 15) : 2 * (ntrain - delay + 15 + want_syms)]
    assert (got == want).all()


def test_cma_blind_concentrates_combined_response(rng):
    nsym = 8000
    _, tx, x = _qpsk_through_channel(rng, nsym, noise=1e-4)
    y, w = equalizer.cma_equalize(x, ntaps=15, mu=0.02, r2=1.0)
    w = np.asarray(w)
    combined = np.convolve(np.asarray(CHANNEL, np.complex128), w)
    e = np.abs(combined) ** 2
    peak_ratio = e.max() / e.sum()
    assert peak_ratio > 0.95, peak_ratio  # residual ISI < ~-13 dB
    # and the output modulus dispersion collapsed vs the input
    disp_in = np.mean((np.abs(x[2000:]) ** 2 - 1.0) ** 2)
    disp_out = np.mean((np.abs(np.asarray(y)[2000:]) ** 2 - 1.0) ** 2)
    assert disp_out < 0.2 * disp_in, (disp_in, disp_out)


def test_lms_scale_free_step(rng):
    # normalized LMS: scaling the input by 100x converges the same
    nsym, ntrain, delay = 2000, 800, 4
    _, tx, x = _qpsk_through_channel(rng, nsym)
    _, _, e1 = equalizer.lms_equalize(x, tx[:ntrain], ntaps=15, mu=0.4, delay=delay)
    _, _, e2 = equalizer.lms_equalize(
        100.0 * x, 100.0 * tx[:ntrain], ntaps=15, mu=0.4, delay=delay
    )
    r1 = np.mean(np.asarray(e1)[-100:]) / np.mean(np.asarray(e1)[:100])
    r2 = np.mean(np.asarray(e2)[-100:]) / np.mean(np.asarray(e2)[:100])
    assert abs(r1 - r2) < 0.05


def test_fdaf_system_identification(rng):
    # identify an unknown 33-tap channel from input/output observation
    h = (0.5 * (rng.normal(size=33) + 1j * rng.normal(size=33))).astype(
        np.complex64
    )
    h /= np.sqrt(np.sum(np.abs(h) ** 2))
    n = 1 << 15
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    d = np.convolve(x, h)[:n] + 1e-3 * (
        rng.normal(size=n) + 1j * rng.normal(size=n)
    )
    y, w, err = equalizer.fdaf(x, d.astype(np.complex64), ntaps=33, mu=0.5)
    w = np.asarray(w)
    mis = np.sum(np.abs(w - h) ** 2) / np.sum(np.abs(h) ** 2)
    assert mis < 1e-3, mis  # -30 dB weight misadjustment
    err = np.asarray(err)
    assert err[-1] < 0.05 * err[0]  # converged
    # output tracks d once converged
    tail = slice(n // 2, n)
    rel = np.sqrt(
        np.mean(np.abs(np.asarray(y)[tail] - d[tail]) ** 2)
        / np.mean(np.abs(d[tail]) ** 2)
    )
    assert rel < 0.05


def test_fdaf_tracks_channel_change(rng):
    # the weights follow a mid-stream channel switch (the tracking use-case)
    h1 = np.array([1.0, 0.5, -0.25], np.complex64)
    h2 = np.array([0.3, -1.0, 0.4j], np.complex64)
    n = 1 << 15
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    d1 = np.convolve(x[: n // 2], h1)[: n // 2]
    d2 = np.convolve(x[n // 2 :], h2)[: n // 2]
    d = np.concatenate([d1, d2]).astype(np.complex64)
    y, w, err = equalizer.fdaf(x, d, ntaps=8, mu=0.5)
    w = np.asarray(w)
    assert np.sum(np.abs(w[:3] - h2) ** 2) / np.sum(np.abs(h2) ** 2) < 1e-2


def test_fdaf_length_mismatch_raises(rng):
    with pytest.raises(ValueError, match="equal lengths"):
        equalizer.fdaf(
            np.zeros(128, np.complex64), np.zeros(100, np.complex64), 8
        )


# ---- RLS -----------------------------------------------------------------------


def test_rls_identifies_channel_fast(rng):
    from aether_primitives_tpu.models.equalizer import lms_equalize, rls_equalize
    from aether_primitives_tpu.ops import modulation as mod

    q = mod.qpsk()
    bits = rng.integers(0, 2, 2 * 800).astype(np.uint8)
    s = np.asarray(q.modulate(bits))
    h = np.array([0.2, 1.0, -0.3 + 0.2j, 0.1j], np.complex64)
    x = np.convolve(s, h)[: len(s)].astype(np.complex64)
    delay = 4
    # RLS with only 60 training symbols
    y_r, w_r, err_r = rls_equalize(x, s[: 60], ntaps=9, delay=delay)
    out_r = np.asarray(y_r)[delay : delay + len(s) - delay]
    ref = s[: len(out_r)]
    evm_r = np.sqrt(np.mean(np.abs(out_r[100:] - ref[100:]) ** 2))
    assert evm_r < 0.1, evm_r
    # NLMS with the same 60 symbols has NOT converged yet
    y_l, w_l, err_l = lms_equalize(x, s[: 60], ntaps=9, mu=0.2, delay=delay)
    out_l = np.asarray(y_l)[delay : delay + len(s) - delay]
    evm_l = np.sqrt(np.mean(np.abs(out_l[100:] - ref[100:]) ** 2))
    assert evm_r < evm_l / 2, (evm_r, evm_l)


def test_rls_error_converges(rng):
    from aether_primitives_tpu.models.equalizer import rls_equalize
    from aether_primitives_tpu.ops import modulation as mod

    q = mod.qpsk()
    bits = rng.integers(0, 2, 2 * 400).astype(np.uint8)
    s = np.asarray(q.modulate(bits))
    h = np.array([1.0, 0.4 - 0.3j, -0.2], np.complex64)
    x = np.convolve(s, h)[: len(s)].astype(np.complex64)
    _, _, err = rls_equalize(x, s[:200], ntaps=7, delay=3)
    err = np.asarray(err)
    assert err[30:].mean() < 0.25 * err[:10].mean()

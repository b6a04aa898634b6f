"""Blind modulation classification: cumulant signatures + classification
accuracy under noise, rotation, and SNR-correction."""

import numpy as np
import pytest

from aether_primitives_tpu.models.amc import (
    SIGNATURES,
    classify_modulation,
    cumulant_features,
)
from aether_primitives_tpu.ops import modulation as mod


def _symbols(name, n, rng):
    m = {
        "bpsk": mod.bpsk,
        "qpsk": mod.qpsk,
        "psk8": lambda: mod.psk(8),
        "qam16": mod.qam16,
        "qam64": lambda: mod.qam(64),
    }[name]()
    bits = rng.integers(0, 2, n * m.bits_per_symbol).astype(np.uint8)
    return np.asarray(m.modulate(bits))


KNOWN = {  # classic theory values (Swami-Sadler): |C20|, |C40|
    "bpsk": (1.0, 2.0),
    "qpsk": (0.0, 1.0),
    "psk8": (0.0, 0.0),
    "qam16": (0.0, 0.68),
    "qam64": (0.0, 0.6190),
}


@pytest.mark.parametrize("name", list(SIGNATURES))
def test_signatures_match_theory_and_samples(name, rng):
    # the table-derived signatures reproduce the published theory values
    sig = SIGNATURES[name]
    assert abs(sig[0] - KNOWN[name][0]) < 1e-3
    assert abs(sig[1] - KNOWN[name][1]) < 1e-3
    # and a long sampled block reproduces the signature moments
    syms = _symbols(name, 200_000, rng)
    feats = np.asarray(cumulant_features(syms))
    assert abs(feats[0] - sig[0]) < 0.03
    assert abs(feats[1] - sig[1]) < 0.03
    assert abs(feats[2] - sig[2]) < 0.03  # m4 = kappa4
    assert abs(feats[3] - sig[3]) < 0.06  # m6 = kappa6


@pytest.mark.parametrize("name", list(SIGNATURES))
def test_classify_at_15db(name, rng):
    n = 16384
    syms = _symbols(name, n, rng)
    snr = 10 ** (15 / 10)
    sigma = np.sqrt(np.mean(np.abs(syms) ** 2) / snr / 2)
    noisy = syms + sigma * (rng.normal(size=n) + 1j * rng.normal(size=n))
    # arbitrary carrier-phase rotation: features are rotation-invariant
    noisy = (noisy * np.exp(1j * 0.7)).astype(np.complex64)
    got, scores = classify_modulation(noisy)
    assert got == name, (got, scores)


def test_classify_psk_family_at_8db(rng):
    # the PSK family stays separable at low SNR with the M2M4 correction
    for name in ("bpsk", "qpsk", "psk8"):
        n = 8192
        syms = _symbols(name, n, rng)
        snr = 10 ** (8 / 10)
        sigma = np.sqrt(1.0 / snr / 2) * np.sqrt(np.mean(np.abs(syms) ** 2))
        noisy = (syms + sigma * (rng.normal(size=n) + 1j * rng.normal(size=n))).astype(
            np.complex64
        )
        got, _ = classify_modulation(noisy, candidates=("bpsk", "qpsk", "psk8"))
        assert got == name


def test_classify_batched(rng):
    rows = [_symbols("qpsk", 4096, rng), _symbols("qam16", 4096, rng)]
    x = np.stack(rows)
    snr = 10 ** (18 / 10)
    sigma = np.sqrt(np.mean(np.abs(x) ** 2) / snr / 2)
    x = (x + sigma * (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape))).astype(
        np.complex64
    )
    names, scores = classify_modulation(x)
    assert names == ["qpsk", "qam16"]
    assert scores.shape == (2, 5)


def test_hypothesis_conditioning_beats_raw_at_10db(rng):
    # at 10 dB the QAM16 C42 shrinks by rho^2 ~ 0.83 toward the QPSK
    # value; the hypothesis-conditioned matcher still picks qam16 where a
    # raw-signature nearest-neighbor would not
    n = 32768
    syms = _symbols("qam16", n, rng)
    snr = 10 ** (10 / 10)
    sigma = np.sqrt(np.mean(np.abs(syms) ** 2) / snr / 2)
    noisy = (syms + sigma * (rng.normal(size=n) + 1j * rng.normal(size=n))).astype(
        np.complex64
    )
    got, _ = classify_modulation(noisy, candidates=("qpsk", "qam16"))
    assert got == "qam16"

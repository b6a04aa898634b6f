"""CPFSK/MSK/GMSK tests: constant envelope, MSK phase steps, loopbacks
under noise, GMSK spectral containment vs MSK."""

import numpy as np
import pytest

from aether_primitives_tpu.models.fsk import FskConfig, FskModem, gaussian_pulse


def test_msk_constant_envelope_and_phase_steps(rng):
    m = FskModem(FskConfig(sps=8, h=0.5))
    bits = rng.integers(0, 2, 64).astype(np.uint8)
    x = np.asarray(m.modulate(bits))
    assert np.allclose(np.abs(x), 1.0, atol=1e-5)
    # MSK: the instantaneous frequency is exactly the NRZ sequence at
    # +-h/(2*sps) cycles/sample — constant over each symbol span
    from aether_primitives_tpu.ops import analog

    inst = np.asarray(analog.fm_demod(x, FskModem(FskConfig(sps=8)).deviation))
    per_sym = inst[: inst.size // 8 * 8].reshape(-1, 8)[:, 1:]
    want = (2.0 * bits.astype(np.float64) - 1.0)[: per_sym.shape[0]]
    assert np.allclose(per_sym, want[:, None], atol=1e-3)


def test_msk_loopback_with_noise(rng):
    m = FskModem(FskConfig(sps=8))
    bits = rng.integers(0, 2, 2000).astype(np.uint8)
    x = np.asarray(m.modulate(bits))
    noisy = (x + 0.15 * (rng.normal(size=x.size)
                         + 1j * rng.normal(size=x.size))).astype(np.complex64)
    out = np.asarray(m.demodulate(noisy))
    assert (out == bits).all()


def test_gmsk_loopback(rng):
    m = FskModem(FskConfig(sps=8, bt=0.3))
    bits = rng.integers(0, 2, 2000).astype(np.uint8)
    x = np.asarray(m.modulate(bits))
    assert x.size == bits.size * 8 + m.pulse.size - 8  # flushed tail
    assert np.allclose(np.abs(x), 1.0, atol=1e-4)  # still constant envelope
    out = np.asarray(m.demodulate(x))
    assert out.size == bits.size
    assert (out == bits).all()


def test_gmsk_spectrum_tighter_than_msk(rng):
    from aether_primitives_tpu.models.channelizer import welch_psd

    bits = rng.integers(0, 2, 4096).astype(np.uint8)
    sps = 8
    psd = {}
    for name, bt in (("msk", None), ("gmsk", 0.3)):
        x = np.asarray(FskModem(FskConfig(sps=sps, bt=bt)).modulate(bits))
        freqs, p = welch_psd(x, 1024, shift=True)
        psd[name] = (freqs, np.asarray(p))
    # out-of-band power beyond 1.5x the symbol rate
    f, _ = psd["msk"]
    oob = np.abs(f) > 1.5 / sps
    oob_msk = psd["msk"][1][oob].sum() / psd["msk"][1].sum()
    oob_gmsk = psd["gmsk"][1][oob].sum() / psd["gmsk"][1].sum()
    assert oob_gmsk < 0.1 * oob_msk, (oob_msk, oob_gmsk)


def test_gaussian_pulse_properties():
    g = gaussian_pulse(0.3, 8, span=3)
    assert abs(g.sum() - 8.0) < 1e-4  # unit area in symbol time
    assert (g == g[::-1]).all()  # symmetric
    assert g.argmax() == g.size // 2


# ----------------------------------------------------------------- OQPSK


def test_oqpsk_roundtrip_and_envelope(rng):
    from aether_primitives_tpu.models.fsk import oqpsk_demodulate, oqpsk_modulate

    bits = rng.integers(0, 2, 2 * 512).astype(np.uint8)
    x = np.asarray(oqpsk_modulate(bits, sps=8))
    back = np.asarray(oqpsk_demodulate(x, len(bits), sps=8))
    assert (back == bits).all()
    # the offset keeps the envelope off zero in steady state (plain QPSK
    # crosses zero on 180-degree transitions)
    core = np.abs(x[8 * 8 : -8 * 8])
    assert core.min() > 0.2 * core.max()


def test_oqpsk_under_noise(rng):
    from aether_primitives_tpu.models.fsk import oqpsk_demodulate, oqpsk_modulate

    bits = rng.integers(0, 2, 2 * 2048).astype(np.uint8)
    x = np.asarray(oqpsk_modulate(bits, sps=4))
    noisy = (x + 0.05 * (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape))
             ).astype(np.complex64)
    back = np.asarray(oqpsk_demodulate(noisy, len(bits), sps=4))
    assert (back == bits).mean() > 0.9995


def test_oqpsk_validation():
    from aether_primitives_tpu.models.fsk import oqpsk_modulate

    with pytest.raises(ValueError, match="PAIRS"):
        oqpsk_modulate(np.zeros(3, np.uint8))
    with pytest.raises(ValueError, match="even"):
        oqpsk_modulate(np.zeros(4, np.uint8), sps=5)

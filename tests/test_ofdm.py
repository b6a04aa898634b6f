"""CP-OFDM tests: loopback, exact one-tap equalization through multipath
within the CP, and blind CP-based timing/CFO sync."""

import numpy as np
import pytest

from aether_primitives_tpu.models.ofdm import OfdmConfig, OfdmModem, cp_sync
from aether_primitives_tpu.models.sync import OfdmEqualizer, apply_freq_shift


CFG = OfdmConfig(fft_len=256, cp_len=32, active_bins=192)


def _tx(rng, cfg, nframes):
    m = OfdmModem(cfg)
    bits = rng.integers(0, 2, nframes * m.bits_per_frame()).astype(np.uint8)
    return m, bits, np.asarray(m.modulate(bits))


def test_ofdm_loopback_bit_exact(rng):
    m, bits, x = _tx(rng, CFG, 8)
    assert x.shape == (8 * CFG.symbol_len,)
    out = np.asarray(m.demodulate(x))
    assert (out == bits).all()


@pytest.mark.parametrize("mod", ["bpsk", "qam16", "qam64"])
def test_ofdm_loopback_other_modulations(rng, mod):
    cfg = OfdmConfig(fft_len=128, cp_len=16, modulation=mod)
    m, bits, x = _tx(rng, cfg, 4)
    assert (np.asarray(m.demodulate(x)) == bits).all()


def test_ofdm_unit_power(rng):
    _, _, x = _tx(rng, CFG, 16)
    # Scale.SN keeps average sample power ~ active/fft_len * E|s|^2
    p = np.mean(np.abs(x) ** 2)
    assert abs(p - 192 / 256 * 2.0) < 0.1  # qpsk table has E|s|^2 = 2


def test_ofdm_multipath_within_cp_is_exactly_one_tap(rng):
    # channel shorter than the CP -> per-bin complex gain; pilot-estimated
    # equalizer recovers EXACT bits
    m, bits, x = _tx(rng, CFG, 9)
    h_chan = np.zeros(20, np.complex64)
    h_chan[0], h_chan[7], h_chan[19] = 1.0, 0.5j, -0.3
    rx = np.convolve(x, h_chan)[: x.size].astype(np.complex64)
    bpf = m.bits_per_frame()
    pilot_bits = bits[:bpf]
    spec = np.asarray(m.spectra(rx))
    pilot_tx = np.asarray(m.modulation.modulate(pilot_bits)).reshape(1, -1)
    h = OfdmEqualizer.estimate(spec[:1], pilot_tx)
    eq = np.asarray(OfdmEqualizer.apply(spec[1:], h))
    out = np.asarray(m.modulation.demod(eq)).reshape(-1)
    assert (out == bits[bpf:]).all()


def test_cp_sync_finds_offset_and_cfo(rng):
    m, bits, x = _tx(rng, CFG, 16)
    delay, f0 = 77, 3.1e-4
    rxed = np.concatenate([np.zeros(delay, np.complex64), x])
    rxed = rxed * np.exp(2j * np.pi * f0 * np.arange(rxed.size))
    rxed = (rxed + 0.01 * (rng.normal(size=rxed.size)
                           + 1j * rng.normal(size=rxed.size))).astype(np.complex64)
    off, cfo = cp_sync(rxed, CFG)
    assert int(off) % CFG.symbol_len == delay % CFG.symbol_len
    assert abs(float(cfo) - f0) < 2e-5
    # correct + demodulate from the found offset: exact bits
    fixed = np.asarray(apply_freq_shift(rxed, float(cfo)))
    start = int(off)
    usable = (rxed.size - start) // CFG.symbol_len * CFG.symbol_len
    out = np.asarray(m.demodulate(fixed[start : start + usable]))
    skip = (delay - start) // CFG.symbol_len  # frames before the signal
    # compare the frames that overlap the transmitted burst
    nf = min(16, usable // CFG.symbol_len)
    bpf = m.bits_per_frame()
    assert (out[: (nf - 1) * bpf] == bits[: (nf - 1) * bpf]).all()


def test_ofdm_rejects_bad_config():
    with pytest.raises(ValueError, match="even"):
        OfdmModem(OfdmConfig(fft_len=64, active_bins=33))
    with pytest.raises(ValueError, match="frames"):
        OfdmModem(OfdmConfig()).modulate(np.zeros(7, np.uint8))


def test_sc_preamble_structure():
    from aether_primitives_tpu.models.ofdm import sc_preamble

    pre = sc_preamble(CFG)
    assert pre.shape == (CFG.symbol_len,)
    useful = pre[CFG.cp_len:]
    half = CFG.fft_len // 2
    # two identical halves — the Schmidl-Cox signature
    np.testing.assert_allclose(useful[:half], useful[half:], rtol=0, atol=1e-6)
    # unit average power
    assert abs(np.mean(np.abs(useful) ** 2) - 1.0) < 0.05


def test_sc_sync_timing_and_cfo(rng):
    from aether_primitives_tpu.models.ofdm import sc_preamble, sc_sync

    m, bits, x = _tx(rng, CFG, 8)
    pre = sc_preamble(CFG)
    burst = np.concatenate([pre, x])
    delay, f0 = 133, 1.7e-3  # CFO beyond cp_sync's 1/(2N) range
    rxed = np.concatenate([np.zeros(delay, np.complex64), burst,
                           np.zeros(64, np.complex64)])
    rxed = rxed * np.exp(2j * np.pi * f0 * np.arange(rxed.size))
    rxed = (rxed + 0.02 * (rng.normal(size=rxed.size)
                           + 1j * rng.normal(size=rxed.size))).astype(np.complex64)
    off, cfo = sc_sync(rxed, CFG)
    true_useful_start = delay + CFG.cp_len
    assert abs(int(off) - true_useful_start) <= 2
    assert abs(float(cfo) - f0) < 3e-5
    # derotate, realign on the *estimated* offset backed off into the CP,
    # pilot-equalize (absorbs the residual timing phase ramp), demodulate
    from aether_primitives_tpu.models.sync import apply_freq_shift

    fixed = np.asarray(apply_freq_shift(rxed, float(cfo)))
    backoff = CFG.cp_len // 4
    # symbol boundary = off - cp; start a quarter-CP early so every FFT
    # window lands inside its own CP (early = circular shift, late = ISI)
    start = int(off) - CFG.cp_len - backoff
    seg = fixed[start : start + 9 * CFG.symbol_len]
    spec = np.asarray(m.spectra(seg))[1:]  # drop the preamble frame
    # the preamble occupies only even bins, so it can't seed a full-band
    # one-tap estimate — standard burst structure: SC preamble for
    # sync, first data frame as the full pilot (the common timing ramp
    # and residual CFO phase land in H and divide out)
    bpf = m.bits_per_frame()
    pilot_tx = np.asarray(m.modulation.modulate(bits[:bpf])).reshape(1, -1)
    h = OfdmEqualizer.estimate(spec[:1], pilot_tx)
    eq = np.asarray(OfdmEqualizer.apply(spec[1:], h))
    out = np.asarray(m.modulation.demod(eq)).reshape(-1)
    assert (out == bits[bpf:]).all()


def test_sc_sync_through_multipath(rng):
    from aether_primitives_tpu.models.ofdm import sc_preamble, sc_sync

    m, bits, x = _tx(rng, CFG, 4)
    pre = sc_preamble(CFG)
    burst = np.concatenate([pre, x])
    h_chan = np.zeros(12, np.complex64)
    h_chan[0], h_chan[5], h_chan[11] = 1.0, 0.4j, -0.2
    rxed = np.convolve(np.concatenate([np.zeros(50, np.complex64), burst]),
                       h_chan).astype(np.complex64)
    rxed += (0.02 * (rng.normal(size=rxed.size)
                     + 1j * rng.normal(size=rxed.size))).astype(np.complex64)
    off, cfo = sc_sync(rxed, CFG)
    # multipath shrinks the plateau from the left (by the channel length),
    # biasing the midpoint estimate late by at most ~L/2
    true_useful_start = 50 + CFG.cp_len
    assert abs(int(off) - true_useful_start) <= len(h_chan)
    assert abs(float(cfo)) < 5e-5

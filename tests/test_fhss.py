"""FHSS: hop/dehop roundtrip, spectral occupancy, and the partial-band
jammer survival story (with FEC + interleaving)."""

import numpy as np
import pytest

from aether_primitives_tpu.models.fhss import (
    FhssConfig,
    hop_despread,
    hop_sequence,
    hop_spread,
)
from aether_primitives_tpu.ops import fec as _fec
from aether_primitives_tpu.ops import modulation as mod


def test_hop_roundtrip_exact(rng):
    cfg = FhssConfig(n_channels=8, dwell=128)
    x = (rng.normal(size=8 * 128) + 1j * rng.normal(size=8 * 128)).astype(
        np.complex64
    )
    back = np.asarray(hop_despread(hop_spread(x, cfg), cfg))
    assert np.abs(back - x).max() < 1e-5


def test_hop_sequence_deterministic_and_in_range():
    cfg = FhssConfig(n_channels=10, cinit=0x123)
    s1 = hop_sequence(cfg, 200)
    s2 = hop_sequence(cfg, 200)
    assert (s1 == s2).all()
    assert s1.min() >= 0 and s1.max() < 10
    assert len(np.unique(s1)) > 5  # actually hops around


def test_hopped_energy_moves_across_band(rng):
    # per-dwell FFT: the occupied bin follows the hop sequence
    cfg = FhssConfig(n_channels=16, dwell=256)
    n_hops = 32
    x = np.ones(n_hops * cfg.dwell, np.complex64)  # DC baseband
    y = np.asarray(hop_spread(x, cfg)).reshape(n_hops, cfg.dwell)
    spec = np.abs(np.fft.fft(y, axis=-1))
    peak_bins = spec.argmax(axis=-1)
    # expected bin: f = (chan - 7.5)/16 cycles/sample -> bin f*dwell mod dwell
    seq = hop_sequence(cfg, n_hops)
    f = (seq - (16 - 1) / 2.0) / 16.0
    want = np.round(f * cfg.dwell) % cfg.dwell
    assert (np.abs(((peak_bins - want + cfg.dwell // 2) % cfg.dwell)
                   - cfg.dwell // 2) <= 1).all()
    assert len(np.unique(peak_bins)) > 8


def test_fhss_survives_partial_band_jammer(rng):
    # a REAL slow-FHSS link: RRC symbols at channel bandwidth, hopped;
    # matched filter after dehop; per-dwell noise estimates weight the
    # soft demod so jammed dwells lose confidence instead of poisoning
    # the Viterbi with confident-wrong LLRs. A jammer obliterating 1/4
    # of the band leaves the hopper error-free (25% of dwells erased,
    # interleaver + rate-1/2 code recover); a link parked inside the
    # jam band dies.
    from aether_primitives_tpu.ops import fir as fir_mod

    nch = sps = 16
    sym_per_dwell = 8
    cfg = FhssConfig(n_channels=nch, dwell=sps * sym_per_dwell)
    bits = rng.integers(0, 2, 2000).astype(np.uint8)
    coded = np.asarray(_fec.conv_encode(bits))
    pad = (-len(coded)) % 32
    codedp = np.concatenate([coded, np.zeros(pad, np.uint8)])
    inter = np.asarray(_fec.interleave(codedp, 32))
    q = mod.qpsk()
    syms = np.asarray(q.modulate(inter))
    n_sym = len(syms)
    spad = (-n_sym) % sym_per_dwell + sym_per_dwell  # + one guard dwell
    syms_p = np.concatenate([syms, np.zeros(spad, np.complex64)])
    up = np.zeros(len(syms_p) * sps, np.complex64)
    up[::sps] = syms_p
    taps = fir_mod.rrc_taps(sps, span=4, beta=0.35)
    shaped = np.asarray(fir_mod.fir_filter(up, taps))
    tx = np.asarray(hop_spread(shaped, cfg))
    n = len(tx)

    jam_spec = np.zeros(n, np.complex128)
    jam_spec[: n // 4] = rng.normal(size=n // 4) + 1j * rng.normal(size=n // 4)
    jam = np.fft.ifft(jam_spec) * np.sqrt(n) * 2.0
    jam = jam * np.exp(-2j * np.pi * 0.375 * np.arange(n))  # [-0.5, -0.25)
    rx = (tx + jam).astype(np.complex64)

    def receive(sig):
        mf = np.asarray(fir_mod.fir_filter(sig, taps))
        d = 2 * 4 * sps  # TWO RRC group delays (span*sps each)
        pts = mf[d::sps][:n_sym]
        nd = (n_sym // sym_per_dwell) * sym_per_dwell
        pd = np.abs(pts[:nd].reshape(-1, sym_per_dwell)) ** 2
        nv_dwell = np.maximum(pd.mean(axis=1) - 2.0, 0.05)
        nv = np.repeat(nv_dwell, sym_per_dwell)
        nv = np.concatenate([nv, np.full(n_sym - nd, nv_dwell[-1])])
        llr = np.asarray(q.demod_soft(pts.astype(np.complex64), 1.0))
        llr = llr.reshape(n_sym, 2) / nv[:, None]
        deint = np.asarray(_fec.deinterleave(llr.reshape(-1)[: len(inter)], 32))
        return np.asarray(_fec.viterbi_decode(deint[: len(coded)]))[: len(bits)]

    ber_hop = (receive(np.asarray(hop_despread(rx, cfg))) != bits).mean()
    # unlucky fixed link parked on channel 3 (inside the jam band)
    f3 = (3 - (nch - 1) / 2.0) / nch
    t = np.arange(len(shaped))
    flat = (shaped * np.exp(2j * np.pi * f3 * t) + jam[: len(shaped)])
    flat_bb = (flat * np.exp(-2j * np.pi * f3 * t)).astype(np.complex64)
    ber_flat = (receive(flat_bb) != bits).mean()
    assert ber_hop == 0.0, ber_hop
    assert ber_flat > 0.05, ber_flat


def test_dwell_divisibility_enforced():
    cfg = FhssConfig(dwell=128)
    with pytest.raises(ValueError, match="dwell"):
        hop_spread(np.zeros(100, np.complex64), cfg)

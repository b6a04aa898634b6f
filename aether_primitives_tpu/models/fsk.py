"""Continuous-phase FSK: CPFSK / MSK / GMSK modem.

The constant-envelope family (every power-amplifier-friendly link: GSM,
Bluetooth, AIS, satellite TT&C) — the last classic waveform class next to
the framework's PSK/QAM/OFDM/DSSS stack. Built on the analog layer:
modulation is NRZ bits -> pulse shaping -> :func:`..ops.analog.fm_mod`
(block-modular phase accumulator), demodulation is the quadrature
discriminator -> per-symbol integrate-and-dump -> sign, all batched
feedforward math (one FIR + reshapes; no PLL).

``h = 0.5`` (MSK) shifts the phase exactly +-pi/2 per symbol; a Gaussian
pre-filter (``bt`` = bandwidth-time product, e.g. GSM's 0.3) trades
controlled ISI for a much tighter spectrum (GMSK) — the discriminator +
integrate-and-dump detector tolerates it cleanly at BT >= 0.3.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import cf32
from ..ops import analog as _analog
from ..ops import fir as _fir


def gaussian_pulse(bt: float, sps: int, span: int = 3) -> np.ndarray:
    """GMSK Gaussian frequency pulse (f64 design, unit area): the rect NRZ
    pulse convolved with a Gaussian of bandwidth-time product ``bt``,
    sampled at ``sps`` samples/symbol over ``±span`` symbols."""
    from math import erfc

    def q(x):
        return 0.5 * erfc(x / np.sqrt(2.0))

    t = np.arange(-span * sps, span * sps + 1, dtype=np.float64) / sps
    a = 2.0 * np.pi * bt / np.sqrt(np.log(2.0))
    g = 0.5 * (q(a * 0) * 0 + 1) * np.zeros_like(t)
    g = 0.5 * (np.vectorize(q)(a * (t - 0.5)) - np.vectorize(q)(a * (t + 0.5)))
    g /= g.sum() / sps  # unit area in symbol-time units
    return g.astype(np.float32)


@dataclass(frozen=True)
class FskConfig:
    """CPFSK parameters: ``sps`` samples/symbol, modulation index ``h``
    (phase advance per symbol = ``h * pi``; 0.5 = MSK), optional Gaussian
    ``bt`` (None = rectangular NRZ pulse = plain CPFSK/MSK)."""

    sps: int = 8
    h: float = 0.5
    bt: Optional[float] = None
    pulse_span: int = 3


class FskModem:
    """Constant-envelope CPFSK/MSK/GMSK modulator + discriminator detector.

    ``modulate(bits)``: ``[n]`` bits -> ``[n * sps]`` unit-modulus complex
    baseband (plus the pulse tail). ``demodulate(x)``: discriminator ->
    integrate-and-dump over each symbol -> sign. The detector is
    noncoherent (no carrier phase needed) and amplitude-insensitive.
    """

    def __init__(self, config: FskConfig = FskConfig()):
        self.config = config
        sps = int(config.sps)
        if config.bt is not None:
            self.pulse = gaussian_pulse(config.bt, sps, config.pulse_span)
        else:
            self.pulse = np.full(sps, 1.0, np.float32)  # rect NRZ
        # peak frequency deviation: +-h/(2*sps) cycles/sample for NRZ +-1
        self.deviation = float(config.h) / (2.0 * sps)

    def modulate(self, bits) -> jnp.ndarray:
        cfg = self.config
        sps = int(cfg.sps)
        b = jnp.asarray(bits).astype(jnp.float32)
        nrz = 2.0 * b - 1.0
        # impulse train at the symbol rate -> frequency pulse shaping;
        # zero-stuff via the dense [n, sps] broadcast (col 0 = impulse)
        imp = jnp.concatenate(
            [nrz[..., :, None],
             jnp.zeros(nrz.shape + (sps - 1,), jnp.float32)],
            axis=-1,
        ).reshape(nrz.shape[:-1] + (nrz.shape[-1] * sps,))
        # flush the pulse tail so the final symbols' lobes are emitted
        # (output length n*sps + len(pulse) - sps; zero for the rect pulse)
        tail = self.pulse.shape[-1] - sps
        if tail > 0:
            imp = jnp.pad(imp, [(0, 0)] * (imp.ndim - 1) + [(0, tail)])
        # unit-area pulses (sum = sps) convolved with +-1 impulses give a
        # frequency signal whose per-symbol integral is +-sps, so the
        # deviation h/(2*sps) accumulates exactly +-h*pi phase per symbol
        freq = jnp.real(_fir.fir_filter(imp.astype(jnp.complex64), self.pulse))
        return _analog.fm_mod(freq, self.deviation)

    def demodulate(self, x) -> jnp.ndarray:
        cfg = self.config
        sps = int(cfg.sps)
        inst = _analog.fm_demod(jnp.asarray(x, dtype=cf32), self.deviation)
        # integrate-and-dump per symbol, windows centered on the pulse:
        # the causal pulse delays symbol k's lobe by (len(pulse)-sps)/2
        # samples relative to the rect alignment (zero for rect itself)
        d = (self.pulse.shape[-1] - sps) // 2
        n_sym = (inst.shape[-1] - 2 * d) // sps
        if d:
            inst = inst[..., d:]
        acc = jnp.sum(
            inst[..., : n_sym * sps].reshape(inst.shape[:-1] + (n_sym, sps)),
            axis=-1,
        )
        return (acc > 0).astype(jnp.uint8)

    __call__ = modulate


# ----------------------------------------------------------------- OQPSK


def oqpsk_modulate(bits, sps: int = 4, taps=None):
    """Offset QPSK (802.15.4-style): the Q rail is staggered by half a
    symbol so the envelope never crosses zero (max 90-degree phase steps
    — PA-friendly like MSK, which IS OQPSK with half-sine pulses; this
    uses an RRC by default). ``bits``: flat {0,1}, even count; ``sps``
    must be even. Returns the shaped complex baseband at ``sps``
    samples/symbol (length ``(n_bits/2)*sps + sps/2 + len(taps)`` — the
    stagger plus the filter tail so every pulse fully emerges).
    """
    b = jnp.asarray(bits).astype(jnp.int32) % 2
    if b.shape[-1] % 2:
        raise ValueError("OQPSK consumes bit PAIRS")
    sps = int(sps)
    if sps % 2:
        raise ValueError("sps must be even (half-symbol stagger)")
    if taps is None:
        taps = _fir.rrc_taps(sps, span=6, beta=0.5)
    i_sym = (1.0 - 2.0 * b[0::2]).astype(jnp.float32)
    q_sym = (1.0 - 2.0 * b[1::2]).astype(jnp.float32)
    n_sym = i_sym.shape[-1]
    base_i = jnp.zeros(n_sym * sps, jnp.float32).at[::sps].set(i_sym)
    base_q = jnp.zeros(n_sym * sps, jnp.float32).at[::sps].set(q_sym)
    half = sps // 2
    tail = int(np.asarray(taps).shape[-1])  # let every pulse fully emerge
    up_i = jnp.concatenate([base_i, jnp.zeros(half + tail, jnp.float32)])
    up_q = jnp.concatenate(
        [jnp.zeros(half, jnp.float32), base_q, jnp.zeros(tail, jnp.float32)]
    )
    x = jax.lax.complex(up_i, up_q)
    return _fir.fir_filter(x, taps).astype(cf32)


def oqpsk_demodulate(x, n_bits: int, sps: int = 4, taps=None):
    """Matched-filter OQPSK demod (synchronized): filter, strobe the I
    rail at ``k*sps`` and the Q rail at ``k*sps + sps/2`` (both offset by
    the two filters' group delay), sign-detect. Inverse of
    :func:`oqpsk_modulate` (bit-exact roundtrip + noise tested)."""
    xc = jnp.asarray(x, dtype=cf32)
    sps = int(sps)
    if taps is None:
        taps = _fir.rrc_taps(sps, span=6, beta=0.5)
    taps = np.asarray(taps)
    gd_pad = taps.shape[-1]  # let the tail symbols' matched peaks emerge
    xc = jnp.concatenate([xc, jnp.zeros(gd_pad, cf32)])
    mf = _fir.fir_filter(xc, taps)
    gd = taps.shape[-1] - 1  # two cascaded filters' total group delay
    n_sym = int(n_bits) // 2
    i_pts = jnp.real(mf)[gd :: sps][:n_sym]
    q_pts = jnp.imag(mf)[gd + sps // 2 :: sps][:n_sym]
    bi = (i_pts < 0).astype(jnp.uint8)
    bq = (q_pts < 0).astype(jnp.uint8)
    from ..ops.modulation import _interleave_bits

    return _interleave_bits([bi, bq])

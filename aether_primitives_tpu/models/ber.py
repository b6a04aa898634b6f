"""Bit-error-rate simulation — statistical validation of the whole
modulate → AWGN → demodulate stack against closed-form theory.

For the generic Gray constellations with per-component noise std
``sigma = sqrt(power)``:

- QPSK (symbols ±1±1j): each bit is an independent sign decision on one
  component, so ``BER = Q(1/sigma)``;
- BPSK here uses the diagonal pair ±(1+1j): the decision statistic
  ``re+im`` has mean ±2 and std ``sigma*sqrt(2)``, so
  ``BER = Q(sqrt(2)/sigma)``.

``simulate_ber`` runs millions of bits per point as one fused jitted
computation per SNR; the test suite checks the simulated curve against
theory at a few points.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import modulation as _mod
from ..ops import noise as _noise


def q_function(x: float) -> float:
    """Gaussian tail probability Q(x)."""
    return 0.5 * math.erfc(x / math.sqrt(2.0))


def _gray_pam_ber(m_axis: int, d_over_sigma: float) -> float:
    """Exact Gray-coded M-PAM bit error rate (Cho & Yoon 2002, eq. 16):
    ``d_over_sigma`` is the half-distance between adjacent levels over the
    per-component noise std. Averaged over the axis's ``log2(M)`` bits."""
    kbits = int(math.log2(m_axis))
    total = 0.0
    for k in range(1, kbits + 1):
        pk = 0.0
        top = int((1 - 2.0**-k) * m_axis)
        for i in range(top):
            f = math.floor(i * 2.0 ** (k - 1) / m_axis)
            weight = (-1.0) ** f * (
                2.0 ** (k - 1) - math.floor(i * 2.0 ** (k - 1) / m_axis + 0.5)
            )
            pk += weight * q_function((2 * i + 1) * d_over_sigma)
        total += (2.0 / m_axis) * pk
    return total / kbits


def theoretical_ber(modulation: str, power: float) -> float:
    """Closed-form BER of the generic constellations at noise ``power``
    (per-component variance). ``qamN`` uses the exact Gray-coded PAM-per-
    axis expression (Cho & Yoon) for any square order — ``qam16`` matches
    the hand-derived 16-QAM form exactly (tested)."""
    sigma = math.sqrt(power)
    if modulation == "qpsk":
        return q_function(1.0 / sigma)
    if modulation == "bpsk":
        return q_function(math.sqrt(2.0) / sigma)
    if modulation.startswith("qam") and modulation[3:].isdigit():
        order = int(modulation[3:])
        bits = int(math.log2(order))
        if 2**bits != order or bits % 2:
            raise ValueError(f"{modulation!r} is not a square QAM")
        m_axis = 2 ** (bits // 2)
        # unit-average-energy grid: half min-distance 1/sqrt(2(Ma^2-1)/3)
        d = 1.0 / math.sqrt(2.0 * (m_axis**2 - 1) / 3.0)
        return _gray_pam_ber(m_axis, d / sigma)
    raise ValueError(f"no closed form for {modulation!r}")


def simulate_ber(
    modulation: str = "qpsk",
    powers=(0.25, 0.5, 1.0),
    n_bits: int = 1 << 20,
    seed: int = 815,
):
    """[(power, simulated_ber, theoretical_ber)] over the given noise powers."""
    from .modem import _modulation_by_name

    m = _modulation_by_name(modulation)
    n_bits -= n_bits % m.bits_per_symbol  # whole symbols only
    key = jax.random.key(seed)

    @jax.jit
    def one_point(k, power):
        kb, kn = jax.random.split(k)
        bits = jax.random.bernoulli(kb, 0.5, (n_bits,)).astype(jnp.uint8)
        syms = m.modulate(bits)
        noisy = _noise.apply(kn, syms, power)
        out = m.demod(noisy)
        return jnp.mean((out != bits).astype(jnp.float32))

    rows = []
    for i, p in enumerate(powers):
        k = jax.random.fold_in(key, i)
        ber = float(np.asarray(one_point(k, jnp.float32(p))))
        rows.append((float(p), ber, theoretical_ber(modulation, float(p))))
    return rows

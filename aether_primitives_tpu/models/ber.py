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


def theoretical_ber(modulation: str, power: float) -> float:
    """Closed-form BER of the generic constellations at noise ``power``
    (per-component variance)."""
    sigma = math.sqrt(power)
    if modulation == "qpsk":
        return q_function(1.0 / sigma)
    if modulation == "bpsk":
        return q_function(math.sqrt(2.0) / sigma)
    if modulation == "qam16":
        # exact Gray-coded 4-PAM per axis: levels +-d, +-3d with
        # d = 1/sqrt(10) (unit average symbol energy), averaged over both
        # bits of the axis
        d = 1.0 / math.sqrt(10.0)
        q1, q3, q5 = (q_function(k * d / sigma) for k in (1, 3, 5))
        return 0.75 * q1 + 0.5 * q3 - 0.25 * q5
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

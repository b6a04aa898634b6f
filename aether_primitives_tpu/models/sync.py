"""Synchronization and channel equalization for the modem chains.

Completes the receive story beyond the reference's scope: the reference's
modem loopback assumes perfect alignment and an ideal channel
(reference examples/modem.rs); a deployed receiver must first *find* the
signal and undo the channel. Both steps reuse the framework's primitives:

- :func:`detect_preamble` — timing acquisition via the overlap-save matched
  filter (peak of ``|matched_filter(x, preamble)|``); returns the sample
  offset where the preamble starts. One fused jitted computation (the
  argmax runs on device — no host scan).
- :class:`OfdmEqualizer` — one-tap per-subcarrier least-squares channel
  estimate from a known pilot frame (``H = Y_pilot / X_pilot``), applied as
  a per-bin divide before demod. Exact for any channel shorter than the
  frame's effective guard (here: the TX/RX pulse-shaping cascade).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fir as _fir
from ..types import cf32


def detect_preamble(x, preamble, fft_backend: Optional[str] = None):
    """(offset, peak_metric) of the best preamble alignment in ``x``.

    ``offset`` is where the preamble's first sample sits;
    ``peak_metric`` is ``|correlation|^2 / energy(preamble)^2`` — 1.0 for a
    clean hit, near 0 for noise-only input (threshold it for detection).
    """
    x = jnp.asarray(x, dtype=cf32)
    pre = np.asarray(preamble, dtype=np.complex64)
    y = _fir.matched_filter(x, pre, fft_backend=fft_backend)
    mag2 = jnp.real(y) ** 2 + jnp.imag(y) ** 2
    peak_pos = jnp.argmax(mag2, axis=-1)
    energy = float(np.sum(np.abs(pre) ** 2))
    peak_val = jnp.take_along_axis(mag2, peak_pos[..., None], axis=-1)[..., 0]
    # matched filter peaks at offset + len(pre) - 1 (causal convention)
    offset = peak_pos - (pre.shape[-1] - 1)
    return offset, peak_val / jnp.float32(energy**2)


class OfdmEqualizer:
    """One-tap per-subcarrier equalizer from a known pilot frame.

    ``estimate(rx_pilot_spec, tx_pilot_spec)`` -> per-bin channel ``H``;
    ``apply(spec, H)`` divides it out. Bins where the pilot is zero (guard
    bands) get ``H = 1`` so the divide is a no-op there.
    """

    @staticmethod
    def estimate(rx_pilot_spec, tx_pilot_spec) -> jnp.ndarray:
        rx = jnp.asarray(rx_pilot_spec, dtype=cf32)
        tx = jnp.asarray(tx_pilot_spec, dtype=cf32)
        occupied = jnp.abs(tx) > 0
        h = jnp.where(occupied, rx / jnp.where(occupied, tx, 1.0), 1.0)
        return h.astype(cf32)

    @staticmethod
    def apply(spec, h) -> jnp.ndarray:
        return (jnp.asarray(spec, dtype=cf32) / jnp.asarray(h, dtype=cf32)).astype(
            cf32
        )

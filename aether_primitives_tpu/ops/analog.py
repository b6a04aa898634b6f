"""Analog modes: FM and AM modulation/demodulation.

The analog half of the SDR toolbox (the reference covers only digital
PSK — src/modulation.rs): broadcast FM/AM capture and playback are the
classic first workloads of any receiver framework. Everything here is
elementwise/shift math on complex baseband blocks — pure VPU work that
fuses into adjacent stages (a Ddc front end feeds these directly).

Conventions: frequencies normalized to cycles/sample; modulation index /
deviation expressed in the same unit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..types import cf32


def fm_mod(msg, deviation: float, phase0: float = 0.0) -> jnp.ndarray:
    """Frequency-modulate a real message onto complex baseband:
    ``y[n] = exp(j*(phase0 + 2*pi*deviation*cumsum(msg)[n]))``.

    ``msg`` should be scaled to [-1, 1]; ``deviation`` is the peak
    frequency swing in cycles/sample. The phase accumulator is a
    **block-modular** cumulative sum: a plain f32 cumsum reaches ~2e5
    cycles after 1M samples and has lost the fractional phase entirely, so
    the sum runs within 1024-sample blocks (bounded magnitude), block
    totals are reduced mod 1 cycle before the across-block cumsum, and the
    two add back mod 1 — phase error stays at f32 rounding for
    multi-million-sample blocks (tested at 1M).
    """
    m = jnp.asarray(msg, dtype=jnp.float32)
    inc = jnp.float32(deviation) * m
    n = inc.shape[-1]
    blk = 1024
    if n <= blk:
        cycles = jnp.cumsum(inc, axis=-1)
    else:
        npad = -(-n // blk) * blk
        if npad != n:
            inc = jnp.pad(inc, [(0, 0)] * (inc.ndim - 1) + [(0, npad - n)])
        b = inc.reshape(inc.shape[:-1] + (npad // blk, blk))
        local = jnp.cumsum(b, axis=-1)  # bounded: <= blk * max|inc|
        totals = jnp.mod(local[..., -1], 1.0)  # mod before accumulating
        offs = jnp.cumsum(totals, axis=-1) - totals  # exclusive prefix
        cycles = (local + jnp.mod(offs, 1.0)[..., None]).reshape(
            inc.shape[:-1] + (npad,)
        )[..., :n]
    cycles = cycles + jnp.float32(phase0 / (2.0 * np.pi))
    ang = 2.0 * np.float32(np.pi) * jnp.mod(cycles, 1.0)
    return jax.lax.complex(jnp.cos(ang), jnp.sin(ang)).astype(cf32)


def fm_demod(x, deviation: float = 1.0) -> jnp.ndarray:
    """Quadrature FM discriminator:
    ``m[n] = angle(x[n] * conj(x[n-1])) / (2*pi*deviation)``.

    The polar-discriminator form — exact instantaneous-frequency recovery
    for any deviation below Nyquist, amplitude-insensitive (no limiter
    needed). ``m[0]`` uses the zero-phase origin (first sample's phase
    step from 1+0j). Output is f32, same shape as ``x``; with ``deviation``
    matching :func:`fm_mod` the round-trip recovers the message exactly
    (up to f32 trig rounding, tested at −100 dB).
    """
    x = jnp.asarray(x, dtype=cf32)
    prev = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(1, 0)],
                   constant_values=1.0 + 0.0j)[..., :-1]
    d = x * jnp.conj(prev)
    return (jnp.arctan2(jnp.imag(d), jnp.real(d))
            / (2.0 * np.float32(np.pi) * jnp.float32(deviation))).astype(jnp.float32)


def am_mod(msg, depth: float = 0.5, carrier_freq: float = 0.0) -> jnp.ndarray:
    """Amplitude-modulate a real message (scaled to [-1, 1]):
    ``y = (1 + depth*msg) * e^{j 2 pi f n}`` — a complex-baseband AM
    signal (DSB with carrier). ``carrier_freq = 0`` leaves it at DC."""
    m = jnp.asarray(msg, dtype=jnp.float32)
    env = (1.0 + jnp.float32(depth) * m).astype(jnp.float32)
    if carrier_freq == 0.0:
        return jax.lax.complex(env, jnp.zeros_like(env)).astype(cf32)
    from . import frontend as _fe

    base = jax.lax.complex(env, jnp.zeros_like(env)).astype(cf32)
    return _fe.nco_mix(base, carrier_freq)


def am_demod(x, depth: float = 0.5) -> jnp.ndarray:
    """Envelope AM detector: ``m = (|x| - mean|x|) / (depth * mean|x|)`` —
    the DC term estimates the unmodulated carrier level (exact for a
    zero-mean message), so the output is scale-free. Frequency-offset
    tolerant (envelope ignores carrier rotation)."""
    x = jnp.asarray(x, dtype=cf32)
    env = jnp.sqrt(jnp.real(x) ** 2 + jnp.imag(x) ** 2)
    c = jnp.mean(env, axis=-1, keepdims=True)
    return ((env - c) / (jnp.float32(depth) * c)).astype(jnp.float32)


def analytic_signal(x, fft_backend=None) -> jnp.ndarray:
    """Analytic signal of a real block: zero the negative half of the
    spectrum, double the positive half (keep DC and Nyquist as-is), one
    forward/backward batched FFT pair — the exact block-wise Hilbert
    method (the streaming FIR alternative is
    :func:`~.firdes.hilbert_taps`). ``imag(out)`` is the Hilbert
    transform of ``x``; ``|out|`` the envelope; ``angle(out)`` the
    instantaneous phase. Exact for block-periodic content (tones on the
    FFT grid); otherwise the circular convolution leaks at the block
    edges — window or overlap blocks for streaming use."""
    from . import fft as _fft

    xr = jnp.asarray(x, jnp.float32)
    n = xr.shape[-1]
    plan = _fft.plan(n, fft_backend)
    spec = plan.fwd(jax.lax.complex(xr, jnp.zeros_like(xr)).astype(cf32),
                    _fft.Scale.NONE)
    gain = np.zeros(n, np.float32)
    gain[0] = 1.0
    if n % 2 == 0:
        gain[n // 2] = 1.0
        gain[1 : n // 2] = 2.0
    else:
        gain[1 : (n + 1) // 2] = 2.0
    return plan.bwd(spec * jnp.asarray(gain), _fft.Scale.N).astype(cf32)


def ssb_modulate(msg, carrier_freq: float, sideband: str = "upper",
                 fft_backend=None) -> jnp.ndarray:
    """Single-sideband modulation (phasing method, exact block form):
    the analytic signal of the message contains only positive
    frequencies, so mixing it to ``carrier_freq`` lands the energy
    entirely in the upper sideband (conjugate first for LSB). Returns
    complex baseband centered per convention at DC + carrier_freq."""
    from . import frontend as _fe

    a = analytic_signal(msg, fft_backend)
    if sideband == "lower":
        a = jnp.conj(a)
    elif sideband != "upper":
        raise ValueError("sideband must be 'upper' or 'lower'")
    if carrier_freq == 0.0:
        return a.astype(cf32)
    return _fe.nco_mix(a, float(carrier_freq)).astype(cf32)


def ssb_demodulate(x, carrier_freq: float, sideband: str = "upper",
                   fft_backend=None) -> jnp.ndarray:
    """SSB product detector: mix the sideband back to DC and take the
    real part. Exact inverse of :func:`ssb_modulate` for a real
    message (up to f32 rounding)."""
    from . import frontend as _fe

    x = jnp.asarray(x, dtype=cf32)
    if carrier_freq != 0.0:
        x = _fe.nco_mix(x, -float(carrier_freq))
    if sideband == "lower":
        x = jnp.conj(x)
    return jnp.real(x).astype(jnp.float32)

"""Detection / spectrum sensing: energy detectors with calibrated
false-alarm rates and cell-averaging CFAR.

The acquisition layers elsewhere assume a known signature
(:func:`~.sync.detect_preamble`, :mod:`~.caf`); this module covers the
blind side — "is anything there at all, and where" — the first stage of
any scanner or monitor built on the channelizer:

- :func:`energy_detect` — block energy vs a threshold calibrated to a
  requested false-alarm probability from the exact chi-square statistics
  of complex AWGN (threshold factor computed host-side once via the
  inverse regularized gamma function; the detector itself is one
  reshape + mean + compare, batched);
- :func:`ca_cfar` — 1-D cell-averaging CFAR over any magnitude series
  (spectrum bins, CAF rows, matched-filter output): the noise level is
  re-estimated per cell from a sliding window of training cells around a
  guard interval, so the false-alarm rate stays constant across a
  varying noise floor. Window sums are cumsum differences — no strided
  ops, no convolution;
- :func:`burst_mask` / :func:`mask_to_segments` — time-domain burst
  presence mask (device) and its host-side conversion to (start, stop)
  segments for downstream framing.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import cf32


def energy_threshold_factor(n: int, pfa: float) -> float:
    """Threshold factor ``t`` such that ``P(mean|w|^2 > t * sigma^2) =
    pfa`` for ``n`` complex AWGN samples: the per-block energy
    ``sum |w|^2 / sigma^2`` is chi-square with ``2n`` degrees of freedom
    (Gamma(n, 1)), so ``t = gammaincinv(n, 1 - pfa) / n``. Host-side,
    exact."""
    from scipy.special import gammaincinv

    return float(gammaincinv(n, 1.0 - pfa) / n)


def energy_detect(
    x, block_len: int, noise_power: float, pfa: float = 1e-3
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blockwise energy detector with an exact CFAR threshold.

    Splits ``x`` into ``block_len`` blocks and flags those whose mean
    power exceeds ``noise_power * energy_threshold_factor(block_len,
    pfa)``. Returns ``(detected [..., n_blocks] bool, mean_power
    [..., n_blocks])``. Length must divide by ``block_len``.
    """
    x = jnp.asarray(x, dtype=cf32)
    n = x.shape[-1]
    if n % block_len:
        raise ValueError(f"length {n} not divisible by block_len {block_len}")
    p = jnp.real(x) ** 2 + jnp.imag(x) ** 2
    blocks = p.reshape(p.shape[:-1] + (-1, block_len))
    mean_p = jnp.mean(blocks, axis=-1)
    thresh = noise_power * energy_threshold_factor(block_len, pfa)
    return mean_p > thresh, mean_p


def ca_cfar(
    power,
    train: int = 16,
    guard: int = 2,
    pfa: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cell-averaging CFAR over the last axis of a power series.

    For each cell, the local noise level is the mean of ``2*train``
    training cells flanking a ``2*guard+1`` guard interval; the cell
    fires when it exceeds ``alpha * noise`` with the textbook CA-CFAR
    scaling ``alpha = N (pfa^{-1/N} - 1)``, ``N = 2*train`` (exact for
    exponentially distributed cells — e.g. magnitude-squared FFT bins of
    Gaussian noise). Edges fall back to the one-sided window (alpha
    adjusted per cell for the actual training count). Sliding sums are
    cumulative-sum differences: one cumsum + two static slices, batched.

    Returns ``(detected bool, local_noise)``, both shaped like ``power``.
    """
    p = jnp.asarray(power, jnp.float32)
    n = p.shape[-1]
    w = int(train)
    g = int(guard)
    span = w + g
    # padded cumsum for window sums: sum p[i:j] = cs[j] - cs[i]
    cs = jnp.cumsum(
        jnp.concatenate([jnp.zeros(p.shape[:-1] + (1,), jnp.float32), p], axis=-1),
        axis=-1,
    )
    idx = jnp.arange(n)
    lo_a = jnp.clip(idx - span, 0, n)  # left training window [lo_a, lo_b)
    lo_b = jnp.clip(idx - g, 0, n)
    hi_a = jnp.clip(idx + g + 1, 0, n)  # right training window [hi_a, hi_b)
    hi_b = jnp.clip(idx + span + 1, 0, n)
    left = jnp.take(cs, lo_b, axis=-1) - jnp.take(cs, lo_a, axis=-1)
    right = jnp.take(cs, hi_b, axis=-1) - jnp.take(cs, hi_a, axis=-1)
    count = (lo_b - lo_a + hi_b - hi_a).astype(jnp.float32)
    noise = (left + right) / jnp.maximum(count, 1.0)
    # per-cell alpha for the actual training count (edges are one-sided)
    alpha = count * (pfa ** (-1.0 / jnp.maximum(count, 1.0)) - 1.0)
    return p > alpha * noise, noise


def burst_mask(
    x, block_len: int, noise_power: float, pfa: float = 1e-3
) -> jnp.ndarray:
    """Sample-resolution burst presence mask: the blockwise energy
    verdict of :func:`energy_detect` expanded back to per-sample bool
    (static shapes; feed :func:`mask_to_segments` for edges)."""
    det, _ = energy_detect(x, block_len, noise_power, pfa)
    return jnp.repeat(det, block_len, axis=-1)


def mask_to_segments(mask) -> np.ndarray:
    """Host-side: convert a boolean presence mask to an ``[k, 2]`` array
    of (start, stop) sample indices (stop exclusive). Output size is
    data-dependent — this runs on host by design."""
    m = np.asarray(mask).astype(np.int8)
    d = np.diff(np.concatenate([[0], m, [0]]))
    starts = np.where(d == 1)[0]
    stops = np.where(d == -1)[0]
    return np.stack([starts, stops], axis=1)


def cyclostationary_detect(
    x, baud_min: float = 0.02, osr: int = 4
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cyclostationary feature detection: find a pulse-shaped digital
    signal BELOW the noise floor, where :func:`energy_detect` is blind.

    The squared envelope of a linearly modulated signal carries a
    spectral LINE at the symbol rate (the Oerder-Meyr cyclostationarity
    that :func:`~.sync.estimate_baud_rate` exploits); stationary noise
    has none — its envelope periodogram is flat. The detection statistic
    is the peak line power over the searched rate range divided by the
    periodogram's median off-peak level: coherent integration gives the
    line ~N processing gain, so detection works down to roughly −5 dB
    in-band SNR at 10^5 samples (tested) with the threshold independent
    of the absolute noise level (self-normalizing).

    Returns ``(statistic, rate)`` — the line-to-floor ratio (compare to
    a threshold ~10-20 for detection; pure noise measures ~8 +- 1 across
    seeds at these sizes) and the candidate baud estimate
    (cycles/sample). Batched over leading axes.
    """
    x = jnp.asarray(x, dtype=cf32)
    env = jnp.real(x) ** 2 + jnp.imag(x) ** 2
    env = env - jnp.mean(env, axis=-1, keepdims=True)
    n = env.shape[-1]
    nfft = int(osr) * int(2 ** np.ceil(np.log2(max(n, 2))))
    ez = jnp.concatenate(
        [env.astype(cf32), jnp.zeros(env.shape[:-1] + (nfft - n,), cf32)],
        axis=-1,
    )
    from ..ops.fft import Scale, plan as fft_plan

    mag = jnp.abs(fft_plan(nfft).fwd(ez, Scale.NONE))
    k_lo = int(np.ceil(float(baud_min) * nfft))
    k_hi = nfft // 2 + 1
    band = mag[..., k_lo:k_hi]
    peak = jnp.max(band, axis=-1)
    floor = jnp.median(band, axis=-1)
    k = jnp.argmax(band, axis=-1) + k_lo
    stat = peak / jnp.maximum(floor, 1e-30)
    return stat.astype(jnp.float32), (k / nfft).astype(jnp.float32)

"""Blind automatic modulation classification (AMC) by higher-order moments.

The in-service monitoring companion of the blind SNR estimator
(:func:`~aether_primitives_tpu.ops.frontend.estimate_snr_m2m4`): given
baseband symbols of an UNKNOWN linear modulation (after timing recovery,
before any carrier-phase fix), identify it from moment features — pure
reductions, one fused jitted pass, batched over bursts:

- ``|C20| = |E[x^2]|`` — 1 for (rotated) BPSK, 0 for any M>=4 PSK/QAM
  (rotation-invariant through the modulus);
- ``|C40| = |E[x^4] - 3 E[x^2]^2|`` — 2 / 1 / 0 / 0.68 / 0.619 for
  BPSK / QPSK / 8PSK / 16QAM / 64QAM at unit power;
- ``m4 = E[|x|^4]`` and ``m6 = E[|x|^6]`` — the envelope moments.

The key structural fact (found the hard way — see the tests): under an
UNKNOWN noise level, fourth-order envelope statistics CANNOT separate
QPSK from 16QAM at all. With signal fraction ``rho``, the measured
``C42`` is ``(kappa_c - 2) rho^2`` — one equation, one unknown — so
every candidate explains it perfectly with its own ``rho``, and for
PSK/QAM ``|C40| = -C42`` makes the fourth-order ratio degenerate too.
The discriminator is the SIXTH moment: each candidate solves its
``rho`` from ``m4`` (``m4 = kappa_c S^2 + 4SN + 2N^2``, ``S + N = 1``),
then must ALSO predict the measured ``m6`` through the exact
signal+noise expansion

    m6 = kappa6_c S^3 + 9 kappa_c S^2 N + 18 S N^2 + 6 N^3

(circular-Gaussian noise moments) — only the true class is consistent
with both. Signatures are computed EXACTLY from this framework's own
constellation tables at import.

Accuracy domain: blind moment features need SNR >= ~8 dB and a few
thousand symbols; 16QAM vs 64QAM kappa/kappa6 differ by ~5%/13%, so
that pair needs ~10k symbols at >= 15 dB (tested). A residual CFO
decorrelates x^2/x^4 and erases C20/C40 — run AMC after coarse CFO
removal (e.g. :func:`~.sync.estimate_cfo_blind`).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import modulation as _mod
from ..types import cf32


def _signature(table: np.ndarray) -> Tuple[float, float, float, float]:
    """Exact ``(|C20|, |C40|, kappa4, kappa6)`` of a constellation at
    unit power (expectation over the table)."""
    s = np.asarray(table, np.complex128).ravel()
    s = s / np.sqrt(np.mean(np.abs(s) ** 2))
    c20 = np.mean(s**2)
    c40 = np.mean(s**4) - 3.0 * c20**2
    k4 = float(np.mean(np.abs(s) ** 4))
    k6 = float(np.mean(np.abs(s) ** 6))
    return float(np.abs(c20)), float(np.abs(c40)), k4, k6


#: exact per-candidate (|C20|, |C40|, kappa4 = E|s|^4, kappa6 = E|s|^6)
SIGNATURES: Dict[str, Tuple[float, float, float, float]] = {
    "bpsk": _signature(_mod.bpsk().table),
    "qpsk": _signature(_mod.qpsk().table),
    "psk8": _signature(_mod.psk(8).table),
    "qam16": _signature(_mod.qam16().table),
    "qam64": _signature(_mod.qam(64).table),
}


def cumulant_features(x) -> jnp.ndarray:
    """``[..., 4]``: ``(|C20|, |C40|, m4, m6)`` of a symbol block (mean
    removed, unit-power normalized; batched over leading axes)."""
    x = jnp.asarray(x, dtype=cf32)
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    p = jnp.mean(jnp.real(x) ** 2 + jnp.imag(x) ** 2, axis=-1, keepdims=True)
    x = x / jnp.sqrt(jnp.maximum(p, 1e-30))
    c20 = jnp.mean(x * x, axis=-1)
    c40 = jnp.mean((x * x) ** 2, axis=-1) - 3.0 * c20 * c20
    a2 = jnp.real(x) ** 2 + jnp.imag(x) ** 2
    m4 = jnp.mean(a2 * a2, axis=-1)
    m6 = jnp.mean(a2 * a2 * a2, axis=-1)
    feats = jnp.stack([jnp.abs(c20), jnp.abs(c40), m4, m6], axis=-1)
    return feats.astype(jnp.float32)


#: residual weights: (|C20|, |C40|, m6) — m6 spans ~1..2 and carries the
#: QPSK/QAM split, upweighted accordingly
_WEIGHTS = np.array([1.0, 1.0, 3.0], np.float64)


def classify_modulation(
    x,
    candidates: Sequence[str] = ("bpsk", "qpsk", "psk8", "qam16", "qam64"),
):
    """Identify the modulation of a symbol block.

    Returns ``(name, scores)`` for a single block, or ``(names list,
    scores [..., n_candidates])`` for batched input; ``scores`` are the
    weighted residuals of each candidate's SNR-consistent prediction
    (smaller = closer). The device computes features and residuals in one
    fused pass; only the tiny argmin crosses to the host.
    """
    feats = cumulant_features(x)
    c20_m, c40_m = feats[..., 0], feats[..., 1]
    m4, m6 = feats[..., 2], feats[..., 3]
    sig = np.array([SIGNATURES[c] for c in candidates], np.float32)  # [C, 4]
    k4 = jnp.asarray(sig[:, 2])
    k6 = jnp.asarray(sig[:, 3])
    # per-candidate signal fraction from m4: m4 = k4 S^2 + 4SN + 2N^2,
    # S + N = 1  =>  S = sqrt((2 - m4)/(2 - k4))
    s = jnp.sqrt(jnp.maximum(2.0 - m4[..., None], 0.0) / (2.0 - k4))
    s = jnp.clip(s, 1e-3, 1.0)
    n = 1.0 - s
    m6_pred = (
        k6 * s**3 + 9.0 * k4 * s**2 * n + 18.0 * s * n**2 + 6.0 * n**3
    )
    c20_pred = jnp.asarray(sig[:, 0]) * s
    c40_pred = jnp.asarray(sig[:, 1]) * s * s
    w = np.sqrt(_WEIGHTS)
    d = jnp.sqrt(
        (w[0] * (c20_m[..., None] - c20_pred)) ** 2
        + (w[1] * (c40_m[..., None] - c40_pred)) ** 2
        + (w[2] * (m6[..., None] - m6_pred)) ** 2
    )
    idx = np.asarray(jnp.argmin(d, axis=-1))
    scores = np.asarray(d)
    if idx.ndim == 0:
        return candidates[int(idx)], scores
    names = [candidates[int(i)] for i in idx.ravel()]
    return names, scores

"""Resampling: linear interpolation upsampling and decimating downsampling.

TPU-native re-design of reference ``src/sampling.rs``: both ops are pure
reshapes/broadcasts over the last axis, fully batched, fused by XLA.

Deliberate fix (SURVEY.md §2 quirk 1): the reference's ``interpolate``
computes the imaginary ramp from the **real** base value
(``im: x1.re + i*rate.1``, reference src/sampling.rs:19) — an obvious typo
its tests never catch because they only use signals with ``re == im``. We
interpolate the imaginary part from ``x1.im``; all reference test vectors
still match exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import cf32


def interpolate(src, n_between: int) -> jnp.ndarray:
    """Linearly interpolate ``n_between`` samples between consecutive pairs.

    Output length is ``n + (n - 1) * n_between`` (verified by the reference's
    tests, src/sampling.rs:98): each of the ``n-1`` source intervals expands
    to ``n_between + 1`` points, plus the final source sample.

    Batched over leading axes; one broadcasted multiply-add on the VPU.
    """
    src = jnp.asarray(src, dtype=cf32)
    n = src.shape[-1]
    if n < 2:
        return src
    x1 = src[..., :-1]  # [..., n-1]
    x2 = src[..., 1:]
    step = jnp.float32(1.0 / (n_between + 1))
    rate = (x2 - x1) * step
    i = jnp.arange(n_between + 1, dtype=jnp.float32)  # [n_between+1]
    seg = x1[..., :, None] + i * rate[..., :, None]  # [..., n-1, n_between+1]
    flat = seg.reshape(src.shape[:-1] + ((n - 1) * (n_between + 1),))
    return jnp.concatenate([flat, src[..., -1:]], axis=-1)


def downsample(src, out_len: int) -> jnp.ndarray:
    """Integer decimation: every ``(n / out_len)``-th sample starting at 0.

    No anti-alias filter, matching reference ``downsample``
    (src/sampling.rs:28-42); only even decimations are supported
    (``n % out_len == 0`` asserted like the reference). A strided slice —
    XLA lowers it to a gather/reshape with no host loop.
    """
    src = jnp.asarray(src)
    n = src.shape[-1]
    out_len = int(out_len)
    if n % out_len != 0:
        raise ValueError(
            f"Only even decimations are supported ({n} % {out_len} != 0)"
        )
    dec = n // out_len
    return src[..., ::dec]


def downsample_by(src, factor: int) -> jnp.ndarray:
    """Decimate by an explicit integer factor (``src[..., ::factor]``)."""
    factor = int(factor)
    if jnp.shape(src)[-1] % factor != 0:
        raise ValueError("Input length must be divisible by the decimation factor")
    return jnp.asarray(src)[..., ::factor]

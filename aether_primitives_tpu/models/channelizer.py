"""Streaming waterfall channelizer.

The compute core of the reference's ``plot::waterfall`` (reference
src/util/plot.rs:36-99): pad a long capture to a multiple of ``fft_len``,
transform each chunk (``Scale::SN``), fftshift (``vec_mirror``), take
per-bin magnitude (optionally dB). On TPU the per-chunk loop becomes one
batched FFT over a ``[rows, fft_len]`` block — embarrassingly parallel
across rows and the ideal first multi-chip workload (rows shard over the
mesh with no halo at all).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import vecops as _vecops
from ..ops.fft import Scale, plan as fft_plan
from ..parallel.mesh import CHANNEL_AXIS
from ..types import cf32

P = jax.sharding.PartitionSpec


def _pad_rows(x: jnp.ndarray, fft_len: int) -> jnp.ndarray:
    n = x.shape[-1]
    rem = n % fft_len
    if rem:
        pad = fft_len - rem  # zero-pad like reference src/util/plot.rs:50-57
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x.reshape(x.shape[:-1] + (x.shape[-1] // fft_len, fft_len))


def waterfall_spectra(
    samples, fft_len: int, use_db: bool = False, fft_backend: Optional[str] = None
) -> jnp.ndarray:
    """``[rows, fft_len]`` magnitude (or dB) waterfall of a capture.

    Per row: forward FFT with ``Scale.SN``, fftshift, ``|.|`` — exactly the
    reference's per-chunk ``vec_rfft(SN).vec_mirror()`` + norm
    (src/util/plot.rs:59-68). dB conversion is ``10*log10(mag)`` matching
    ``DB::from`` applied to the amplitude (reference behavior, not a power
    dB — see src/util/plot.rs:65-68).
    """
    x = jnp.asarray(samples, dtype=cf32)
    rows = _pad_rows(x, fft_len)
    spec = fft_plan(fft_len, fft_backend).fwd(rows, Scale.SN)
    spec = _vecops.mirror(spec)
    mag = jnp.abs(spec)
    if use_db:
        mag = 10.0 * jnp.log10(mag)
    return mag


def sharded_waterfall(
    samples,
    fft_len: int,
    mesh: jax.sharding.Mesh,
    use_db: bool = False,
    axis_name: str = CHANNEL_AXIS,
    fft_backend: Optional[str] = None,
) -> jnp.ndarray:
    """Waterfall with rows sharded across the mesh (no cross-shard data
    dependence — pure scale-out). The capture length must split evenly into
    ``fft_len``-rows across devices."""
    x = jnp.asarray(samples, dtype=cf32)
    rows = _pad_rows(x, fft_len)

    def shard_fn(r):
        spec = fft_plan(fft_len, fft_backend).fwd(r, Scale.SN)
        spec = _vecops.mirror(spec)
        mag = jnp.abs(spec)
        return 10.0 * jnp.log10(mag) if use_db else mag

    nb = rows.ndim
    spec_in = P(*([None] * (nb - 2) + [axis_name, None]))
    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=spec_in, out_specs=spec_in)
    return fn(rows)

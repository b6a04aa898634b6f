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


def _frames_overlapped(x: jnp.ndarray, fft_len: int, hop: int) -> jnp.ndarray:
    """Overlapped analysis frames ``[..., n_frames, fft_len]`` with frame m
    starting at ``m*hop``; the capture is zero-padded so the last frame is
    complete.

    TPU-safe construction: requires ``fft_len % hop == 0``; the capture
    reshapes into hop-sized slabs and each frame is a concat of ``q =
    fft_len/hop`` consecutive slabs — dense slices only, no strided gather
    (DEVNOTES.md).
    """
    if hop == fft_len:
        return _pad_rows(x, fft_len)
    q, rem = divmod(fft_len, hop)
    if rem:
        raise ValueError(f"fft_len {fft_len} must be a multiple of hop {hop}")
    n = x.shape[-1]
    n_frames = max(n - fft_len + hop - 1, 0) // hop + 1
    padded_len = (n_frames - 1) * hop + fft_len
    if padded_len > n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, padded_len - n)])
    slabs = x.reshape(x.shape[:-1] + (padded_len // hop, hop))
    pieces = [slabs[..., i : i + n_frames, :] for i in range(q)]
    return jnp.concatenate(pieces, axis=-1)


def _resolve_window(window, fft_len: int):
    if window is None:
        return None
    if isinstance(window, str):
        if window == "hann":
            w = np.hanning(fft_len)
        elif window == "hamming":
            w = np.hamming(fft_len)
        elif window == "blackman":
            w = np.blackman(fft_len)
        else:
            raise ValueError(f"unknown window {window!r}")
        return w.astype(np.float32)
    w = np.asarray(window, dtype=np.float32)
    if w.shape[-1] != fft_len:
        raise ValueError("window length must equal fft_len")
    return w


def waterfall_spectra(
    samples,
    fft_len: int,
    use_db: bool = False,
    fft_backend: Optional[str] = None,
    window=None,
    hop: Optional[int] = None,
) -> jnp.ndarray:
    """``[rows, fft_len]`` magnitude (or dB) waterfall of a capture.

    Per row: forward FFT with ``Scale.SN``, fftshift, ``|.|`` — exactly the
    reference's per-chunk ``vec_rfft(SN).vec_mirror()`` + norm
    (src/util/plot.rs:59-68). dB conversion is ``10*log10(mag)`` matching
    ``DB::from`` applied to the amplitude (reference behavior, not a power
    dB — see src/util/plot.rs:65-68).

    Beyond the reference: optional analysis ``window`` ("hann"/"hamming"/
    "blackman" or an explicit ``[fft_len]`` array) and overlapped frames via
    ``hop < fft_len`` (must divide ``fft_len``) — the windowed-overlap
    streaming channelizer configuration.
    """
    x = jnp.asarray(samples, dtype=cf32)
    rows = _frames_overlapped(x, fft_len, hop or fft_len)
    w = _resolve_window(window, fft_len)
    if w is not None:
        rows = rows * jnp.asarray(w)
    spec = fft_plan(fft_len, fft_backend).fwd(rows, Scale.SN)
    spec = _vecops.mirror(spec)
    mag = jnp.abs(spec)
    if use_db:
        mag = 10.0 * jnp.log10(mag)
    return mag


class Channelizer:
    """Streaming waterfall channelizer stage (pipeline-ready).

    Wraps :func:`waterfall_spectra` with fixed configuration so it drops
    straight into :class:`aether_primitives_tpu.parallel.streaming.Pipeline`
    as a jitted stage; carries no state (frames never straddle block
    boundaries when ``block % fft_len == 0`` and ``hop == fft_len``; for
    overlapped streaming feed blocks with ``fft_len - hop`` samples of
    overlap from the previous block).
    """

    def __init__(
        self,
        fft_len: int,
        use_db: bool = False,
        window=None,
        hop: Optional[int] = None,
        fft_backend: Optional[str] = None,
    ):
        self.fft_len = int(fft_len)
        self.use_db = use_db
        self.window = window
        self.hop = hop
        self.fft_backend = fft_backend

    def step(self, block) -> jnp.ndarray:
        return waterfall_spectra(
            block,
            self.fft_len,
            use_db=self.use_db,
            fft_backend=self.fft_backend,
            window=self.window,
            hop=self.hop,
        )

    __call__ = step


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

"""Visualization — matplotlib equivalents of the reference's five gnuplot
plots (reference src/util/plot.rs): constellation, waterfall, spectrum,
time, compare. Signatures mirror the reference (``file=None`` shows the
figure; a filename saves it — the analog of the gnuplot/pdfcairo switch).

Compute cores (blocked FFT, fftshift, magnitudes) come from the ops layer;
this module only renders. Uses the Agg backend when saving so headless
compute nodes never need a display.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops.fft import Scale, plan as fft_plan
from ..ops import vecops as _vecops
from .db import DB


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def _finish(fig, file: Optional[str]):
    if file is not None:
        fig.savefig(file, bbox_inches="tight")
        _plt().close(fig)
    else:  # pragma: no cover - interactive path
        _plt().show()


def constellation(symbols, title: str, file: Optional[str] = None):
    """Scatter of I/Q points (reference ``constellation``, src/util/plot.rs:10-33)."""
    plt = _plt()
    s = np.asarray(symbols).reshape(-1)
    fig, ax = plt.subplots()
    ax.plot(s.real, s.imag, ".", color="blue", label="Constellation")
    ax.set_title(title)
    ax.set_xlabel("I")
    ax.set_ylabel("Q")
    ax.legend(loc="upper left")
    ax.grid(True, alpha=0.3)
    _finish(fig, file)


def waterfall(
    symbols,
    fft_len: int,
    use_db: bool,
    title: str,
    file: Optional[str] = None,
    fft_backend: Optional[str] = None,
):
    """Time-frequency map: per-chunk ``fft(SN)`` + fftshift + magnitude
    (reference ``waterfall``, src/util/plot.rs:36-99 — zero-pads the capture
    to a whole number of rows)."""
    from ..models.channelizer import waterfall_spectra

    plt = _plt()
    levels = np.asarray(
        waterfall_spectra(np.asarray(symbols), fft_len, use_db=use_db, fft_backend=fft_backend)
    )
    fig, ax = plt.subplots()
    im = ax.imshow(levels, aspect="auto", origin="lower", cmap="viridis")
    ax.set_title(title)
    ax.set_xlabel("bin")
    ax.set_ylabel("row (time)")
    fig.colorbar(im, ax=ax, label="Magnitude [dB]" if use_db else "Magnitude")
    _finish(fig, file)


def spectrum(
    symbols,
    fft_len: int,
    use_db: bool,
    title: str,
    file: Optional[str] = None,
    fft_backend: Optional[str] = None,
):
    """Magnitude spectrum of the **first** fft_len chunk only, like the
    reference (``spectrum``, src/util/plot.rs:102-154)."""
    plt = _plt()
    s = np.asarray(symbols).reshape(-1)
    if len(s) < fft_len:
        s = np.pad(s, (0, fft_len - len(s)))
    spec = np.asarray(fft_plan(fft_len, fft_backend).fwd(s[:fft_len].astype(np.complex64), Scale.SN))
    mag = np.abs(spec)
    if use_db:
        mag = 10.0 * np.log10(mag)
    fig, ax = plt.subplots()
    ax.plot(np.arange(fft_len), mag, "-o", color="green", markersize=2, label="Spectrum")
    ax.set_title(title)
    ax.set_xlim(0, fft_len)
    ax.set_xlabel("bin")
    ax.set_ylabel("Magnitude [dB]" if use_db else "Magnitude")
    ax.legend(loc="upper left")
    _finish(fig, file)


def psd(
    samples,
    fft_len: int,
    title: str,
    file: Optional[str] = None,
    fs: float = 1.0,
    window: str = "hann",
    fft_backend: Optional[str] = None,
):
    """Welch power-spectral-density plot (dB/Hz, fftshifted frequencies) —
    the statistical upgrade of :func:`spectrum` (which shows one noisy
    chunk): frames the whole capture and averages periodograms via
    :func:`~aether_primitives_tpu.models.channelizer.welch_psd`."""
    from ..models.channelizer import welch_psd as _welch

    plt = _plt()
    freqs, p = _welch(
        np.asarray(samples).reshape(-1), fft_len, window=window, fs=fs,
        fft_backend=fft_backend, shift=True,
    )
    fig, ax = plt.subplots()
    ax.plot(freqs, 10.0 * np.log10(np.asarray(p) + 1e-30), color="green")
    ax.set_title(title)
    ax.set_xlabel("frequency" + (" [Hz]" if fs != 1.0 else " [cycles/sample]"))
    ax.set_ylabel("PSD [dB/Hz]")
    ax.grid(True, alpha=0.3)
    _finish(fig, file)


def time(symbol, title: str, file: Optional[str] = None):
    """Real/imag traces with a magnitude subplot (reference ``time``,
    src/util/plot.rs:157-225)."""
    plt = _plt()
    s = np.asarray(symbol).reshape(-1)
    x = np.arange(len(s))
    mx = float(np.abs(s).max()) * 1.1 if len(s) else 1.0
    fig, (ax0, ax1) = plt.subplots(
        2, 1, sharex=True, gridspec_kw={"height_ratios": [3, 1]}
    )
    ax0.plot(x, s.real, "-o", color="blue", markersize=2, label="Real")
    ax0.plot(x, s.imag, "-o", color="red", markersize=2, label="Imaginary")
    ax0.set_xlim(0, len(s))
    ax0.set_ylim(-mx, mx)
    ax0.set_title(title)
    ax0.legend(loc="upper left", ncols=2)
    ax1.plot(x, np.abs(s), color="green", label="Magnitude")
    ax1.set_ylim(0, mx)
    ax1.legend(loc="upper left")
    _finish(fig, file)


def compare(symbols1, symbols2, title: str, file: Optional[str] = None):
    """Two signals overlaid + |error| subplot (reference ``compare``,
    src/util/plot.rs:229-325). Lengths must match."""
    plt = _plt()
    a = np.asarray(symbols1).reshape(-1)
    b = np.asarray(symbols2).reshape(-1)
    if len(a) != len(b):
        raise ValueError("Can only plot vectors of equal length")
    x = np.arange(len(a))
    err = np.abs(a - b)
    fig, (ax0, ax1) = plt.subplots(
        2, 1, sharex=True, gridspec_kw={"height_ratios": [3, 1]}
    )
    ax0.plot(x, a.real, "-", color="green", label="Input 0: real")
    ax0.plot(x, a.imag, ":", color="green", label="Input 0: imaginary")
    ax0.plot(x, b.real, "-", color="blue", label="Input 1: real")
    ax0.plot(x, b.imag, ":", color="blue", label="Input 1: imaginary")
    ax0.set_xlim(0, len(a))
    ax0.set_title(title)
    ax0.legend(loc="upper left", fontsize=7, ncols=2)
    ax1.plot(x, err, "-.", color="red", label="Deviation")
    ax1.legend(loc="upper left")
    _finish(fig, file)


def ambiguity_surface(
    x,
    ref,
    max_doppler: float,
    n_dopplers: int = 64,
    title: str = "ambiguity",
    use_db: bool = True,
    file: Optional[str] = None,
):
    """Delay-Doppler magnitude surface of the cross-ambiguity function
    (:func:`~aether_primitives_tpu.models.caf.ambiguity`) — the
    acquisition counterpart of :func:`waterfall`. Rows = Doppler
    hypotheses, columns = circular delay; the peak marks the detected
    (delay, doppler)."""
    from ..models.caf import ambiguity as _caf

    dops = np.linspace(-max_doppler, max_doppler, int(n_dopplers))
    surf = np.abs(np.asarray(_caf(x, ref, dops.astype(np.float32))))
    if use_db:
        surf = 20.0 * np.log10(np.maximum(surf, 1e-12))
    plt = _plt()
    fig, ax = plt.subplots(figsize=(9, 5))
    im = ax.imshow(
        surf,
        aspect="auto",
        origin="lower",
        extent=[0, surf.shape[1], dops[0], dops[-1]],
        cmap="viridis",
    )
    ax.set_xlabel("delay [samples]")
    ax.set_ylabel("doppler [cycles/sample]")
    ax.set_title(title)
    fig.colorbar(im, ax=ax, label="|CAF| [dB]" if use_db else "|CAF|")
    _finish(fig, file)


def eye(
    x,
    sps: int,
    n_traces: int = 200,
    offset: int = 0,
    title: str = "eye",
    file: Optional[str] = None,
):
    """Eye diagram: overlay of 2-symbol-long segments of a pulse-shaped
    stream (I on top, Q below) — the classic visual check of ISI and
    timing jitter that pairs with
    :func:`~aether_primitives_tpu.models.sync.estimate_timing` /
    ``gardner_loop``. ``offset`` shifts the fold so a recovered timing
    phase can be centered in the eye."""
    xs = np.asarray(x).astype(np.complex64)
    seg = 2 * int(sps)
    start = int(offset) % int(sps)
    n_avail = (len(xs) - start - 1) // seg
    n = min(int(n_traces), n_avail)
    if n <= 0:
        raise ValueError("stream too short for one eye trace")
    traces = xs[start : start + n * seg].reshape(n, seg)
    t = np.arange(seg + 1) / float(sps)
    # close each trace with the first sample of the next segment
    nxt = xs[start + seg : start + n * seg + 1 : seg]
    if len(nxt) < n:
        traces, n = traces[: len(nxt)], len(nxt)
    closed = np.concatenate([traces, nxt[:n, None]], axis=1)
    plt = _plt()
    fig, (ax0, ax1) = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
    for row in closed:
        ax0.plot(t, row.real, color="steelblue", alpha=0.15, lw=0.8)
        ax1.plot(t, row.imag, color="darkorange", alpha=0.15, lw=0.8)
    ax0.set_ylabel("I")
    ax1.set_ylabel("Q")
    ax1.set_xlabel("time [symbols]")
    ax0.set_title(title)
    _finish(fig, file)


def doa_spectrum(
    angles,
    spectrum,
    title: str = "spatial spectrum",
    estimates=None,
    file: Optional[str] = None,
):
    """Spatial (MUSIC/Capon) pseudo-spectrum vs bearing, in dB relative
    to the peak; optional vertical markers at estimated bearings.
    Completes the observability family for :mod:`...models.doa` the way
    :func:`spectrum` does for the frequency axis."""
    ang = np.degrees(np.asarray(angles, dtype=np.float64))
    s = np.abs(np.asarray(spectrum, dtype=np.float64))
    s_db = 10.0 * np.log10(s / (s.max() + 1e-30) + 1e-12)
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(ang, s_db, lw=1.2)
    if estimates is not None:
        for e in np.degrees(np.atleast_1d(np.asarray(estimates, np.float64))):
            ax.axvline(e, color="darkorange", ls="--", lw=1.0)
    ax.set_xlabel("bearing [deg from broadside]")
    ax.set_ylabel("power [dB rel. peak]")
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    _finish(fig, file)

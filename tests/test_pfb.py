"""Polyphase filterbank channelizer tests.

Golden is the direct causal WOLA formula in float64:
``y[t, c] = sum_{p, r} h[p*M + r] x[(t-p)*M + r] e^{-2 pi i c r / M}``
(zeros for t < p) — the branch decomposition the TPU implementation
factorizes into P slab multiplies + one batched matmul FFT. P=1 with unit
taps must reproduce the reference's plain chunked FFT (waterfall core,
reference src/util/plot.rs:59-62).
"""

import numpy as np
import pytest

from aether_primitives_tpu.evm import evm_rms_db
from aether_primitives_tpu.models.channelizer import (
    PfbChannelizer,
    pfb_channelize,
    pfb_prototype,
    pfb_spectra,
    waterfall_spectra,
)
from aether_primitives_tpu.ops.fft import Scale


def rand_c(rng, shape):
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(
        np.complex64
    )


def _direct_pfb(x, h, m):
    """f64 golden: causal branch-filter + DFT across branches."""
    x = x.astype(np.complex128)
    h = h.astype(np.complex128)
    p = -(-h.shape[-1] // m)
    h = np.pad(h, (0, p * m - h.shape[-1]))
    t_frames = -(-x.shape[-1] // m)
    x = np.pad(x, (0, t_frames * m - x.shape[-1]))
    fr = x.reshape(t_frames, m)
    hb = h.reshape(p, m)
    u = np.zeros((t_frames, m), np.complex128)
    for t in range(t_frames):
        for pi in range(p):
            if t - pi >= 0:
                u[t] += hb[pi] * fr[t - pi]
    return np.fft.fft(u, axis=-1)


def test_pfb_matches_f64_direct():
    rng = np.random.default_rng(30)
    m, p = 32, 4
    x = rand_c(rng, m * 10 - 7)  # ragged tail exercises the zero pad
    h = pfb_prototype(m, p)
    got = np.asarray(pfb_channelize(x, m, taps=h))
    ref = _direct_pfb(x, h, m)
    assert got.shape == (10, m)
    assert evm_rms_db(got, ref) < -110


def test_pfb_arbitrary_complex_taps_and_batch():
    rng = np.random.default_rng(31)
    m, p = 16, 3
    x = rand_c(rng, (2, m * 8))
    h = (0.3 * rand_c(rng, p * m)).astype(np.complex64)
    got = np.asarray(pfb_channelize(x, m, taps=h))
    ref = np.stack([_direct_pfb(row, h, m) for row in x])
    assert evm_rms_db(got, ref) < -110


def test_pfb_p1_unit_taps_is_plain_chunked_fft():
    # rectangular-window degenerate case == the reference waterfall core
    rng = np.random.default_rng(32)
    m = 64
    x = rand_c(rng, m * 6)
    got = np.asarray(
        pfb_channelize(x, m, taps=np.ones(m, np.complex64), scale=Scale.SN)
    )
    ref = np.fft.fft(
        x.astype(np.complex128).reshape(6, m), axis=-1
    ) / np.sqrt(np.float64(m))
    assert evm_rms_db(got, ref) < -120


def test_pfb_spectra_matches_waterfall_for_rect():
    rng = np.random.default_rng(33)
    m = 32
    x = rand_c(rng, m * 5)
    a = np.asarray(pfb_spectra(x, m, taps=np.ones(m, np.complex64)))
    b = np.asarray(waterfall_spectra(x, m))
    assert np.allclose(a, b, atol=1e-5)


def test_pfb_history_stitches_blocks():
    rng = np.random.default_rng(34)
    m, p = 16, 4
    x = rand_c(rng, m * 12)
    h = pfb_prototype(m, p)
    whole = np.asarray(pfb_channelize(x, m, taps=h))
    half = m * 6
    a = np.asarray(pfb_channelize(x[:half], m, taps=h))
    b = np.asarray(
        pfb_channelize(
            x[half:], m, taps=h, history=x[half - (p - 1) * m : half]
        )
    )
    assert evm_rms_db(np.concatenate([a, b]), whole.astype(np.complex128)) < -120


def test_pfb_channelizer_stage_is_stateful():
    rng = np.random.default_rng(35)
    m, p = 16, 4
    x = rand_c(rng, m * 12)
    whole = np.asarray(pfb_channelize(x, m, taps=pfb_prototype(m, p)))
    st = PfbChannelizer(m, taps_per_branch=p)
    got = np.concatenate(
        [np.asarray(st.step(x[: m * 6])), np.asarray(st.step(x[m * 6 :]))]
    )
    assert evm_rms_db(got, whole.astype(np.complex128)) < -120


def test_pfb_channel_isolation_beats_rectangle():
    # a tone centered between channels leaks everywhere through a
    # rectangle's -13 dB sinc sidelobes; the prototype skirt must cut the
    # far-channel leakage by >= 30 dB relative to that
    m = 64
    t = np.arange(m * 64)
    f = (3 + 0.5) / m  # half-way between channels 3 and 4 (worst case)
    x = np.exp(2j * np.pi * f * t).astype(np.complex64)
    rect = np.abs(
        np.asarray(pfb_channelize(x, m, taps=np.ones(m, np.complex64)))
    )[8:]
    pfb = np.abs(np.asarray(pfb_channelize(x, m, taps_per_branch=8)))[8:]
    far = [c for c in range(m) if min(abs(c - 3), abs(c - 4)) > 4]
    rect_leak = rect[:, far].max() / rect.max()
    pfb_leak = pfb[:, far].max() / pfb.max()
    assert 20 * np.log10(pfb_leak / rect_leak) < -30


def test_pfb_history_length_validated():
    with pytest.raises(ValueError, match="history"):
        pfb_channelize(
            np.zeros(64, np.complex64), 16, taps_per_branch=4,
            history=np.zeros(5, np.complex64),
        )


def test_sharded_pfb_matches_single(eight_devices):
    from aether_primitives_tpu.models.channelizer import sharded_pfb
    from aether_primitives_tpu.parallel import mesh as mesh_mod

    rng = np.random.default_rng(36)
    m, p = 16, 4
    x = rand_c(rng, 8 * m * 4)  # 4 frames per device
    mesh = mesh_mod.make_mesh({"time": 8})
    single = np.asarray(pfb_channelize(x, m, taps_per_branch=p))
    shard = np.asarray(sharded_pfb(x, m, mesh, taps_per_branch=p))
    assert (single == shard).all()

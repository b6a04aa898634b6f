"""FIR / correlation tests: f64 convolution goldens, overlap-save equality,
correlator peak semantics (the finished capability behind the reference's
stub fir.rs and bench correlator, benches/benches.rs:382-423)."""

import numpy as np
import pytest

from aether_primitives_tpu.evm import evm_rms_db
from aether_primitives_tpu.ops import fir


def rand_c(rng, n):
    return (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)


@pytest.mark.parametrize("n,k", [(256, 9), (1024, 33), (4096, 65), (1000, 17)])
def test_fir_vs_numpy_golden(n, k):
    rng = np.random.default_rng(n + k)
    x, taps = rand_c(rng, n), rand_c(rng, k)
    got = np.asarray(fir.fir_filter(x, taps))
    gold = np.convolve(x.astype(np.complex128), taps.astype(np.complex128))[:n]
    assert evm_rms_db(got, gold) < -120


def test_fir_batched():
    rng = np.random.default_rng(0)
    x = rand_c(rng, 512).reshape(4, 128)
    taps = rand_c(rng, 9)
    got = np.asarray(fir.fir_filter(x, taps))
    assert got.shape == (4, 128)
    for i in range(4):
        gold = np.convolve(x[i].astype(np.complex128), taps.astype(np.complex128))[:128]
        assert evm_rms_db(got[i], gold) < -120


@pytest.mark.parametrize("factor", [1, 2, 4])
def test_fir_filter_decimate_equals_filter_then_downsample(factor):
    from aether_primitives_tpu.ops import sampling

    rng = np.random.default_rng(11)
    x, taps = rand_c(rng, 1024), rand_c(rng, 33)
    fused = np.asarray(fir.fir_filter_decimate(x, taps, factor))
    ref = np.asarray(sampling.downsample_by(fir.fir_filter(x, taps), factor))
    assert fused.shape == ref.shape == (1024 // factor,)
    assert (fused == ref).all()  # identical compute graph per output


def test_fir_filter_decimate_valid_with_history():
    # the sharded-halo form: input pre-extended with its K-1 history
    rng = np.random.default_rng(12)
    x, taps = rand_c(rng, 1024), rand_c(rng, 17)
    full = np.asarray(fir.fir_filter_decimate(x, taps, 4))
    # split x into two halves; second half processed with history halo
    h1 = np.asarray(fir.fir_filter_decimate(x[:512], taps, 4))
    ext = np.concatenate([x[512 - 16 : 512], x[512:]])
    h2 = np.asarray(fir.fir_filter_decimate(ext, taps, 4, padding="valid"))
    assert (np.concatenate([h1, h2]) == full).all()


@pytest.mark.parametrize("block_len", [None, 256, 1024])
def test_overlap_save_equals_direct(block_len):
    rng = np.random.default_rng(3)
    x, taps = rand_c(rng, 4096), rand_c(rng, 33)
    direct = np.asarray(fir.fir_filter(x, taps))
    os_ = np.asarray(fir.fir_filter_os(x, taps, block_len=block_len))
    assert evm_rms_db(os_, direct.astype(np.complex128)) < -115


def test_overlap_save_single_tap():
    rng = np.random.default_rng(4)
    x = rand_c(rng, 1024)
    taps = np.array([2.0 + 1.0j], np.complex64)
    os_ = np.asarray(fir.fir_filter_os(x, taps, block_len=256))
    assert evm_rms_db(os_, (x * taps[0]).astype(np.complex128)) < -115


def test_overlap_save_indivisible_pads():
    # explicit block_len that doesn't divide n: tail block zero-padded and
    # output sliced back — equal to the direct filter
    rng = np.random.default_rng(7)
    x, taps = rand_c(rng, 1000), rand_c(rng, 9)
    direct = np.asarray(fir.fir_filter(x, taps))
    os_ = np.asarray(fir.fir_filter_os(x, taps, block_len=256))
    assert os_.shape == (1000,)
    assert evm_rms_db(os_, direct.astype(np.complex128)) < -110


def test_overlap_save_block_too_small_raises():
    with pytest.raises(ValueError, match="taps-1"):
        fir.fir_filter_os(np.zeros(1000, np.complex64), np.ones(9, np.complex64), block_len=4)


@pytest.mark.parametrize(
    "n,k,factor", [(4096, 65, 4), (5000, 33, 5), (300, 9, 3), (1024, 1, 4)]
)
def test_os_decimate_equals_direct(n, k, factor):
    rng = np.random.default_rng(n + k + factor)
    x, taps = rand_c(rng, n), rand_c(rng, k)
    direct = np.asarray(fir.fir_filter_decimate(x, taps, factor))
    got = np.asarray(fir.fir_filter_os_decimate(x, taps, factor))
    assert got.shape == direct.shape == (-(-n // factor),)
    assert evm_rms_db(got, direct.astype(np.complex128)) < -110


def test_os_decimate_history_stitches_streams():
    rng = np.random.default_rng(51)
    x, taps = rand_c(rng, 8192), rand_c(rng, 33)
    whole = np.asarray(fir.fir_filter_os_decimate(x, taps, 4))
    a = np.asarray(fir.fir_filter_os_decimate(x[:4096], taps, 4))
    b = np.asarray(
        fir.fir_filter_os_decimate(x[4096:], taps, 4, history=x[4096 - 32 : 4096])
    )
    assert evm_rms_db(np.concatenate([a, b]), whole.astype(np.complex128)) < -120


def test_os_decimate_batched_and_factor_one():
    rng = np.random.default_rng(52)
    x, taps = rand_c(rng, 2048).reshape(2, 1024), rand_c(rng, 17)
    got = np.asarray(fir.fir_filter_os_decimate(x, taps, 2))
    assert got.shape == (2, 512)
    for i in range(2):
        ref = np.asarray(fir.fir_filter_decimate(x[i], taps, 2))
        assert evm_rms_db(got[i], ref.astype(np.complex128)) < -110
    f1 = np.asarray(fir.fir_filter_os_decimate(x, taps, 1))
    assert evm_rms_db(f1, np.asarray(fir.fir_filter(x, taps)).astype(np.complex128)) < -115


def test_os_decimate_bad_block_len_raises():
    x = np.zeros(1024, np.complex64)
    taps = np.ones(9, np.complex64)
    with pytest.raises(ValueError, match="multiple"):
        fir.fir_filter_os_decimate(x, taps, 4, block_len=130)


def test_correlator_peak():
    # a 4-sample signature repeated every 4 samples, like the reference
    # bench setup (benches/benches.rs:388-400): circular correlation peaks
    # at every alignment
    sig = np.array([-1 + 1j, 0, 1 - 1j, 1 - 1j], np.complex64)
    x = np.tile(sig, 128)  # len 512
    c = np.asarray(fir.correlate(x, sig))
    peaks = np.where(np.abs(c) > 0.9 * np.abs(c).max())[0]
    assert (peaks % 4 == 0).all() and len(peaks) == 128


def test_correlator_vs_direct_golden():
    rng = np.random.default_rng(5)
    x = rand_c(rng, 256)
    ref = rand_c(rng, 256)
    got = np.asarray(fir.correlate(x, ref))
    # direct circular correlation: c[lag] = sum_m x[m] conj(ref[m - lag])
    xm = x.astype(np.complex128)
    rm = ref.astype(np.complex128)
    gold = np.array(
        [np.sum(xm * np.conj(np.roll(rm, lag))) for lag in range(256)]
    )
    assert evm_rms_db(got, gold) < -110


def test_correlate_embedded_pattern_offset():
    rng = np.random.default_rng(6)
    pattern = rand_c(rng, 64)
    x = 0.01 * rand_c(rng, 1024)
    x[300:364] += pattern
    c = np.asarray(fir.correlate(x, pattern))
    assert int(np.argmax(np.abs(c))) == 300


def test_matched_filter_peak_position():
    rng = np.random.default_rng(13)
    pattern = rand_c(rng, 64)
    x = (0.01 * rand_c(rng, 2048)).astype(np.complex64)
    x[500:564] += pattern
    y = np.asarray(fir.matched_filter(x, pattern))
    # causal convention: peak at offset + M - 1
    assert int(np.argmax(np.abs(y))) == 500 + 63
    # peak value ~ ref energy
    assert abs(np.abs(y[563]) - np.sum(np.abs(pattern) ** 2)) < 1.0


def test_matched_filter_vs_direct():
    rng = np.random.default_rng(14)
    x = rand_c(rng, 512)
    ref = rand_c(rng, 32)
    got = np.asarray(fir.matched_filter(x, ref))
    taps = np.conj(ref[::-1]).astype(np.complex128)
    gold = np.convolve(x.astype(np.complex128), taps)[:512]
    assert evm_rms_db(got, gold) < -110


def test_matched_filter_streaming_with_history():
    rng = np.random.default_rng(15)
    x = rand_c(rng, 1024)
    ref = rand_c(rng, 17)
    full = np.asarray(fir.matched_filter(x, ref, block_len=256))
    h1 = np.asarray(fir.matched_filter(x[:512], ref, block_len=256))
    h2 = np.asarray(
        fir.matched_filter(x[512:], ref, block_len=256, history=x[512 - 16 : 512])
    )
    assert evm_rms_db(np.concatenate([h1, h2]), full.astype(np.complex128)) < -120


def test_overlap_save_odd_lengths_default_blocking():
    # lengths with no usable power-of-two divisor fall back to one block
    rng = np.random.default_rng(16)
    for n in (1001, 4098):
        x, taps = rand_c(rng, n), rand_c(rng, 33)
        direct = np.asarray(fir.fir_filter(x, taps))
        os_ = np.asarray(fir.fir_filter_os(x, taps))
        assert evm_rms_db(os_, direct.astype(np.complex128)) < -110, n


# --------------------------------------------------------------------------
# fused FIR + decimate + frame-FFT (the RX chain hot path)
# --------------------------------------------------------------------------


def _fused_reference(x, taps, dec, fft_len):
    """f64 golden: causal FIR -> frame -> decimate -> unnormalized FFT."""
    n = x.shape[-1]
    y = np.convolve(x.astype(np.complex128), taps.astype(np.complex128))[:n]
    fr = y.reshape(-1, dec * fft_len)[:, ::dec]
    return np.fft.fft(fr, axis=-1)


def test_fir_decimate_fft_matches_f64_reference():
    rng = np.random.default_rng(20)
    dec, fft_len = 4, 256
    n = dec * fft_len * 6
    x = rand_c(rng, n)
    taps = (0.1 * rand_c(rng, 33)).astype(np.complex64)
    got = np.asarray(fir.fir_decimate_fft(x, taps, dec, fft_len))
    assert evm_rms_db(got, _fused_reference(x, taps, dec, fft_len)) < -110


def test_fir_decimate_fft_history_stitches_streams():
    # chunk 2 fed the tail of chunk 1 as history == one contiguous run
    rng = np.random.default_rng(21)
    dec, fft_len, k = 4, 256, 33
    n = dec * fft_len * 8
    x = rand_c(rng, n)
    taps = (0.1 * rand_c(rng, k)).astype(np.complex64)
    ref = _fused_reference(x, taps, dec, fft_len)
    g1 = np.asarray(fir.fir_decimate_fft(x[: n // 2], taps, dec, fft_len))
    g2 = np.asarray(
        fir.fir_decimate_fft(
            x[n // 2 :], taps, dec, fft_len, history=x[n // 2 - (k - 1) : n // 2]
        )
    )
    assert evm_rms_db(np.concatenate([g1, g2]), ref) < -110


def test_fir_decimate_fft_taps_not_multiple_of_dec():
    # K-1 not divisible by dec exercises the ragged correction rows
    rng = np.random.default_rng(22)
    dec, fft_len = 4, 128
    n = dec * fft_len * 4
    x = rand_c(rng, (3, n))
    taps = (0.2 * rand_c(rng, 18)).astype(np.complex64)
    got = np.asarray(fir.fir_decimate_fft(x, taps, dec, fft_len))
    ref = np.stack([_fused_reference(row, taps, dec, fft_len) for row in x])
    assert evm_rms_db(got, ref) < -110


def test_fir_decimate_fft_dec1_and_identity():
    rng = np.random.default_rng(23)
    fft_len = 256
    x = rand_c(rng, fft_len * 4)
    got = np.asarray(fir.fir_decimate_fft(x, np.ones(1, np.complex64), 1, fft_len))
    ref = np.fft.fft(x.astype(np.complex128).reshape(-1, fft_len), axis=-1)
    assert evm_rms_db(got, ref) < -110


@pytest.mark.parametrize("n1", [8, 16, 32, 64, 128])
def test_fir_decimate_fft_stage_n1_override(n1):
    # any divisor of fft_len is a valid first-stage size; all must match
    # the f64 reference (the sweet spot is chosen on hardware —
    # benches/n1_sweep.py — so correctness must hold across the sweep)
    rng = np.random.default_rng(25)
    dec, fft_len = 4, 128
    n = dec * fft_len * 5
    x = rand_c(rng, n)
    taps = (0.1 * rand_c(rng, 17)).astype(np.complex64)
    got = np.asarray(
        fir.fir_decimate_fft(
            x, taps, dec, fft_len, fft_backend="matmul", stage_n1=n1
        )
    )
    assert evm_rms_db(got, _fused_reference(x, taps, dec, fft_len)) < -110


def test_fir_decimate_fft_stage_n1_invalid():
    x = np.zeros(4 * 128 * 2, np.complex64)
    taps = np.ones(5, np.complex64)
    with pytest.raises(ValueError, match="divide"):
        fir.fir_decimate_fft(
            x, taps, 4, 128, fft_backend="matmul", stage_n1=7
        )


def test_fir_decimate_fft_scale_and_errors():
    from aether_primitives_tpu.ops.fft import Scale

    rng = np.random.default_rng(24)
    dec, fft_len = 2, 128
    x = rand_c(rng, dec * fft_len * 2)
    taps = (0.3 * rand_c(rng, 9)).astype(np.complex64)
    a = np.asarray(fir.fir_decimate_fft(x, taps, dec, fft_len, Scale.SN))
    b = np.asarray(fir.fir_decimate_fft(x, taps, dec, fft_len)) / np.sqrt(
        np.float32(fft_len)
    )
    assert np.allclose(a, b, atol=1e-5)
    with pytest.raises(ValueError):
        fir.fir_decimate_fft(x[:-1], taps, dec, fft_len)
    with pytest.raises(ValueError):
        fir.fir_decimate_fft(x, taps, dec, fft_len, history=x[:3])


def _zero_stuff(x, dec):
    up = np.zeros(x.size * dec, np.complex128)
    up[::dec] = x
    return up


def test_interp_fir_ifft_matches_f64_reference():
    from aether_primitives_tpu.ops.fft import Scale

    rng = np.random.default_rng(40)
    for dec, n, k in [(4, 256, 65), (2, 128, 9), (3, 120, 17), (1, 256, 5)]:
        spec = rand_c(rng, (5, n))
        taps = (0.1 * rand_c(rng, k)).astype(np.complex64)
        s = 1.0 / np.sqrt(np.float32(n))
        x = np.conj(np.fft.fft(np.conj(spec.astype(np.complex128)), axis=-1)) * s
        up = _zero_stuff(x.reshape(-1), dec)
        ref = np.convolve(up, taps.astype(np.complex128))[: up.size]
        got = np.asarray(fir.interp_fir_ifft(spec, taps, dec, Scale.SN))
        assert evm_rms_db(got, ref) < -110, (dec, n, k)


def test_interp_fir_ifft_history_stitches_streams():
    from aether_primitives_tpu.ops.fft import Scale

    rng = np.random.default_rng(41)
    dec, n, k = 4, 256, 33
    spec = rand_c(rng, (8, n))
    taps = (0.1 * rand_c(rng, k)).astype(np.complex64)
    whole = np.asarray(fir.interp_fir_ifft(spec, taps, dec, Scale.SN))
    a = np.asarray(fir.interp_fir_ifft(spec[:4], taps, dec, Scale.SN))
    b = np.asarray(
        fir.interp_fir_ifft(spec[4:], taps, dec, Scale.SN, history_spec=spec[3])
    )
    assert evm_rms_db(np.concatenate([a, b]), whole.astype(np.complex128)) < -130


def test_tx_chain_fused_mode_agrees():
    from aether_primitives_tpu.models import TxChain, RxChainConfig

    rng = np.random.default_rng(42)
    base = dict(fft_len=256, decimation=4, active_bins=128)
    bits = rng.integers(0, 2, 128 * 2 * 4).astype(np.uint8)
    ref_sig = np.asarray(TxChain(RxChainConfig(**base, fir_mode="shift_add")).step(bits))
    for mode in ("os", "fused"):
        sig = np.asarray(TxChain(RxChainConfig(**base, fir_mode=mode)).step(bits))
        assert evm_rms_db(sig, ref_sig.astype(np.complex128)) < -110, mode


def test_fir_filter_os_per_row_taps(rng):
    # taps with a leading batch axis: each row filtered by its own taps,
    # equal to row-by-row np.convolve (causal)
    n, k, rows = 300, 7, 5
    x = rand_c(rng, (rows, n))
    taps = (0.3 * rand_c(rng, (rows, k))).astype(np.complex64)
    got = np.asarray(fir.fir_filter_os(x, taps, block_len=64))
    for r in range(rows):
        ref = np.convolve(
            x[r].astype(np.complex128), taps[r].astype(np.complex128)
        )[:n]
        assert evm_rms_db(got[r], ref) < -120, r


def test_fir_filter_os_per_row_taps_broadcast(rng):
    # a [rows, k] tap bank broadcasts against extra leading batch axes
    n, k, rows = 128, 5, 3
    x = rand_c(rng, (2, rows, n))
    taps = (0.3 * rand_c(rng, (rows, k))).astype(np.complex64)
    got = np.asarray(fir.fir_filter_os(x, taps))
    for b in range(2):
        ref = np.asarray(fir.fir_filter_os(x[b], taps))
        assert np.allclose(got[b], ref, atol=1e-6)

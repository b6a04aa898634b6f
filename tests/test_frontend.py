"""Front-end conditioning tests: NCO mixer goldens, DC removal,
IQ-imbalance estimate/correct (image-rejection figure of merit), block AGC
convergence."""

import numpy as np
import pytest

from aether_primitives_tpu.evm import evm_rms_db
from aether_primitives_tpu.ops import frontend


def rand_c(rng, n):
    return (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)


def test_nco_mix_golden(rng):
    x = rand_c(rng, 4096)
    f, p0 = 0.01237, 0.7
    got = np.asarray(frontend.nco_mix(x, f, p0))
    n = np.arange(4096)
    gold = x.astype(np.complex128) * np.exp(1j * (2 * np.pi * f * n + p0))
    # two f32 roundings (split-table rotator product + the mix) ~ -107 dB
    assert evm_rms_db(got, gold) < -105


def test_nco_mix_batched_per_row_freq(rng):
    x = rand_c(rng, 512).reshape(4, 128)
    f = np.array([0.0, 0.1, -0.25, 0.031], np.float32)
    got = np.asarray(frontend.nco_mix(x, f))
    for i in range(4):
        n = np.arange(128)
        gold = x[i].astype(np.complex128) * np.exp(2j * np.pi * f[i] * n)
        assert evm_rms_db(got[i], gold) < -105


def test_nco_streaming_phase_continuity(rng):
    x = rand_c(rng, 2048)
    f = 0.0173
    whole = np.asarray(frontend.nco_mix(x, f))
    a = np.asarray(frontend.nco_mix(x[:1024], f))
    p1 = np.asarray(frontend.next_phase(1024, f))
    b = np.asarray(frontend.nco_mix(x[1024:], f, p1))
    assert evm_rms_db(np.concatenate([a, b]), whole.astype(np.complex128)) < -105


def test_nco_undoes_cfo_like_sync(rng):
    # nco_mix(-f) must match models.sync.apply_freq_shift(+f)
    from aether_primitives_tpu.models import sync

    x = rand_c(rng, 1024)
    f = 0.003
    assert (
        evm_rms_db(
            np.asarray(frontend.nco_mix(x, -f)),
            np.asarray(sync.apply_freq_shift(x, f)).astype(np.complex128),
        )
        < -100
    )


def test_remove_dc(rng):
    x = rand_c(rng, 4096) + (0.5 - 0.25j)
    y = np.asarray(frontend.remove_dc(x))
    assert abs(y.mean()) < 1e-6
    dc = np.asarray(frontend.dc_offset(x))
    assert abs(dc - x.mean()) < 1e-6


def test_iq_imbalance_estimate_and_correct(rng):
    x = rand_c(rng, 1 << 16) / np.sqrt(2)  # proper complex noise
    g_true, ph_true = 1.12, 0.08
    y = np.asarray(frontend.apply_iq_imbalance(x, g_true, ph_true))
    g, ph = (np.asarray(v) for v in frontend.estimate_iq_imbalance(y))
    assert abs(g - g_true) < 0.01
    assert abs(ph - ph_true) < 0.01
    z = np.asarray(frontend.correct_iq_imbalance(y, g, ph))
    # exact-inverse check with the true parameters
    z_exact = np.asarray(frontend.correct_iq_imbalance(y, g_true, ph_true))
    assert evm_rms_db(z_exact, x.astype(np.complex128)) < -100
    # blind correction restores circularity: E[z^2] -> 0
    assert abs((z**2).mean()) < 20 * abs((x.astype(np.complex128) ** 2).mean() + 1e-9)


def test_iq_imbalance_image_rejection_tone():
    n = 4096
    t = np.arange(n)
    tone = np.exp(2j * np.pi * 300 * t / n).astype(np.complex64)
    y = np.asarray(frontend.apply_iq_imbalance(tone, 1.1, 0.05))
    irr_before = float(np.asarray(frontend.image_rejection_db(y, 300)))
    # estimate from noise-like stats doesn't hold for a single tone
    # (E[x^2] != 0), so correct with known parameters — the calibration path
    z = np.asarray(frontend.correct_iq_imbalance(y, 1.1, 0.05))
    irr_after = float(np.asarray(frontend.image_rejection_db(z, 300)))
    assert irr_before < 35.0
    assert irr_after > irr_before + 40.0


def test_agc_converges_and_streams(rng):
    x = (0.05 * rand_c(rng, 1 << 15)).astype(np.complex64)
    y, g = frontend.agc(x, target_rms=1.0, block=1024, alpha=0.5)
    y = np.asarray(y)
    tail_rms = np.sqrt(np.mean(np.abs(y[-4096:]) ** 2))
    assert abs(tail_rms - 1.0) < 0.05
    # streaming: two halves with carried gain == one call
    y1, g1 = frontend.agc(x[: 1 << 14], block=1024, alpha=0.5)
    y2, _ = frontend.agc(x[1 << 14 :], block=1024, alpha=0.5, gain0=g1)
    stitched = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert (stitched == y).all()


def test_agc_ragged_tail_and_alpha_one(rng):
    x = (2.0 * rand_c(rng, 3000)).astype(np.complex64)
    y, g = frontend.agc(x, block=1024, alpha=1.0)
    y = np.asarray(y)
    assert y.shape == (3000,)
    # alpha=1: block 2 is scaled by exactly target/rms(block 1)
    b1 = x[1024:2048]
    expect_gain = 1.0 / np.sqrt(np.mean(np.abs(b1) ** 2) + 1e-12)
    got_gain = y[2048] / x[2048]
    assert abs(got_gain - expect_gain) < 1e-4


def test_agc_rejects_batched(rng):
    with pytest.raises(ValueError, match="1-D"):
        frontend.agc(rand_c(rng, 128).reshape(2, 64))


def test_normalize_rms(rng):
    x = 3.3 * rand_c(rng, 2048).reshape(2, 1024)
    y = np.asarray(frontend.normalize_rms(x, 2.0))
    for i in range(2):
        assert abs(np.sqrt(np.mean(np.abs(y[i]) ** 2)) - 2.0) < 1e-3


@pytest.mark.parametrize("snr_db", [0.0, 10.0, 20.0])
def test_estimate_snr_m2m4(rng, snr_db):
    from aether_primitives_tpu.ops import modulation

    n = 1 << 16
    bits = rng.integers(0, 2, 2 * n).astype(np.uint8)
    s = np.asarray(modulation.qpsk().modulate(bits)) / np.sqrt(2)  # |s|=1
    npow = 10 ** (-snr_db / 10)
    noise = np.sqrt(npow / 2) * (
        rng.normal(size=n) + 1j * rng.normal(size=n)
    )
    y = (s + noise).astype(np.complex64)
    est_db = 10 * np.log10(float(np.asarray(frontend.estimate_snr_m2m4(y))))
    assert abs(est_db - snr_db) < 0.5, (snr_db, est_db)


def test_estimate_snr_clean_signal_is_inf():
    tone = np.exp(2j * np.pi * 0.1 * np.arange(4096)).astype(np.complex64)
    assert np.isinf(float(np.asarray(frontend.estimate_snr_m2m4(tone))))


# ---- impulse blanker + squelch --------------------------------------------------


def test_impulse_blank_removes_spikes(rng):
    from aether_primitives_tpu.ops.frontend import impulse_blank

    n = 8192
    x = ((rng.normal(size=n) + 1j * rng.normal(size=n)) / np.sqrt(2)).astype(
        np.complex64
    )
    spiky = x.copy()
    pos = rng.choice(n, 20, replace=False)
    spiky[pos] += 40.0 * np.exp(1j * rng.uniform(0, 2 * np.pi, 20)).astype(
        np.complex64
    )
    out = np.asarray(impulse_blank(spiky, threshold_sigma=6.0))
    assert np.abs(out[pos]).max() < 1e-6  # spikes zeroed
    untouched = np.setdiff1d(np.arange(n), pos)
    frac_kept = np.mean(out[untouched] == spiky[untouched])
    assert frac_kept > 0.999  # clean samples pass through


def test_impulse_blank_clip_keeps_phase(rng):
    from aether_primitives_tpu.ops.frontend import impulse_blank

    x = np.zeros(4096, np.complex64)
    x[:] = 0.7 + 0.7j
    x[100] = 50.0 * np.exp(1j * 1.2)
    out = np.asarray(impulse_blank(x, threshold_sigma=4.0, mode="clip"))
    assert np.abs(out[100]) < 10.0
    assert abs(np.angle(out[100]) - 1.2) < 1e-5
    with pytest.raises(ValueError, match="mode"):
        impulse_blank(x, mode="wrong")


def test_impulse_blank_improves_demod(rng):
    # the blanker's real benefit: an impulse BEFORE the matched filter
    # smears over the filter span (~16 symbols here); blanking the raw
    # stream first contains it. (Blanking cannot fix the hit sample
    # itself -- the win is stopping the spread.)
    from aether_primitives_tpu.ops import fir as fir_mod
    from aether_primitives_tpu.ops import modulation as mod
    from aether_primitives_tpu.ops.frontend import impulse_blank

    q = mod.qpsk()
    sps, nsym = 4, 2048
    bits = rng.integers(0, 2, 2 * nsym).astype(np.uint8)
    syms = np.asarray(q.modulate(bits))
    up = np.zeros(nsym * sps, np.complex64)
    up[::sps] = syms
    taps = fir_mod.rrc_taps(sps, span=8)
    shaped = np.asarray(fir_mod.fir_filter(up, taps)).copy()
    pos = rng.choice(nsym * sps, 30, replace=False)
    shaped[pos] += 25.0 * np.exp(
        1j * rng.uniform(0, 2 * np.pi, 30)
    ).astype(np.complex64)

    def symbol_errs(raw):
        mf = np.asarray(fir_mod.fir_filter(raw, taps))
        d = 2 * (8 * sps)  # two 32-sample (half-span) group delays
        pts = mf[d :: sps][:nsym]
        out = np.asarray(q.demod(pts.astype(np.complex64)))
        return int((out != bits[: len(out)]).sum())

    e_dirty = symbol_errs(shaped)
    e_clean = symbol_errs(np.asarray(impulse_blank(shaped, threshold_sigma=6.0)))
    assert e_dirty > 30
    assert e_clean < e_dirty / 5


def test_squelch_gates_rows(rng):
    from aether_primitives_tpu.ops.frontend import squelch

    strong = (rng.normal(size=256) + 1j * rng.normal(size=256)).astype(np.complex64)
    weak = (0.001 * (rng.normal(size=256) + 1j * rng.normal(size=256))).astype(
        np.complex64
    )
    x = np.stack([strong, weak])
    gated, open_ = squelch(x, threshold_db=-20.0)
    assert list(np.asarray(open_)) == [True, False]
    assert (np.asarray(gated)[1] == 0).all()
    assert np.allclose(np.asarray(gated)[0], strong)

"""Detection: false-alarm calibration of the energy detector, CFAR
constant-false-alarm behavior across a varying noise floor, burst
segmentation."""

import numpy as np
import pytest

from aether_primitives_tpu.models import detect


def test_energy_detector_pfa_calibration(rng):
    # noise-only: measured false-alarm rate must match the requested pfa
    n_blocks, bl = 20000, 64
    x = (rng.normal(size=n_blocks * bl) + 1j * rng.normal(size=n_blocks * bl)) \
        .astype(np.complex64) / np.sqrt(2)
    det, _ = detect.energy_detect(x, bl, noise_power=1.0, pfa=1e-2)
    rate = float(np.mean(np.asarray(det)))
    assert 0.5e-2 < rate < 2e-2, rate


def test_energy_detector_finds_burst(rng):
    bl = 64
    x = (rng.normal(size=256 * bl) + 1j * rng.normal(size=256 * bl)) \
        .astype(np.complex64) / np.sqrt(2)
    x[100 * bl : 110 * bl] += 1.5  # +3.5 dB burst over 10 blocks
    det, power = detect.energy_detect(x, bl, noise_power=1.0, pfa=1e-4)
    got = np.where(np.asarray(det))[0]
    assert set(range(100, 110)) <= set(got.tolist())
    assert len(got) <= 12  # at most a couple of false alarms


def test_cfar_constant_false_alarm_over_sloped_floor(rng):
    # noise floor rises 10x across the series: plain thresholding can't
    # hold a constant rate, CFAR can
    n = 200000
    floor = np.linspace(1.0, 10.0, n)
    p = rng.exponential(scale=floor).astype(np.float32)
    det, noise = detect.ca_cfar(p, train=32, guard=2, pfa=1e-2)
    rate = float(np.mean(np.asarray(det)))
    assert 0.5e-2 < rate < 2.5e-2, rate
    # local noise estimate tracks the slope
    est = np.asarray(noise)
    assert abs(est[5000] - floor[5000]) < 0.5
    assert abs(est[-5000] - floor[-5000]) < 2.0


def test_cfar_detects_target_in_clutter(rng):
    p = rng.exponential(scale=1.0, size=4096).astype(np.float32)
    p[1000] = 50.0  # strong target
    p[3000] = 50.0
    det, _ = detect.ca_cfar(p, train=16, guard=2, pfa=1e-4)
    hits = np.where(np.asarray(det))[0]
    assert 1000 in hits and 3000 in hits
    assert len(hits) < 10


def test_burst_mask_and_segments(rng):
    bl = 32
    x = 0.1 * (rng.normal(size=64 * bl) + 1j * rng.normal(size=64 * bl)) \
        .astype(np.complex64)
    x[10 * bl : 14 * bl] += 1.0
    x[40 * bl : 41 * bl] += 1.0
    mask = np.asarray(detect.burst_mask(x, bl, noise_power=0.02, pfa=1e-6))
    segs = detect.mask_to_segments(mask)
    assert segs.shape[0] == 2
    assert segs[0].tolist() == [10 * bl, 14 * bl]
    assert segs[1].tolist() == [40 * bl, 41 * bl]


def test_energy_detect_length_validation():
    with pytest.raises(ValueError, match="divisible"):
        detect.energy_detect(np.ones(100, np.complex64), 33, 1.0)


# ---- cyclostationary feature detection ------------------------------------------


def _shaped_bpsk(rng, nsym, sps):
    from aether_primitives_tpu.ops import fir as fir_mod

    s = (1.0 - 2.0 * rng.integers(0, 2, nsym)).astype(np.complex64)
    up = np.zeros(nsym * sps, np.complex64)
    up[::sps] = s
    return np.asarray(fir_mod.fir_filter(up, fir_mod.rrc_taps(sps, span=6)))


def test_cyclo_detects_below_noise_floor(rng):
    from aether_primitives_tpu.models.detect import (
        cyclostationary_detect,
        energy_detect,
    )

    n_sym, sps = 32768, 4
    sig = _shaped_bpsk(rng, n_sym, sps)
    n = len(sig)
    snr = 10 ** (-5 / 10)  # -5 dB: signal buried in the noise
    sigma = np.sqrt(np.mean(np.abs(sig) ** 2) / snr / 2)
    noise = sigma * (rng.normal(size=n) + 1j * rng.normal(size=n))
    rx = (sig + noise).astype(np.complex64)

    stat, rate = cyclostationary_detect(rx)
    stat_noise, _ = cyclostationary_detect(noise.astype(np.complex64))
    assert float(stat) > 2.0 * float(stat_noise), (float(stat), float(stat_noise))
    assert abs(float(rate) - 1.0 / sps) < 1e-3
    # the energy detector cannot tell the two apart at matched total power
    p_rx = np.mean(np.abs(rx) ** 2)
    det_sig, _ = energy_detect(rx, 4096, noise_power=p_rx, pfa=1e-3)
    det_noi, _ = energy_detect(
        (noise * np.sqrt(p_rx / np.mean(np.abs(noise) ** 2))).astype(np.complex64),
        4096, noise_power=p_rx, pfa=1e-3,
    )
    assert np.asarray(det_sig).mean() <= np.asarray(det_noi).mean() + 0.1


def test_cyclo_statistic_batched(rng):
    from aether_primitives_tpu.models.detect import cyclostationary_detect

    sig = _shaped_bpsk(rng, 8192, 4)
    noise = (rng.normal(size=len(sig)) + 1j * rng.normal(size=len(sig))).astype(
        np.complex64
    )
    x = np.stack([sig + 0.3 * noise, noise])
    stat, rate = cyclostationary_detect(x)
    assert stat.shape == (2,)
    assert float(stat[0]) > 3.0 * float(stat[1])
    assert abs(float(rate[0]) - 0.25) < 1e-3

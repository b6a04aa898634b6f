"""Cross-ambiguity function: brute-force equivalence, joint delay/Doppler
recovery under noise, correlator degradation vs CAF recovery, and the
zero-Doppler row == correlate identity."""

import numpy as np
import pytest

from aether_primitives_tpu.models.caf import ambiguity, estimate_delay_doppler
from aether_primitives_tpu.ops import fir


def _brute_caf(x, ref, dopplers):
    n = x.size
    out = np.zeros((len(dopplers), n), np.complex64)
    for i, nu in enumerate(dopplers):
        xd = x * np.exp(-2j * np.pi * nu * np.arange(n))
        for tau in range(n):
            out[i, tau] = np.sum(xd * np.conj(np.roll(ref, tau)))
    return out


def test_ambiguity_matches_brute_force(rng):
    n = 64
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    ref = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    dops = np.array([-0.01, -0.003, 0.0, 0.004, 0.02], np.float32)
    got = np.asarray(ambiguity(x, ref, dops))
    want = _brute_caf(x, ref, dops)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-4


def test_zero_doppler_row_equals_correlate(rng):
    n = 256
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    ref = (rng.normal(size=64) + 1j * rng.normal(size=64)).astype(np.complex64)
    row = np.asarray(ambiguity(x, ref, [0.0]))[0]
    want = np.asarray(fir.correlate(x, ref))
    assert np.allclose(row, want, atol=1e-4 * np.abs(want).max())


def test_joint_delay_doppler_recovery(rng):
    n = 4096
    ref = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    tau0, nu0 = 137, 3.3e-4
    x = np.roll(ref, tau0) * np.exp(2j * np.pi * nu0 * np.arange(n))
    x = (x + 0.5 * (rng.normal(size=n) + 1j * rng.normal(size=n))).astype(
        np.complex64
    )
    delay, doppler, metric = estimate_delay_doppler(
        x, ref, max_doppler=1e-3, n_dopplers=33
    )
    # grid step = 2e-3/32 = 6.25e-5; interpolation should land much closer
    assert abs(float(delay) - tau0) < 0.5
    assert abs(float(doppler) - nu0) < 1.5e-5
    assert float(metric) > 0.3


def test_plain_correlator_fails_where_caf_succeeds(rng):
    # Doppler winds 3 full cycles over the signature: the circular
    # correlation peak nulls exactly, the CAF still finds it.
    n = 8192
    ref = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    tau0, nu0 = 400, 3.0 / 8192  # integer cycles -> circular corr nulls exactly
    x = np.roll(ref, tau0) * np.exp(2j * np.pi * nu0 * np.arange(n))
    x = (x + 1.0 * (rng.normal(size=n) + 1j * rng.normal(size=n))).astype(
        np.complex64
    )
    plain = np.abs(np.asarray(fir.correlate(x, ref)))
    assert int(np.argmax(plain)) != tau0  # coherence loss kills the peak
    delay, doppler, metric = estimate_delay_doppler(
        x, ref, max_doppler=1e-3, n_dopplers=65
    )
    assert abs(float(delay) - tau0) < 0.5
    assert abs(float(doppler) - nu0) < 1e-5


def test_noise_only_metric_low(rng):
    n = 2048
    ref = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    _, _, metric = estimate_delay_doppler(x, ref, max_doppler=1e-3, n_dopplers=33)
    assert float(metric) < 0.05


def test_ambiguity_rejects_bad_shapes(rng):
    x = (rng.normal(size=(2, 64))).astype(np.complex64)
    with pytest.raises(ValueError, match="flat"):
        ambiguity(x, x[0], [0.0])
    with pytest.raises(ValueError, match="longer"):
        ambiguity(np.zeros(32, np.complex64), np.zeros(64, np.complex64), [0.0])


def test_sharded_ambiguity_matches_single(rng, eight_devices):
    from aether_primitives_tpu.models.caf import (
        ambiguity,
        estimate_delay_doppler,
        sharded_ambiguity,
        sharded_estimate_delay_doppler,
    )
    from aether_primitives_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh({"time": 8})
    n = 2048
    ref = (rng.normal(size=256) + 1j * rng.normal(size=256)).astype(
        np.complex64
    )
    x = 0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(
        np.complex64
    )
    delay, nu_true = 700, 3.3e-3
    t = np.arange(256)
    x[delay : delay + 256] += ref * np.exp(2j * np.pi * nu_true * (t + delay))
    dops = np.linspace(-5e-3, 5e-3, 64).astype(np.float32)
    surf_s = np.asarray(sharded_ambiguity(x, ref, dops, mesh))
    surf_1 = np.asarray(ambiguity(x, ref, dops))
    assert surf_s.shape == surf_1.shape
    # per-row math never crosses shards; only FFT batch-size-dependent
    # rounding may differ -> relative RMS at f32 noise level
    err = np.sqrt(np.mean(np.abs(surf_s - surf_1) ** 2)
                  / np.mean(np.abs(surf_1) ** 2))
    assert err < 1e-5, err
    # and the sharded full estimator agrees with the single-device one
    d_s, nu_s, m_s = (np.asarray(v) for v in
                      sharded_estimate_delay_doppler(x, ref, 5e-3, mesh))
    d_1, nu_1, m_1 = (np.asarray(v) for v in
                      estimate_delay_doppler(x, ref, 5e-3))
    assert abs(d_s - d_1) < 1e-3 and abs(nu_s - nu_1) < 1e-9
    assert abs(m_s - m_1) < 1e-6
    assert abs(d_s - delay) < 1.0 and abs(nu_s - nu_true) < 2e-4
    with pytest.raises(ValueError, match="divide"):
        sharded_ambiguity(x, ref, dops[:63], mesh)

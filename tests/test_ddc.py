"""DDC/DUC model tests: f64 compositional goldens (mix -> filter ->
decimate), polyphase-vs-zero-stuff equality, streaming state equality, and
the DUC -> DDC loopback."""

import numpy as np
import pytest

from aether_primitives_tpu.evm import evm_rms_db
from aether_primitives_tpu.models.ddc import Ddc, DdcConfig, Duc, DucConfig
from aether_primitives_tpu.ops import fir


def rand_c(rng, n):
    return (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)


def test_ddc_matches_composed_golden(rng):
    f, dec = 0.1375, 4
    x = rand_c(rng, 8192)
    ddc = Ddc(DdcConfig(freq=f, decimation=dec))
    got = np.asarray(ddc.step(x))
    n = np.arange(x.size)
    mixed = x.astype(np.complex128) * np.exp(-2j * np.pi * f * n)
    filt = np.convolve(mixed, ddc.taps.astype(np.complex128))[: x.size]
    gold = filt[::dec]
    assert got.shape == gold.shape
    assert evm_rms_db(got, gold) < -100


def test_ddc_extracts_channel_tone():
    # a tone at the DDC center comes out as (near-)DC at the low rate; a
    # tone one output-Nyquist away is crushed by the channel filter
    n = 1 << 14
    t = np.arange(n)
    f0 = 0.2  # channel center
    dec = 8
    sig = (
        np.exp(2j * np.pi * f0 * t)
        + np.exp(2j * np.pi * (f0 + 1.3 / dec) * t)  # out-of-channel
    ).astype(np.complex64)
    y = np.asarray(Ddc(DdcConfig(freq=f0, decimation=dec)).step(sig))
    spec = np.abs(np.fft.fft(y[256:2304]))
    assert spec.argmax() == 0  # in-channel tone lands at DC
    # out-of-channel tone aliases to |f| = 0.3 at the low rate -> bin 0.3*N
    leak = spec[int(0.3 * 2048) - 4 : int(0.3 * 2048) + 5].max()
    assert 20 * np.log10(leak / spec[0]) < -40


def test_ddc_streaming_equals_single_shot(rng):
    f, dec = -0.043, 4
    x = rand_c(rng, 16384)
    whole = np.asarray(Ddc(DdcConfig(freq=f, decimation=dec)).step(x))
    ddc = Ddc(DdcConfig(freq=f, decimation=dec))
    parts = [np.asarray(ddc.step(x[i : i + 4096])) for i in range(0, 16384, 4096)]
    stitched = np.concatenate(parts)
    assert evm_rms_db(stitched, whole.astype(np.complex128)) < -115


def test_duc_matches_zero_stuff_golden(rng):
    ell, f = 4, 0.22
    x = rand_c(rng, 2048)
    duc = Duc(DucConfig(freq=f, interpolation=ell))
    got = np.asarray(duc.step(x))
    up = np.zeros(x.size * ell, np.complex128)
    up[::ell] = x
    filt = np.convolve(up, duc.taps.astype(np.complex128))[: up.size]
    n = np.arange(up.size)
    gold = filt * np.exp(2j * np.pi * f * n)
    assert got.shape == gold.shape
    assert evm_rms_db(got, gold) < -100


def test_duc_streaming_equals_single_shot(rng):
    ell, f = 3, 0.11
    x = rand_c(rng, 6144)
    whole = np.asarray(Duc(DucConfig(freq=f, interpolation=ell)).step(x))
    duc = Duc(DucConfig(freq=f, interpolation=ell))
    parts = [np.asarray(duc.step(x[i : i + 2048])) for i in range(0, 6144, 2048)]
    assert evm_rms_db(np.concatenate(parts), whole.astype(np.complex128)) < -110


def test_duc_ddc_loopback_recovers_baseband(rng):
    # up to a carrier, back down at the same carrier: the cascade is the
    # two lowpasses back-to-back — a delayed copy of the baseband
    ell, f = 4, 0.31
    x = rand_c(rng, 4096)
    # keep x in-band for the interpolation filter: use a lowpassed signal
    x = np.asarray(fir.fir_filter(x, Ddc(DdcConfig(decimation=ell)).taps))
    tx = np.asarray(Duc(DucConfig(freq=f, interpolation=ell)).step(x))
    rx = np.asarray(Ddc(DdcConfig(freq=f, decimation=ell)).step(tx))
    # combined group delay: (K_duc-1)/2 at high rate + (K_ddc-1)/2 at high
    # rate, expressed at the low rate
    k = 16 * ell + 1
    d = (k - 1) // ell  # (k-1)/2 + (k-1)/2 high-rate samples, / ell
    err = rx[d + 8 : 3000] - x[8 : 3000 - d]
    rel = np.sqrt(np.mean(np.abs(err) ** 2) / np.mean(np.abs(x) ** 2))
    assert rel < 0.02  # two Hamming-sinc filters' passband ripple


def test_ddc_decimation_one_is_pure_mixer(rng):
    x = rand_c(rng, 1024)
    y = np.asarray(Ddc(DdcConfig(freq=0.05, decimation=1)).step(x))
    gold = x.astype(np.complex128) * np.exp(-2j * np.pi * 0.05 * np.arange(1024))
    assert evm_rms_db(y, gold) < -100


def test_sharded_ddc_matches_single_device(rng, eight_devices):
    import jax
    from aether_primitives_tpu.models.ddc import sharded_ddc

    mesh = jax.sharding.Mesh(np.array(eight_devices), ("time",))
    f, dec = 0.173, 4
    x = rand_c(rng, 8 * 4096)
    cfg = DdcConfig(freq=f, decimation=dec)
    single = np.asarray(Ddc(cfg).step(x))
    sharded = np.asarray(jax.jit(
        lambda v: sharded_ddc(v, cfg, mesh)
    )(x))
    assert sharded.shape == single.shape
    assert evm_rms_db(sharded, single.astype(np.complex128)) < -110


def test_sharded_ddc_rejects_bad_lengths(rng, eight_devices):
    import jax
    from aether_primitives_tpu.models.ddc import sharded_ddc

    mesh = jax.sharding.Mesh(np.array(eight_devices), ("time",))
    with pytest.raises(ValueError, match="divisible"):
        sharded_ddc(rand_c(rng, 8 * 4098), DdcConfig(decimation=4), mesh)


def test_ddc_bank_matches_per_channel(rng):
    from aether_primitives_tpu.models.ddc import ddc_bank

    x = rand_c(rng, 8192)
    freqs = [-0.2, 0.05, 0.31]
    bank = np.asarray(ddc_bank(x, freqs, 4))
    assert bank.shape == (3, 2048)
    for i, f in enumerate(freqs):
        single = np.asarray(Ddc(DdcConfig(freq=f, decimation=4)).step(x))
        assert evm_rms_db(bank[i], single.astype(np.complex128)) < -110, f


def test_sharded_duc_matches_single_device(rng, eight_devices):
    import jax
    from aether_primitives_tpu.models.ddc import sharded_duc

    mesh = jax.sharding.Mesh(np.array(eight_devices), ("time",))
    f, ell = 0.27, 4
    x = rand_c(rng, 8 * 1024)
    cfg = DucConfig(freq=f, interpolation=ell)
    single = np.asarray(Duc(cfg).step(x))
    sharded = np.asarray(jax.jit(lambda v: sharded_duc(v, cfg, mesh))(x))
    assert sharded.shape == single.shape
    assert evm_rms_db(sharded, single.astype(np.complex128)) < -110

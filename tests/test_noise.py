"""AWGN tests: determinism by seed, power statistics, single-scale
convention (reference src/noise.rs + SURVEY.md §2 quirk 2)."""

import numpy as np

from aether_primitives_tpu.ops import noise


def test_deterministic_by_seed():
    a = np.asarray(noise.new(1.0, 815).fill(1024))
    b = np.asarray(noise.new(1.0, 815).fill(1024))
    assert (a == b).all()
    c = np.asarray(noise.new(1.0, 816).fill(1024))
    assert not (a == c).all()


def test_call_sequence_advances_stream():
    g = noise.new(1.0, 815)
    a = np.asarray(g.fill(128))
    b = np.asarray(g.fill(128))
    assert not (a == b).all()


def test_component_std_is_sqrt_power():
    for power in (1.0, 0.25, 4.0):
        x = np.asarray(noise.new(power, 7).fill(200_000))
        assert abs(x.real.std() - np.sqrt(power)) < 0.02 * np.sqrt(power)
        assert abs(x.imag.std() - np.sqrt(power)) < 0.02 * np.sqrt(power)
        assert abs(x.real.mean()) < 0.01 * np.sqrt(power) + 1e-3


def test_apply_single_scale():
    # added noise std must be sqrt(power), NOT power (the reference's apply
    # double-scales; we deliberately do not — module docstring)
    power = 0.25
    sig = np.zeros(200_000, np.complex64)
    out = np.asarray(noise.new(power, 3).apply(sig))
    assert abs(out.real.std() - 0.5) < 0.01


def test_set_power():
    g = noise.generator()
    assert g.power == 1.0
    g.set_power(0.01)
    x = np.asarray(g.fill(100_000))
    assert abs(x.real.std() - 0.1) < 0.005


def test_default_generator_seed():
    assert noise.DEFAULT_RNG_SEED == 815
    a = np.asarray(noise.generator().fill(64))
    b = np.asarray(noise.new(1.0, 815).fill(64))
    assert (a == b).all()


def test_pure_function_form():
    import jax

    key = jax.random.key(0)
    a = np.asarray(noise.awgn(key, (64,), 1.0))
    b = np.asarray(noise.awgn(key, (64,), 1.0))
    assert (a == b).all()
    sig = np.ones(64, np.complex64)
    out = np.asarray(noise.apply(key, sig, 1.0))
    assert np.allclose(out - sig, np.asarray(noise.awgn(key, (64,), 1.0)))

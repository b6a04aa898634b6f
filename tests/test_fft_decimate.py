"""Fused decimating FFT tests: mm_fft_decimate(x, d) == fft(x[::d])."""

import jax.numpy as jnp
import numpy as np
import pytest

from aether_primitives_tpu.evm import evm_rms_db
from aether_primitives_tpu.ops.fft import (
    Scale,
    fft_of_decimated,
    mm_fft,
    mm_fft_decimate,
)


def rand_c(rng, shape):
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64)


@pytest.mark.parametrize("n,dec", [(2048, 4), (2048, 2), (512, 4), (1024, 8), (256, 4)])
def test_decimating_fft_matches_slice_then_fft(n, dec):
    rng = np.random.default_rng(n * dec)
    x = rand_c(rng, (3, n * dec))
    got = np.asarray(mm_fft_decimate(jnp.asarray(x), dec))
    ref = np.fft.fft(x[..., ::dec].astype(np.complex128), axis=-1)
    assert evm_rms_db(got, ref) < -115


def test_dec1_is_plain_fft():
    rng = np.random.default_rng(0)
    x = rand_c(rng, (64,))
    a = np.asarray(mm_fft_decimate(jnp.asarray(x), 1))
    b = np.asarray(mm_fft(jnp.asarray(x), -1))
    assert (a == b).all()


def test_fallback_path():
    # n2*dec > 256 forces the slice-then-fft fallback
    rng = np.random.default_rng(1)
    x = rand_c(rng, (2, 127 * 64))  # n=127 prime -> fallback
    got = np.asarray(mm_fft_decimate(jnp.asarray(x), 64))
    ref = np.fft.fft(x[..., ::64].astype(np.complex128), axis=-1)
    assert evm_rms_db(got, ref) < -115


def test_indivisible_raises():
    with pytest.raises(ValueError, match="divisible"):
        mm_fft_decimate(jnp.zeros(100, jnp.complex64), 3)


@pytest.mark.parametrize("backend", ["matmul", "xla"])
def test_fft_of_decimated_with_scale(backend):
    rng = np.random.default_rng(2)
    x = rand_c(rng, (4, 8192))
    got = np.asarray(fft_of_decimated(jnp.asarray(x), 4, Scale.SN, backend))
    ref = np.fft.fft(x[..., ::4].astype(np.complex128), axis=-1) / np.sqrt(
        np.float32(2048)
    )
    assert evm_rms_db(got, ref) < -110

"""Native host-extension tests: compiled path vs numpy fallback equality."""

import numpy as np
import pytest

from aether_primitives_tpu import native, split


def test_extension_builds_and_loads():
    # g++ is part of the supported toolchain; if the build genuinely cannot
    # run the other tests still exercise the fallback, but we want to know.
    assert native.available(), "native host extension failed to build/load"


def test_deinterleave_interleave_roundtrip(rng):
    x = (rng.normal(size=100_000) + 1j * rng.normal(size=100_000)).astype(np.complex64)
    re, im = native.deinterleave(x)
    assert (re == x.real).all() and (im == x.imag).all()
    back = native.interleave(re, im)
    assert (back == x).all()


def test_deinterleave_2d(rng):
    x = (rng.normal(size=(32, 64)) + 1j * rng.normal(size=(32, 64))).astype(np.complex64)
    re, im = native.deinterleave(x)
    assert re.shape == (32, 64)
    assert (re == x.real).all() and (im == x.imag).all()


def test_split_uses_native_for_large_blocks(rng):
    x = (rng.normal(size=1 << 17) + 1j * rng.normal(size=1 << 17)).astype(np.complex64)
    s = split(x)
    assert (s.re == x.real).all() and (s.im == x.imag).all()
    assert (s.numpy() == x).all()


def test_peak(rng):
    x = (0.01 * (rng.normal(size=4096) + 1j * rng.normal(size=4096))).astype(np.complex64)
    x[1234] = 3 + 4j
    idx, mag2 = native.peak(x)
    assert idx == 1234
    assert abs(mag2 - 25.0) < 1e-4


def test_pack_unpack_bits(rng):
    bits = rng.integers(0, 2, 1003).astype(np.uint8)
    packed = native.pack_bits(bits)
    assert packed.size == (1003 + 7) // 8
    # LSB-first: first byte holds bits[0..7] with bit 0 in the LSB
    assert packed[0] == sum(int(bits[i]) << i for i in range(8))
    back = native.unpack_bits(packed, 1003)
    assert (back == bits).all()

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


def test_block_feeder_roundtrip(rng, tmp_path):
    from aether_primitives_tpu.utils import file as file_mod

    x = (rng.normal(size=10000) + 1j * rng.normal(size=10000)).astype(
        np.complex64
    )
    p = tmp_path / "cap.bin"
    file_mod.save(p, x)
    # 10000 = 3 full 4096-blocks? no: 2*4096=8192, final partial 1808
    blocks = list(file_mod.stream_blocks(p, 4096, depth=3))
    assert [b[0].size for b in blocks] == [4096, 4096, 1808]
    re = np.concatenate([b[0] for b in blocks])
    im = np.concatenate([b[1] for b in blocks])
    assert (re == x.real).all() and (im == x.imag).all()


def test_block_feeder_exact_multiple(rng, tmp_path):
    from aether_primitives_tpu.utils import file as file_mod

    x = (rng.normal(size=2048) + 1j * rng.normal(size=2048)).astype(
        np.complex64
    )
    p = tmp_path / "cap2.bin"
    file_mod.save(p, x)
    with file_mod.stream_blocks(p, 1024, depth=2) as f:
        blocks = list(f)
    assert [b[0].size for b in blocks] == [1024, 1024]
    assert (np.concatenate([b[0] for b in blocks]) == x.real).all()


def test_block_feeder_numpy_fallback(rng, tmp_path, monkeypatch):
    from aether_primitives_tpu.utils import file as file_mod

    monkeypatch.setattr(native, "_load", lambda: None)
    x = (rng.normal(size=5000) + 1j * rng.normal(size=5000)).astype(
        np.complex64
    )
    p = tmp_path / "cap3.bin"
    file_mod.save(p, x)
    blocks = list(file_mod.stream_blocks(p, 2048))
    assert [b[0].size for b in blocks] == [2048, 2048, 904]
    assert (np.concatenate([b[1] for b in blocks]) == x.imag).all()


def test_block_feeder_missing_file(tmp_path):
    from aether_primitives_tpu.utils import file as file_mod

    with pytest.raises(FileNotFoundError):
        file_mod.stream_blocks(tmp_path / "nope.bin", 1024)

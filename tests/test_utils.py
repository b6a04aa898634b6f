"""util tests: dB conversion (reference src/util/mod.rs) and sample file I/O
(reference src/util/file.rs tests, /tmp-backed)."""

import numpy as np
import pytest

from aether_primitives_tpu.utils import DB, file as f
from aether_primitives_tpu.utils.db import from_db, to_db


def test_db_doc_example():
    # reference doctest: ratio 100 -> 20 dB
    db = DB.from_ratio(100)
    assert db.ratio() == pytest.approx(100.0)
    assert db.db() == pytest.approx(20.0)


def test_db_to_ratio():
    assert DB(30.0).ratio() == pytest.approx(1000.0)
    assert DB(0.0).ratio() == pytest.approx(1.0)


def test_ratio_to_db():
    assert DB.from_ratio(100.0).db() == pytest.approx(20.0)
    assert DB.from_ratio(1 / 10).db() == pytest.approx(-10.0)


def test_vectorized_db():
    assert np.allclose(to_db(np.array([1.0, 10.0, 100.0])), [0.0, 10.0, 20.0])
    assert np.allclose(from_db(np.array([0.0, 10.0])), [1.0, 10.0])


def test_binary_writer_and_reader(tmp_path):
    # mirrors the reference's binary roundtrip test (src/util/file.rs:131-170)
    p = tmp_path / "aether_primitives_binary_test.bin"
    seq = (np.arange(200) + 1j * np.arange(200)).astype(np.complex64)
    with f.binary_writer(p) as w:
        w.write(seq)
    assert p.stat().st_size == 200 * 8  # two f32 per sample
    assert f.count_structs_in_file(p) == 200
    with f.binary_reader(p) as r:
        back = r.read(200)
    assert (back == seq).all()


def test_binary_reader_partial_and_eof(tmp_path):
    p = tmp_path / "x.bin"
    seq = np.arange(10).astype(np.complex64)
    f.save(p, seq)
    with f.binary_reader(p) as r:
        first = r.read(4)
        assert (first == seq[:4]).all()
        rest = r.read(6)
        assert (rest == seq[4:]).all()
        with pytest.raises(EOFError):
            r.read(1)


def test_count_structs_rejects_remainder(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"\x00" * 13)
    with pytest.raises(ValueError, match="integer number"):
        f.count_structs_in_file(p)


def test_interleaved_layout_is_reference_repr_c(tmp_path):
    # the repr(C) contract: back-to-back (re, im) f32 pairs, native order
    p = tmp_path / "layout.bin"
    data = np.array([1 + 2j, 3 + 4j], np.complex64)
    f.save(p, data)
    raw = np.fromfile(p, dtype=np.float32)
    assert (raw == [1, 2, 3, 4]).all()


def test_mmap_load(tmp_path):
    p = tmp_path / "m.bin"
    data = (np.arange(64) * (1 - 1j)).astype(np.complex64)
    f.save(p, data)
    m = f.load(p, mmap=True)
    assert (np.asarray(m) == data).all()


def test_csv_roundtrip(tmp_path):
    # mirrors the reference csv roundtrip (src/util/file.rs:175-215)
    p = tmp_path / "aether_primitives_csv_test.csv"
    seq = (np.arange(200) + 1j * np.arange(200)).astype(np.complex64)
    with f.csv_writer(p) as w:
        w.write(seq)
    back = f.csv_reader(p)
    assert len(back) == 200
    assert (back == seq).all()


def test_iq_formats_roundtrip(tmp_path):
    from aether_primitives_tpu.utils.file import load_iq, save_iq

    rng = np.random.default_rng(0)
    x = (0.5 * (rng.normal(size=256) + 1j * rng.normal(size=256))).astype(np.complex64)
    x = np.clip(x.real, -1, 1) + 1j * np.clip(x.imag, -1, 1)
    for fmt, tol in (("sc16", 1e-4), ("sc8", 1e-2), ("u8", 1e-2)):
        p = tmp_path / f"cap.{fmt}"
        save_iq(p, x, fmt)
        back = load_iq(p, fmt)
        assert back.dtype == np.complex64 and len(back) == 256
        assert np.abs(back - x).max() < tol, fmt


def test_iq_unknown_format(tmp_path):
    from aether_primitives_tpu.utils.file import load_iq, save_iq

    with pytest.raises(ValueError, match="unknown IQ format"):
        save_iq(tmp_path / "x", np.zeros(4, np.complex64), "sc32")
    p = tmp_path / "c.sc16"
    save_iq(p, np.zeros(4, np.complex64), "sc16")
    with pytest.raises(ValueError, match="unknown IQ format"):
        load_iq(p, "nope")


# ---- SigMF ----------------------------------------------------------------------


def test_sigmf_roundtrip_cf32(tmp_path, rng):
    from aether_primitives_tpu.utils import file as fio

    x = (rng.normal(size=512) + 1j * rng.normal(size=512)).astype(np.complex64)
    base = fio.save_sigmf(
        tmp_path / "cap", x, sample_rate=1e6, frequency=100e6,
        description="test", annotations=[{"core:sample_start": 0,
                                          "core:sample_count": 512,
                                          "core:label": "burst"}],
    )
    got, meta = fio.load_sigmf(base)
    assert (got == x).all()
    assert meta["global"]["core:sample_rate"] == 1e6
    assert meta["captures"][0]["core:frequency"] == 100e6
    assert meta["annotations"][0]["core:label"] == "burst"
    # the data file is the plain interleaved-f32 format (Rust-compatible)
    raw = fio.load(str(tmp_path / "cap.sigmf-data"))
    assert (raw == x).all()


def test_sigmf_roundtrip_ci16(tmp_path, rng):
    from aether_primitives_tpu.utils import file as fio

    x = (rng.normal(size=256) + 1j * rng.normal(size=256)).astype(np.complex64)
    x = (0.9 * x / np.abs(np.stack([x.real, x.imag])).max()).astype(np.complex64)
    base = fio.save_sigmf(tmp_path / "c16", x, sample_rate=2e6,
                          datatype="ci16_le")
    got, meta = fio.load_sigmf(base)
    assert meta["global"]["core:datatype"] == "ci16_le"
    assert np.abs(np.asarray(got) - x).max() < 2e-4  # 16-bit quantization


def test_sigmf_rejects_unknown_datatype(tmp_path):
    from aether_primitives_tpu.utils import file as fio

    with pytest.raises(ValueError, match="datatype"):
        fio.save_sigmf(tmp_path / "x", np.zeros(4, np.complex64), 1e6,
                       datatype="cf64_be")


def test_wav_roundtrip_mono_and_stereo(tmp_path, rng):
    from aether_primitives_tpu.utils import file as fio

    mono = np.sin(2 * np.pi * 0.01 * np.arange(2000)).astype(np.float32)
    fio.save_wav(tmp_path / "m.wav", mono, 8000)
    got, rate = fio.load_wav(tmp_path / "m.wav")
    assert rate == 8000 and got.shape == (2000,)
    scale = 0.9 / np.abs(mono).max()
    assert np.abs(got - mono * scale).max() < 2e-4

    stereo = np.stack([mono, -mono])
    fio.save_wav(tmp_path / "s.wav", stereo, 44100, normalize=False)
    got2, rate2 = fio.load_wav(tmp_path / "s.wav")
    assert rate2 == 44100 and got2.shape == (2, 2000)
    assert np.abs(got2[0] - mono).max() < 2e-4
    assert np.abs(got2[1] + mono).max() < 2e-4


def test_wav_validation(tmp_path):
    from aether_primitives_tpu.utils import file as fio

    with pytest.raises(ValueError, match="channels"):
        fio.save_wav(tmp_path / "x.wav", np.zeros((2, 2, 2)), 8000)

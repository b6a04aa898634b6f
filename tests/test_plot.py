"""Plot rendering smoke tests (file output; compute cores are tested via
the channelizer/fft tests — here we check the figures render and save)."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from aether_primitives_tpu.utils import plot


@pytest.fixture
def sig(rng):
    return (rng.normal(size=512) + 1j * rng.normal(size=512)).astype(np.complex64)


def test_constellation(sig, tmp_path):
    p = tmp_path / "c.png"
    plot.constellation(sig, "2048 Noise Values", str(p))
    assert p.stat().st_size > 0


def test_waterfall(sig, tmp_path):
    p = tmp_path / "w.png"
    plot.waterfall(sig, 128, True, "waterfall", str(p))
    assert p.stat().st_size > 0


def test_spectrum(sig, tmp_path):
    p = tmp_path / "s.png"
    plot.spectrum(sig, 256, False, "spectrum", str(p))
    assert p.stat().st_size > 0


def test_time(sig, tmp_path):
    p = tmp_path / "t.png"
    plot.time(sig[:200], "200 Noise Values", str(p))
    assert p.stat().st_size > 0


def test_compare(sig, tmp_path):
    p = tmp_path / "cmp.png"
    plot.compare(sig[:200], sig[200:400], "200 Noise Values", str(p))
    assert p.stat().st_size > 0


def test_compare_length_mismatch(sig):
    with pytest.raises(ValueError, match="equal length"):
        plot.compare(sig[:10], sig[:20], "x")


def test_psd_plot_saves(tmp_path, rng):
    x = (rng.normal(size=8192) + 1j * rng.normal(size=8192)).astype(np.complex64)
    out = tmp_path / "psd.png"
    plot.psd(x, 512, "psd", file=str(out))
    assert out.stat().st_size > 0


def test_ambiguity_surface_saves(tmp_path, rng):
    from aether_primitives_tpu.utils import plot

    ref = (rng.normal(size=512) + 1j * rng.normal(size=512)).astype(np.complex64)
    x = np.roll(ref, 100).astype(np.complex64)
    out = tmp_path / "caf.png"
    plot.ambiguity_surface(x, ref, max_doppler=1e-3, n_dopplers=16,
                           file=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_eye_saves(tmp_path, rng):
    from aether_primitives_tpu.ops import fir as fir_mod, modulation

    bits = rng.integers(0, 2, 400 * 2).astype(np.uint8)
    syms = np.asarray(modulation.qpsk().modulate(bits))
    up = np.zeros(400 * 4, np.complex64)
    up[::4] = syms
    shaped = np.asarray(fir_mod.fir_filter(up, fir_mod.rrc_taps(4, span=8)))
    p = tmp_path / "eye.png"
    plot.eye(shaped, sps=4, n_traces=100, file=str(p))
    assert p.stat().st_size > 0


def test_eye_too_short():
    with pytest.raises(ValueError, match="too short"):
        plot.eye(np.zeros(4, np.complex64), sps=4)


def test_doa_spectrum_plot(tmp_path):
    from aether_primitives_tpu.models import doa

    rng = np.random.default_rng(9)
    x = (rng.normal(size=(8, 128)) + 1j * rng.normal(size=(8, 128))).astype(
        np.complex64
    )
    ang, spec = doa.music_spectrum(doa.covariance(x), 2)
    out = tmp_path / "doa.png"
    plot.doa_spectrum(ang, spec, "doa", estimates=[0.1], file=str(out))
    assert out.stat().st_size > 1000

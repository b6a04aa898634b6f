"""Sequence generation tests (reference src/sequence.rs doc examples and
unit test) plus equality of the three generation tiers."""

import numpy as np

from aether_primitives_tpu.ops import sequence


def test_expand_doc_example():
    # reference doctest: seed 1+4+16 -> bits 1,0,1,0,1 then zeros, len 32
    out = sequence.expand(1 + 4 + 16, 32)
    expect = np.zeros(32, np.uint8)
    expect[:5] = [1, 0, 1, 0, 1]
    assert (out == expect).all()
    assert len(out) == 32


def test_simple_sequence():
    # reference unit test: gen = s[n-1]+s[n-2] mod 2, seed [1,0], len 6
    gen = lambda n, s: (s[n - 1] + s[n - 2]) % 2
    out = sequence.generate([1, 0], gen, 6)
    assert (out == np.array([1, 0, 1, 1, 0, 1], np.uint8)).all()


def test_lte_x1_doc_example():
    # reference doctest: LTE TS36.211 7.2 x1 over 1600 elements
    gen = lambda n, s: (s[n - 28] + s[n - 31]) % 2
    init = sequence.expand(1, 31)
    ref = sequence.generate(init, gen, 1600)
    assert len(ref) == 1600

    scan = np.asarray(sequence.lfsr_generate(init, (28, 31), 1600))
    assert (scan == ref).all()

    fast = np.asarray(sequence.lfsr_matrix_generate(init, (28, 31), 1600))
    assert (fast == ref).all()


def test_lfsr_matrix_block_sizes():
    init = sequence.expand(0b1011, 4)  # x(n) = x(n-3) + x(n-4)
    ref = np.asarray(sequence.lfsr_generate(init, (3, 4), 257))
    for block in (7, 64, 300):
        fast = np.asarray(sequence.lfsr_matrix_generate(init, (3, 4), 257, block=block))
        assert (fast == ref).all(), f"block={block}"


def test_lfsr_short_request():
    init = sequence.expand(1, 31)
    out = np.asarray(sequence.lfsr_generate(init, (28, 31), 10))
    assert (out == init[:10]).all()


def test_generate_already_long_enough():
    out = sequence.generate([1, 0, 1], lambda n, s: 0, 2)
    assert (out == np.array([1, 0, 1], np.uint8)).all()


def test_lte_gold_against_serial_reference():
    # serial closure implementation of TS36.211 7.2 as the golden
    from aether_primitives_tpu.ops.sequence import expand, generate, lte_gold

    c_init = 0x1A2B3
    nc, length = 1600, 256
    g1 = lambda n, s: (s[n - 28] + s[n - 31]) % 2
    g2 = lambda n, s: (s[n - 28] + s[n - 29] + s[n - 30] + s[n - 31]) % 2
    x1 = generate(expand(1, 31), g1, nc + length)
    x2 = generate(expand(c_init, 31), g2, nc + length)
    gold = (x1[nc:] + x2[nc:]) % 2

    got = np.asarray(lte_gold(c_init, length))
    assert (got == gold).all()


def test_lte_gold_differs_by_seed():
    from aether_primitives_tpu.ops.sequence import lte_gold

    a = np.asarray(lte_gold(1, 128))
    b = np.asarray(lte_gold(2, 128))
    assert not (a == b).all()


# ---- DSSS spreading ----------------------------------------------------------


def test_dsss_roundtrip_and_processing_gain(rng):
    from aether_primitives_tpu.ops import modulation

    code = np.asarray(sequence.bits_to_chips(sequence.lte_gold(0x123, 63)))
    bits = rng.integers(0, 2, 2 * 256).astype(np.uint8)
    syms = np.asarray(modulation.qpsk().modulate(bits))
    tx = np.asarray(sequence.dsss_spread(syms, code))
    assert tx.shape == (256 * 63,)
    # clean roundtrip is exact to rounding
    back = np.asarray(sequence.dsss_despread(tx, code))
    assert np.abs(back - syms).max() < 1e-5
    # -6 dB per-chip SNR: raw chips are garbage, despread symbols are clean
    sigma = 2.0
    noisy = tx + sigma / np.sqrt(2) * (
        rng.normal(size=tx.size) + 1j * rng.normal(size=tx.size)
    )
    got = np.asarray(modulation.qpsk().demod(
        np.asarray(sequence.dsss_despread(noisy.astype(np.complex64), code))
    ))
    assert (got == bits).all()  # 63-chip gain ~ 18 dB


def test_dsss_two_user_cdma_separation(rng):
    from aether_primitives_tpu.ops import modulation

    c1 = np.asarray(sequence.bits_to_chips(sequence.lte_gold(0x111, 127)))
    c2 = np.asarray(sequence.bits_to_chips(sequence.lte_gold(0x7E2, 127)))
    qpsk = modulation.qpsk()
    b1 = rng.integers(0, 2, 2 * 128).astype(np.uint8)
    b2 = rng.integers(0, 2, 2 * 128).astype(np.uint8)
    s1 = np.asarray(qpsk.modulate(b1))
    s2 = np.asarray(qpsk.modulate(b2))
    air = np.asarray(sequence.dsss_spread(s1, c1)) + np.asarray(
        sequence.dsss_spread(s2, c2)
    )
    got1 = np.asarray(qpsk.demod(np.asarray(sequence.dsss_despread(air, c1))))
    got2 = np.asarray(qpsk.demod(np.asarray(sequence.dsss_despread(air, c2))))
    assert (got1 == b1).all()
    assert (got2 == b2).all()


# ------------------------------------------------- scramblers


def _scramble_serial(bits, delays, init):
    """Independent bit-serial multiplicative scrambler."""
    order = max(delays)
    hist = list(init) if init is not None else [0] * order
    out = []
    for x in bits:
        y = int(x)
        for d in delays:
            y ^= hist[-d]
        out.append(y)
        hist.append(y)
        hist.pop(0)
    return np.array(out, np.uint8)


def test_scramble_matches_bit_serial(rng):
    bits = rng.integers(0, 2, 1000).astype(np.uint8)
    init = rng.integers(0, 2, 15).astype(np.uint8)
    got = np.asarray(sequence.scramble_multiplicative(bits, (14, 15), init))
    assert (got == _scramble_serial(bits, (14, 15), init)).all()


def test_scramble_block_size_invariance(rng):
    bits = rng.integers(0, 2, 517).astype(np.uint8)
    a = np.asarray(sequence.scramble_multiplicative(bits, (14, 15), block=32))
    b = np.asarray(sequence.scramble_multiplicative(bits, (14, 15), block=256))
    assert (a == b).all()


def test_scramble_descramble_roundtrip(rng):
    bits = rng.integers(0, 2, 800).astype(np.uint8)
    init = rng.integers(0, 2, 15).astype(np.uint8)
    line = sequence.scramble_multiplicative(bits, (14, 15), init)
    back = np.asarray(sequence.descramble_multiplicative(line, (14, 15), init))
    assert (back == bits).all()


def test_descrambler_self_synchronizes(rng):
    # wrong init history corrupts at most the first max(delays) bits
    bits = rng.integers(0, 2, 400).astype(np.uint8)
    init = rng.integers(0, 2, 15).astype(np.uint8)
    line = sequence.scramble_multiplicative(bits, (14, 15), init)
    back = np.asarray(sequence.descramble_multiplicative(line, (14, 15), None))
    assert (back[15:] == bits[15:]).all()


def test_scrambler_error_multiplication(rng):
    # one line-bit error -> exactly 1 + len(delays) payload errors
    bits = rng.integers(0, 2, 400).astype(np.uint8)
    line = np.array(sequence.scramble_multiplicative(bits, (14, 15)))
    line[100] ^= 1
    back = np.asarray(sequence.descramble_multiplicative(line, (14, 15)))
    errs = np.where(back != bits)[0]
    assert errs.tolist() == [100, 114, 115]


def test_scramble_additive_self_inverse(rng):
    bits = rng.integers(0, 2, 256).astype(np.uint8)
    pn = sequence.lte_gold(0x5A5, 256)
    line = sequence.scramble_additive(bits, pn)
    assert (np.asarray(sequence.scramble_additive(line, pn)) == bits).all()


# ------------------------------------------------- Zadoff-Chu


def test_zadoff_chu_cazac_properties():
    for u, ell in ((25, 839), (5, 63)):
        x = sequence.zadoff_chu(u, ell)
        assert np.allclose(np.abs(x), 1.0, atol=1e-6)  # constant amplitude
        # zero autocorrelation at all nonzero cyclic lags
        spec = np.fft.fft(x)
        acorr = np.fft.ifft(spec * np.conj(spec)).real
        assert acorr[0] > ell - 1e-2
        assert np.abs(acorr[1:]).max() < 1e-2


def test_zadoff_chu_cross_correlation_and_validation():
    import pytest as _pytest

    a = sequence.zadoff_chu(25, 839)
    b = sequence.zadoff_chu(29, 839)
    xc = np.abs(np.fft.ifft(np.fft.fft(a) * np.conj(np.fft.fft(b))))
    assert np.allclose(xc, np.sqrt(839), rtol=1e-3)  # flat sqrt(L) floor
    # cyclic shifts of one root are orthogonal at lag 0
    s = sequence.zadoff_chu(25, 839, shift=7)
    assert abs(np.vdot(a, s)) < 1e-2
    with _pytest.raises(ValueError, match="odd"):
        sequence.zadoff_chu(3, 64)
    with _pytest.raises(ValueError, match="coprime"):
        sequence.zadoff_chu(7, 63)


def test_gps_ca_codes_standard_properties():
    """IS-GPS-200 C/A codes: every PRN's first 10 chips match the
    standard's published octal (the generator self-verifies this), codes
    are balanced (512 ones / 511 zeros), and cross-correlations take the
    Gold three-valued set {-65, -1, 63}/1023."""
    from aether_primitives_tpu.ops.sequence import gps_ca_code

    for prn in (1, 7, 17, 32):
        c = gps_ca_code(prn)
        assert c.shape == (1023,)
        assert c.sum() == 512
    a = 1.0 - 2.0 * gps_ca_code(1).astype(np.float64)
    b = 1.0 - 2.0 * gps_ca_code(22).astype(np.float64)
    xc = np.fft.ifft(np.fft.fft(a) * np.conj(np.fft.fft(b))).real
    assert set(np.round(xc).astype(int).tolist()) <= {-65, -1, 63}
    # autocorrelation: 1023 at lag 0, sidelobes in the Gold set
    ac = np.fft.ifft(np.abs(np.fft.fft(a)) ** 2).real
    assert round(ac[0]) == 1023
    assert set(np.round(ac[1:]).astype(int).tolist()) <= {-65, -1, 63}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="PRN"):
        gps_ca_code(33)


def test_gps_ca_acquisition_via_caf(rng):
    """Cold acquisition: two satellites at different code phases and
    Dopplers + noise; the CAF over each PRN's BPSK chips recovers code
    phase exactly and Doppler to sub-bin accuracy, and a wrong PRN shows
    no significant peak."""
    from aether_primitives_tpu.models.caf import ambiguity
    from aether_primitives_tpu.ops.sequence import gps_ca_code

    n = 1023
    sats = {5: (217, 2.1e-4), 12: (800, -3.3e-4)}  # prn: (phase, doppler)
    t = np.arange(n)
    x = np.zeros(n, np.complex128)
    for prn, (tau, fd) in sats.items():
        chips = 1.0 - 2.0 * gps_ca_code(prn).astype(np.float64)
        x += np.roll(chips, tau) * np.exp(2j * np.pi * fd * t)
    x += 0.7 * (rng.normal(size=n) + 1j * rng.normal(size=n))
    x = x.astype(np.complex64)

    dops = np.linspace(-5e-4, 5e-4, 41).astype(np.float32)
    for prn, (tau, fd) in sats.items():
        ref = (1.0 - 2.0 * gps_ca_code(prn).astype(np.float32)).astype(
            np.complex64
        )
        surf = np.abs(np.asarray(ambiguity(x, ref, dops)))
        di, ti = np.unravel_index(surf.argmax(), surf.shape)
        assert ti == tau, (prn, ti, tau)
        assert abs(float(dops[di]) - fd) < 3e-5, (prn, dops[di], fd)
    # absent PRN: no peak above 2/3 of the weakest real satellite's
    ref9 = (1.0 - 2.0 * gps_ca_code(9).astype(np.float32)).astype(np.complex64)
    surf9 = np.abs(np.asarray(ambiguity(x, ref9, dops)))
    ref5 = (1.0 - 2.0 * gps_ca_code(5).astype(np.float32)).astype(np.complex64)
    surf5 = np.abs(np.asarray(ambiguity(x, ref5, dops)))
    assert surf9.max() < 0.67 * surf5.max()

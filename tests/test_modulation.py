"""Modulation tests — exact symbol-table vectors and seeded round trips
(reference src/modulation.rs:151-197)."""

import numpy as np
import pytest

from aether_primitives_tpu.ops import modulation as mod


def test_generic_bpsk_table():
    # reference generic_bpsk test: bits [0,1,0,1]
    out = np.asarray(mod.bpsk().modulate(np.array([0, 1, 0, 1], np.uint8)))
    expect = np.array([1 + 1j, -1 - 1j, 1 + 1j, -1 - 1j], np.complex64)
    assert (out == expect).all()


def test_generic_qpsk_table():
    # reference generic_qpsk test: bits [0,0, 1,0, 0,1, 1,1] -> the 4 table
    # entries in order (LSB-first: pair (b0,b1) -> idx b0 + 2*b1)
    bits = np.array([0, 0, 1, 0, 0, 1, 1, 1], np.uint8)
    out = np.asarray(mod.qpsk().modulate(bits))
    assert (out == mod.GENERIC_QPSK_TABLE).all()


def test_qpsk_index_lsb_first():
    m = mod.qpsk()
    # (bits[1] << 1) + bits[0] (reference src/modulation.rs:22-25)
    assert int(m.index(np.array([1, 0]))) == 1
    assert int(m.index(np.array([0, 1]))) == 2


@pytest.mark.parametrize("seed", [815, 234354654543, 18324357])
@pytest.mark.parametrize("name", ["bpsk", "qpsk"])
def test_seeded_roundtrip(seed, name):
    # reference naive_demod test structure — but with real {0,1} bits (its
    # gen_range(0,1) only ever produced zeros, SURVEY.md §2 quirk 3)
    rng = np.random.default_rng(seed)
    m = mod.qpsk() if name == "qpsk" else mod.bpsk()
    bits = rng.integers(0, 2, 100 * m.bits_per_symbol).astype(np.uint8)
    syms = m.modulate(bits)
    back = np.asarray(m.demod(syms))
    assert (back == bits).all()


def test_demod_noisy_still_exact():
    rng = np.random.default_rng(1)
    m = mod.qpsk()
    bits = rng.integers(0, 2, 2000).astype(np.uint8)
    syms = np.asarray(m.modulate(bits))
    noisy = syms + 0.1 * (rng.normal(size=syms.shape) + 1j * rng.normal(size=syms.shape))
    assert (np.asarray(m.demod(noisy.astype(np.complex64))) == bits).all()


def test_demod_scans_full_constellation():
    # 16-point constellation: the reference's blanket demod would only scan
    # 8 points (2*bits) and mis-demod half the symbols (quirk 4); ours scans
    # 2**bits and round-trips exactly.
    rng = np.random.default_rng(2)
    table = (rng.normal(size=16) + 1j * rng.normal(size=16)).astype(np.complex64)
    m = mod.Modulation(table, name="16qam-ish")
    assert m.bits_per_symbol == 4
    bits = rng.integers(0, 2, 400).astype(np.uint8)
    assert (np.asarray(m.demod(m.modulate(bits))) == bits).all()


def test_modulate_batched():
    m = mod.qpsk()
    bits = np.zeros((3, 8), np.uint8)
    out = m.modulate(bits)
    assert out.shape == (3, 4)


def test_partial_chunk_rejected():
    with pytest.raises(ValueError, match="not divisible"):
        mod.qpsk().modulate(np.array([0, 1, 0], np.uint8))


def test_non_power_of_two_table_rejected():
    with pytest.raises(ValueError, match="power of two"):
        mod.Modulation(np.ones(3, np.complex64))


def test_soft_demod_signs_match_hard():
    rng = np.random.default_rng(3)
    m = mod.qpsk()
    s = (rng.normal(size=5000) + 1j * rng.normal(size=5000)).astype(np.complex64)
    hard = np.asarray(m.demod(s))
    llr = np.asarray(m.demod_soft(s, noise_var=0.5))
    assert (np.asarray(m.hard_from_soft(llr)) == hard).all()


def test_soft_demod_magnitude_scales_with_confidence():
    m = mod.bpsk()
    near = np.array([1.0 + 1.0j], np.complex64)  # on the constellation point
    far = np.array([0.1 + 0.1j], np.complex64)  # near the boundary
    llr_near = float(np.asarray(m.demod_soft(near))[0])
    llr_far = float(np.asarray(m.demod_soft(far))[0])
    assert llr_near < 0 or abs(llr_near) > abs(llr_far)
    assert abs(llr_near) > abs(llr_far)


def test_soft_demod_16point():
    rng = np.random.default_rng(4)
    table = (rng.normal(size=16) + 1j * rng.normal(size=16)).astype(np.complex64)
    m = mod.Modulation(table)
    bits = rng.integers(0, 2, 400).astype(np.uint8)
    syms = m.modulate(bits)
    llr = m.demod_soft(syms, noise_var=1.0)
    assert (np.asarray(m.hard_from_soft(llr)) == bits).all()


def test_modulation_hashable_and_static_jit_arg():
    import functools

    import jax

    m = mod.qpsk()
    hash(m)  # frozen config object must be usable as dict key

    @functools.partial(jax.jit, static_argnums=0)
    def demod_static(modu, s):
        return modu.demod(s)

    s = np.asarray(m.modulate(np.array([0, 1, 1, 0], np.uint8)))
    assert (np.asarray(demod_static(m, s)) == [0, 1, 1, 0]).all()


def test_qam16_roundtrip_and_properties():
    m = mod.qam16()
    assert m.bits_per_symbol == 4
    # unit average energy
    assert abs(np.mean(np.abs(m.table) ** 2) - 1.0) < 1e-6
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 4000).astype(np.uint8)
    syms = np.asarray(m.modulate(bits))
    assert (np.asarray(m.demod(syms)) == bits).all()
    # mild noise: still exact (min distance 2/sqrt(10) ~ 0.63)
    noisy = syms + 0.05 * (rng.normal(size=1000) + 1j * rng.normal(size=1000)).astype(
        np.complex64
    )
    assert (np.asarray(m.demod(noisy)) == bits).all()


def test_qam16_gray_single_bit_neighbors():
    # Gray property: horizontally/vertically adjacent constellation points
    # differ in exactly one bit
    m = mod.qam16()
    t = m.table
    levels = np.unique(np.round(t.real, 6))
    for idx in range(16):
        for jdx in range(16):
            d = t[idx] - t[jdx]
            step = abs(levels[1] - levels[0])
            if (abs(d.real) < 1e-6 and abs(abs(d.imag) - step) < 1e-6) or (
                abs(d.imag) < 1e-6 and abs(abs(d.real) - step) < 1e-6
            ):
                assert bin(idx ^ jdx).count("1") == 1, (idx, jdx)


def test_qam16_soft_demod():
    m = mod.qam16()
    rng = np.random.default_rng(6)
    bits = rng.integers(0, 2, 400).astype(np.uint8)
    llr = m.demod_soft(m.modulate(bits), noise_var=0.1)
    assert (np.asarray(m.hard_from_soft(llr)) == bits).all()


def test_interleave_bits_matches_stack():
    # the bitcast interleave must equal the naive stack layout for every
    # supported width (LSB-first byte order), including the odd-width
    # fallback
    import jax.numpy as jnp

    from aether_primitives_tpu.ops.modulation import _interleave_bits

    rng = np.random.default_rng(70)
    for bps in (1, 2, 3, 4):
        planes = [rng.integers(0, 2, (3, 17)).astype(np.uint8) for _ in range(bps)]
        got = np.asarray(_interleave_bits([jnp.asarray(p) for p in planes]))
        expect = np.stack(planes, axis=-1).reshape(3, 17 * bps)
        assert got.dtype == np.uint8
        assert np.array_equal(got, expect), bps


# ---- generic square QAM ------------------------------------------------------


def test_qam_16_matches_qam16_table():
    assert (mod.qam(16).table == mod.qam16().table).all()


@pytest.mark.parametrize("order", [4, 16, 64, 256])
def test_qam_properties_and_roundtrip(order, rng):
    m = mod.qam(order)
    bps = m.bits_per_symbol
    assert 2**bps == order
    # unit average energy
    assert abs(np.mean(np.abs(m.table) ** 2) - 1.0) < 1e-6
    # Gray property: nearest neighbors differ in exactly one bit
    for idx in range(order):
        d = np.abs(m.table - m.table[idx])
        d[idx] = np.inf
        for nb in np.where(np.isclose(d, d.min()))[0]:
            assert bin(idx ^ nb).count("1") == 1, (idx, nb)
    # noiseless modulate -> demod roundtrip is exact
    bits = rng.integers(0, 2, 1024 * bps).astype(np.uint8)
    syms = m.modulate(bits)
    back = np.asarray(m.demod(syms))
    assert (back == bits).all()


def test_qam_rejects_non_square():
    with pytest.raises(ValueError, match="even power"):
        mod.qam(32)
    with pytest.raises(ValueError, match="even power"):
        mod.qam(2)


# ---- generic Gray M-PSK --------------------------------------------------------


@pytest.mark.parametrize("order", [2, 4, 8, 16, 32])
def test_psk_properties_and_roundtrip(order, rng):
    m = mod.psk(order)
    bps = m.bits_per_symbol
    assert 2**bps == order
    # unit symbol energy on every point
    assert np.allclose(np.abs(m.table), 1.0, atol=1e-6)
    # all M phases present exactly once
    phases = np.sort(np.mod(np.angle(m.table.astype(np.complex128)), 2 * np.pi))
    assert np.allclose(phases, 2 * np.pi * np.arange(order) / order, atol=1e-5)
    # Gray property: phase-adjacent points differ in exactly one bit
    if order > 2:
        order_by_phase = np.argsort(np.mod(np.angle(m.table), 2 * np.pi))
        for k in range(order):
            a = order_by_phase[k]
            b = order_by_phase[(k + 1) % order]
            assert bin(int(a) ^ int(b)).count("1") == 1, (a, b)
    # noiseless modulate -> demod roundtrip is exact
    bits = rng.integers(0, 2, 1024 * bps).astype(np.uint8)
    syms = m.modulate(bits)
    back = np.asarray(m.demod(syms))
    assert (back == bits).all()


def test_psk8_one_neighbor_error_is_one_bit(rng):
    # rotate every symbol halfway toward its phase neighbor plus epsilon:
    # the demod picks the neighbor, costing exactly 1 bit per symbol
    m = mod.psk(8)
    bits = rng.integers(0, 2, 3 * 512).astype(np.uint8)
    syms = np.asarray(m.modulate(bits))
    nudged = (syms * np.exp(1j * (np.pi / 8 + 1e-3))).astype(np.complex64)
    back = np.asarray(m.demod(nudged))
    errs = int((back != bits).sum())
    assert errs == 512, errs


def test_psk_rejects_non_power_of_two():
    with pytest.raises(ValueError, match="power of two"):
        mod.psk(6)


def test_psk_chain_config_resolves():
    from aether_primitives_tpu.models.modem import _modulation_by_name

    m = _modulation_by_name("psk8")
    assert m.bits_per_symbol == 3
    assert m.name == "psk8"


# ---- differential coding -----------------------------------------------------


def test_differential_roundtrip_and_rotation_invariance(rng):
    order = 4
    table = mod.psk_table(order)
    d = rng.integers(0, order, 2048).astype(np.int32)
    tx_idx = np.asarray(mod.differential_encode(d, order))
    syms = table[tx_idx]
    # arbitrary constellation rotation by k * 2pi/M (the blind-recovery
    # ambiguity): decoded differences are unchanged
    for k in range(order):
        rot = (syms * np.exp(2j * np.pi * k / order)).astype(np.complex64)
        rx_idx = np.asarray(mod.nearest_index(rot, table))
        got = np.asarray(mod.differential_decode(rx_idx, order))
        # the first difference absorbs the rotation; the rest are exact
        assert (got[1:] == d[1:]).all(), k


def test_nearest_index_matches_table(rng):
    table = mod.psk_table(8)
    idx = rng.integers(0, 8, 512)
    noisy = (table[idx] + 0.05 * (rng.normal(size=512)
                                  + 1j * rng.normal(size=512))).astype(np.complex64)
    assert (np.asarray(mod.nearest_index(noisy, table)) == idx).all()


# ---- pi/4-DQPSK -----------------------------------------------------------------


def test_pi4dqpsk_roundtrip_and_rotation_invariance(rng):
    bits = rng.integers(0, 2, 2 * 2048).astype(np.uint8)
    syms = np.asarray(mod.pi4dqpsk_modulate(bits))
    assert np.allclose(np.abs(syms), 1.0, atol=1e-5)
    back = np.asarray(mod.pi4dqpsk_demod(syms))
    assert (back == bits).all()
    # constant carrier rotation: everything after the first dibit survives
    rot = (syms * np.exp(1j * 1.234)).astype(np.complex64)
    back_rot = np.asarray(mod.pi4dqpsk_demod(rot))
    assert (back_rot[2:] == bits[2:]).all()


def test_pi4dqpsk_alternating_grids(rng):
    # consecutive symbols live on ALTERNATING QPSK grids (the envelope
    # never passes through zero between symbols)
    bits = rng.integers(0, 2, 2 * 512).astype(np.uint8)
    syms = np.asarray(mod.pi4dqpsk_modulate(bits))
    ph = np.mod(np.angle(syms), np.pi / 2)
    on_diag = np.abs(ph - np.pi / 4) < 1e-4  # pi/4 + k pi/2 grid
    on_axis = np.minimum(ph, np.pi / 2 - ph) < 1e-4  # k pi/2 grid
    # strict alternation
    assert (on_diag[0::2] != on_diag[1::2]).all() or (
        on_axis[0::2] != on_axis[1::2]
    ).all()
    assert (on_diag ^ on_axis).all()


def test_pi4dqpsk_noise_tolerance(rng):
    bits = rng.integers(0, 2, 2 * 4096).astype(np.uint8)
    syms = np.asarray(mod.pi4dqpsk_modulate(bits))
    noisy = (syms + 0.08 * (rng.normal(size=syms.shape)
                            + 1j * rng.normal(size=syms.shape))).astype(np.complex64)
    back = np.asarray(mod.pi4dqpsk_demod(noisy))
    assert (back == bits).mean() > 0.9995


def test_pi4dqpsk_odd_bits_rejected():
    with pytest.raises(ValueError, match="PAIRS"):
        mod.pi4dqpsk_modulate(np.zeros(5, np.uint8))


class TestApsk:
    def test_apsk16_geometry(self):
        m = mod.apsk(16)
        t = m.table
        assert t.shape == (16,) and len(np.unique(np.round(t, 6))) == 16
        radii = np.abs(t)
        r_in, r_out = np.min(radii), np.max(radii)
        assert np.sum(np.isclose(radii, r_in)) == 4
        assert np.sum(np.isclose(radii, r_out)) == 12
        assert abs(r_out / r_in - 2.85) < 1e-5  # default "3/4" ring ratio
        assert abs(np.mean(radii**2) - 1.0) < 1e-6  # unit average energy

    def test_apsk16_quadrant_gray_labels(self):
        m = mod.apsk(16)
        t = m.table
        # within each quadrant the three outer points, walked by angle,
        # differ in exactly one bit
        radii = np.abs(t)
        outer = np.where(np.isclose(radii, radii.max()))[0]
        for q in range(4):
            lo, hi = q * np.pi / 2, (q + 1) * np.pi / 2
            ang = np.angle(t[outer]) % (2 * np.pi)
            sel = outer[(ang >= lo) & (ang < hi)]
            sel = sel[np.argsort(np.angle(t[sel]) % (2 * np.pi))]
            assert sel.size == 3
            for a, b in zip(sel[:-1], sel[1:]):
                assert bin(a ^ b).count("1") == 1, (a, b)

    def test_apsk16_lower_papr_than_qam16(self):
        a, q = mod.apsk(16), mod.qam(16)
        papr = lambda m: np.max(np.abs(m.table) ** 2) / np.mean(np.abs(m.table) ** 2)
        assert papr(a) < papr(q)

    @pytest.mark.parametrize("order", [16, 32])
    def test_apsk_roundtrip(self, rng, order):
        m = mod.apsk(order)
        bits = rng.integers(0, 2, 40 * m.bits_per_symbol).astype(np.uint8)
        syms = m.modulate(bits)
        out = np.asarray(m.demod(syms))
        np.testing.assert_array_equal(out, bits)

    def test_apsk32_rings_and_rate_gamma(self):
        m = mod.apsk(32, gamma="4/5")
        radii = np.sort(np.unique(np.round(np.abs(m.table), 5)))
        assert radii.size == 3
        assert abs(radii[1] / radii[0] - 2.72) < 1e-4
        assert abs(radii[2] / radii[0] - 4.87) < 1e-4
        assert abs(np.mean(np.abs(m.table) ** 2) - 1.0) < 1e-6

    def test_apsk16_soft_demod_noisy(self, rng):
        m = mod.apsk(16)
        bits = rng.integers(0, 2, 4000).astype(np.uint8)
        syms = np.asarray(m.modulate(bits))
        noisy = syms + 0.05 * (rng.normal(size=syms.size)
                               + 1j * rng.normal(size=syms.size)).astype(np.complex64)
        llr = np.asarray(m.demod_soft(noisy, 0.005))
        assert np.isfinite(llr).all()
        assert ((llr < 0).astype(np.uint8) == bits).mean() > 0.999

    def test_apsk_rejects_bad_order(self):
        with pytest.raises(ValueError):
            mod.apsk(64)

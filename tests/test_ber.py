"""BER simulation vs closed-form theory — end-to-end statistical
validation of modulate -> AWGN -> demod."""

import numpy as np
import pytest

from aether_primitives_tpu.models import ber


def test_q_function():
    assert ber.q_function(0.0) == pytest.approx(0.5)
    assert ber.q_function(1.0) == pytest.approx(0.158655, abs=1e-5)


@pytest.mark.parametrize("modulation", ["qpsk", "bpsk"])
def test_simulated_ber_matches_theory(modulation):
    rows = ber.simulate_ber(modulation, powers=(0.25, 0.5), n_bits=1 << 19)
    for power, sim, theory in rows:
        # ~5e5 bits: relative agreement within 10% for BER >= 1e-3
        assert sim == pytest.approx(theory, rel=0.1), (modulation, power)


def test_ber_decreases_with_snr():
    rows = ber.simulate_ber("qpsk", powers=(1.0, 0.5, 0.25), n_bits=1 << 18)
    bers = [r[1] for r in rows]
    assert bers[0] > bers[1] > bers[2]


def test_qam16_ber_matches_closed_form():
    rows = ber.simulate_ber("qam16", powers=(0.1, 0.05), n_bits=1 << 19)
    for power, sim, theory in rows:
        assert sim == pytest.approx(theory, rel=0.12), power


def test_qam_generic_theory_matches_qam16_hand_form():
    import math

    from aether_primitives_tpu.models.ber import q_function, theoretical_ber

    for p in (0.02, 0.1, 0.3):
        sigma = math.sqrt(p)
        d = 1.0 / math.sqrt(10.0)
        hand = (0.75 * q_function(d / sigma) + 0.5 * q_function(3 * d / sigma)
                - 0.25 * q_function(5 * d / sigma))
        assert abs(theoretical_ber("qam16", p) - hand) < 1e-12


def test_qam64_ber_matches_theory():
    from aether_primitives_tpu.models.ber import simulate_ber

    for p, sim, theo in simulate_ber("qam64", powers=(0.01, 0.02), n_bits=1 << 21):
        assert abs(sim - theo) < max(0.15 * theo, 3e-5), (p, sim, theo)

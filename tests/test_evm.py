"""assert_evm contract tests — ports of the reference's own cases
(reference src/lib.rs:82-119)."""

import numpy as np
import pytest

from aether_primitives_tpu import assert_evm, evm_db


def c(re, im=0.0):
    return np.complex64(re + 1j * im)


def test_evm_ok():
    ref = np.array([c(1), c(1)])
    assert_evm(np.array([c(1), c(1)]), ref, -80.0)
    assert_evm(np.array([c(1), c(0.99)]), ref, -20)
    assert_evm(np.array([c(1), c(1.01)]), ref, -20)


def test_evm_exceeded():
    ref = np.array([c(1), c(1)])
    with pytest.raises(AssertionError, match="EVM limit exceeded"):
        assert_evm(np.array([c(1), c(0.98)]), ref, -20)


def test_evm_ieee754_case():
    # reference `evm_ieee754` should-panic test: 0.9 vs 1.0 at -10 dB is a
    # rounding-sensitive borderline (0.1 > 0.1 in f32). Our f64 check makes
    # the comparison exact: |0.9-1.0| = 0.100000001... > 0.1 in f64 too
    # (0.9f32 = 0.89999997...), so it still fails, matching the reference.
    ref = np.array([c(1), c(1)])
    with pytest.raises(AssertionError):
        assert_evm(np.array([c(1), c(np.float32(0.9))]), ref, -10)


def test_length_mismatch():
    with pytest.raises(AssertionError, match="same length"):
        assert_evm(np.array([c(1)]), np.array([c(1), c(1)]))


def test_threshold_must_be_negative():
    with pytest.raises(AssertionError, match="negative"):
        assert_evm(np.array([c(1)]), np.array([c(1)]), 3.0)


def test_zero_reference_admits_no_error():
    ref = np.array([c(0)])
    assert_evm(np.array([c(0)]), ref)  # exact zero passes
    with pytest.raises(AssertionError):
        assert_evm(np.array([c(1e-12)]), ref)


def test_evm_db_measurement():
    ref = np.array([c(1), c(1)])
    act = np.array([c(1), c(1 + 1e-3)])
    db = evm_db(act, ref)
    assert abs(db - (-30.0)) < 0.1
    assert evm_db(ref, ref) == float("-inf")

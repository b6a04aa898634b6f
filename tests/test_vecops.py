"""VecOps tests — hand-vector cases mirroring the reference's unit tests
(reference src/vecops.rs:334-464) plus batching/fusion checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aether_primitives_tpu import CVec, assert_evm, cf32
from aether_primitives_tpu.ops import vecops


def full(v, n=100):
    return jnp.full((n,), v, dtype=cf32)


def test_scale():
    v = vecops.scale(full(0.5 + 0.5j), 2.0)
    assert_evm(v, full(1 + 1j))


def test_mul():
    # (1+1j) * (0+2j) = -2+2j  (reference vec_mul test)
    out = vecops.mul(full(1 + 1j), full(2j))
    assert_evm(out, full(-2 + 2j))


def test_div():
    out = vecops.div(full(2 + 2j), full(2 + 0j))
    assert_evm(out, full(1 + 1j))


def test_conj():
    assert_evm(vecops.conj(full(1 + 1j)), full(1 - 1j))


def test_add_sub():
    assert_evm(vecops.add(full(1 + 1j), full(1 + 1j)), full(2 + 2j))
    assert_evm(vecops.sub(full(2 + 2j), full(1 + 1j)), full(1 + 1j))


def test_mirror_even():
    # reference: [0,1,2,3] -> [2,3,0,1] (src/vecops.rs:396-405)
    v = jnp.arange(4).astype(cf32)
    assert_evm(vecops.mirror(v), jnp.array([2, 3, 0, 1], dtype=cf32))


def test_mirror_odd_matches_reference_swap_semantics():
    # mid = 2; swap (0,2),(1,3); element 4 untouched -> [2,3,0,1,4]
    v = jnp.arange(5).astype(cf32)
    assert_evm(vecops.mirror(v), jnp.array([2, 3, 0, 1, 4], dtype=cf32))


def test_mirror_batched():
    v = jnp.stack([jnp.arange(4), jnp.arange(4) + 10]).astype(cf32)
    out = vecops.mirror(v)
    assert_evm(out[0], jnp.array([2, 3, 0, 1], dtype=cf32))
    assert_evm(out[1], jnp.array([12, 13, 10, 11], dtype=cf32))


def test_zero_and_clone():
    assert_evm(vecops.zero(full(2 + 2j)), full(0))
    assert_evm(vecops.clone(full(1 + 1j)), full(1 + 1j))


def test_mutate_indexed():
    # reference vec_mutate test: scale element i by i (src/vecops.rs:441-455)
    v = full(1 + 1j)
    out = vecops.mutate_indexed(v, lambda x, i: x * i.astype(jnp.float32))
    expect = (np.arange(100) * (1 + 1j)).astype(np.complex64)
    assert_evm(out, expect)


def test_length_mismatch_raises():
    with pytest.raises(ValueError, match="same length"):
        vecops.mul(full(1, 4), full(1, 5))


def test_cvec_chain():
    # the reference's doctest chain (src/vecops.rs:11-38)
    twos = full(2 + 2j)
    ones = full(1 + 1j)
    v = CVec(full(2 + 2j))
    out = (
        v.vec_div(twos)
        .vec_mul(twos)
        .vec_zero()
        .vec_add(ones)
        .vec_sub(twos)
        .vec_clone(ones)
        .vec_mutate(lambda c: jnp.real(c) - 1j * jnp.ones_like(jnp.real(c)))
        .vec_conj()
        .vec_mirror()
    )
    assert_evm(out.array, full(1 + 1j), -80.0)


def test_cvec_through_jit():
    def f(v: CVec) -> CVec:
        return v.vec_scale(2.0).vec_conj()

    out = jax.jit(f)(CVec(full(1 + 1j)))
    assert_evm(out.array, full(2 - 2j))


def test_cvec_fft_roundtrip():
    from aether_primitives_tpu.ops.fft import Scale

    v = CVec(full(1 + 1j))
    out = v.vec_fft(Scale.SN).vec_ifft(Scale.SN)
    # reference vec_fft test uses default -80 on length 100 (src/vecops.rs:434-442)
    assert_evm(out.array, full(1 + 1j), -80.0)


def test_cvec_rfft_with_plan():
    # the reference's reusable-plan variant (vec_rfft/vec_rifft)
    from aether_primitives_tpu.ops.fft import Scale, plan

    p = plan(100)
    v = CVec(full(1 + 1j))
    out = v.vec_rfft(p, Scale.SN).vec_scale(2.0).vec_rifft(p, Scale.SN)
    assert_evm(out.array, full(2 + 2j), -72.0)

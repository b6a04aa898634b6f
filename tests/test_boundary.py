"""f32 boundary layer tests (Split, tree conversion, f32_boundary)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aether_primitives_tpu import boundary


def test_split_roundtrip(rng):
    x = (rng.normal(size=64) + 1j * rng.normal(size=64)).astype(np.complex64)
    s = boundary.split(x)
    assert s.re.dtype == np.float32 and s.shape == (64,)
    assert (s.numpy() == x).all()


def test_split_is_pytree():
    s = boundary.Split(np.ones(4, np.float32), np.zeros(4, np.float32))
    leaves = jax.tree_util.tree_leaves(s)
    assert len(leaves) == 2
    s2 = jax.tree_util.tree_map(lambda v: v * 2, s)
    assert isinstance(s2, boundary.Split)
    assert (np.asarray(s2.re) == 2).all()


def test_f32_boundary_wraps_complex_fn(rng):
    x = (rng.normal(size=32) + 1j * rng.normal(size=32)).astype(np.complex64)

    def f(a, scale=2.0):
        return jnp.conj(a) * scale

    wrapped = jax.jit(boundary.f32_boundary(f))
    out = wrapped(boundary.split(x))
    assert isinstance(out, boundary.Split)
    assert np.allclose(out.numpy(), np.conj(x) * 2.0)


def test_f32_boundary_mixed_pytree(rng):
    x = (rng.normal(size=16) + 1j * rng.normal(size=16)).astype(np.complex64)

    def f(pair):
        c, gain = pair
        return {"y": c * gain, "power": jnp.sum(jnp.abs(c) ** 2)}

    out = jax.jit(boundary.f32_boundary(f))((boundary.split(x), jnp.float32(3.0)))
    assert isinstance(out["y"], boundary.Split)
    assert out["power"].dtype == jnp.float32
    assert np.allclose(out["y"].numpy(), x * 3.0, atol=1e-6)


def test_tree_merge_inverse_of_tree_split(rng):
    x = jnp.asarray((rng.normal(size=8) + 1j * rng.normal(size=8)).astype(np.complex64))

    @jax.jit
    def roundtrip(s):
        [c] = boundary.tree_merge([s])
        [s2] = boundary.tree_split([c])
        return s2

    s = boundary.split(np.asarray(x))
    out = roundtrip(s)
    assert (out.numpy() == np.asarray(x)).all()

"""Turbo product code (Chase-Pyndiah) tests.

Validation strategy: structural (every row/column of an encoded block
is an extended-Hamming codeword), exactness (noiseless + planted-error
roundtrips), and a seeded AWGN waterfall checked against the known
performance class of (32,26)^2 TPC — raw channel BER ~5e-2 at
Eb/N0 = 3 dB must decode to zero errors across the test batch, the way
Pyndiah's published curves do (BER 1e-5 at ~3 dB, 4 iterations).
"""

import math

import jax
import numpy as np
import pytest

from aether_primitives_tpu.ops.tpc import TPC


def _awgn_llr(cw, ebn0_db, rate, rng):
    sigma = math.sqrt(1 / (2 * rate * 10 ** (ebn0_db / 10)))
    y = (1 - 2 * cw.astype(np.float64)) + sigma * rng.normal(size=cw.shape)
    return (2 * y / sigma**2).astype(np.float32)


def test_encode_structure():
    t = TPC(m=5)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 2, (3, t.k, t.k)).astype(np.uint8)
    cw = np.asarray(t.encode(data)).astype(np.float64)
    assert cw.shape == (3, 32, 32)
    for blk in cw:
        for w in (blk, blk.T):
            syn = (w[:, :31] @ np.asarray(t.base._synd)) % 2
            assert (syn == 0).all()
            assert (w.sum(axis=1) % 2 == 0).all()
    # systematic: data occupies the top-left k x k corner
    assert np.array_equal(cw[:, : t.k, : t.k].astype(np.uint8), data)


def test_noiseless_roundtrip_and_jit():
    t = TPC(m=5, iters=2)
    rng = np.random.default_rng(1)
    data = rng.integers(0, 2, (2, 3, t.k, t.k)).astype(np.uint8)
    cw = np.asarray(t.encode(data)).astype(np.float64)
    llr = ((1 - 2 * cw) * 6.0).astype(np.float32)
    dec, ok = jax.jit(t.decode)(llr)
    assert dec.shape == (2, 3, t.k, t.k) and ok.shape == (2, 3)
    assert np.array_equal(np.asarray(dec), data)
    assert np.asarray(ok).all()


def test_planted_errors_corrected():
    # 30 scattered hard errors in a 1024-bit block (3% raw) with weak
    # LLRs: far beyond any single row/column's t=1, fixed by iteration
    t = TPC(m=5, iters=4)
    rng = np.random.default_rng(2)
    data = rng.integers(0, 2, (4, t.k, t.k)).astype(np.uint8)
    cw = np.asarray(t.encode(data)).astype(np.float64)
    llr = (1 - 2 * cw) * 4.0
    for b in range(4):
        pos = rng.choice(1024, size=30, replace=False)
        flat = llr[b].reshape(-1)
        flat[pos] *= -rng.uniform(0.05, 0.4, size=30)
    dec, ok = t.decode(llr.astype(np.float32))
    assert np.array_equal(np.asarray(dec), data)
    assert np.asarray(ok).all()


def test_awgn_waterfall():
    # the headline property: raw ~5% channel BER -> zero decoded errors
    t = TPC(m=5, p=4, iters=4)
    rng = np.random.default_rng(3)
    B = 48
    data = rng.integers(0, 2, (B, t.k, t.k)).astype(np.uint8)
    cw = np.asarray(t.encode(data)).astype(np.float64)
    llr = _awgn_llr(cw, 3.0, t.rate, rng)
    raw = ((llr < 0) != cw).mean()
    assert raw > 0.04  # the channel is genuinely stressed
    dec, ok = t.decode(llr)
    assert np.array_equal(np.asarray(dec), data)
    assert np.asarray(ok).all()


def test_awgn_near_threshold_gain():
    # closer to threshold the decode is imperfect but must beat the raw
    # channel by >5x in BER, and correct blocks must report ok
    t = TPC(m=5, p=4, iters=4)
    rng = np.random.default_rng(4)
    B = 48
    data = rng.integers(0, 2, (B, t.k, t.k)).astype(np.uint8)
    cw = np.asarray(t.encode(data)).astype(np.float64)
    llr = _awgn_llr(cw, 2.5, t.rate, rng)
    raw = ((llr < 0) != cw).mean()
    dec, ok = t.decode(llr)
    dec = np.asarray(dec)
    ber = (dec != data).mean()
    assert ber < raw / 5
    exact = (dec == data).all(axis=(1, 2))
    assert (np.asarray(ok)[exact]).all()  # true decode always passes ok


def test_m6_code():
    # rate 0.79 needs the wider Chase set near threshold
    t = TPC(m=6, p=5, iters=4)
    assert (t.n, t.k) == (64, 57) and abs(t.rate - (57 / 64) ** 2) < 1e-9
    rng = np.random.default_rng(5)
    data = rng.integers(0, 2, (2, t.k, t.k)).astype(np.uint8)
    cw = np.asarray(t.encode(data)).astype(np.float64)
    llr = _awgn_llr(cw, 3.5, t.rate, rng)
    dec, ok = t.decode(llr)
    assert np.array_equal(np.asarray(dec), data)
    assert np.asarray(ok).all()


def test_fast_hamming_path_matches_general_decoder():
    # the SISO's t=1 correction shortcut (S1 IS the locator: syndrome
    # matmul -> distance match -> XOR) must be bit-identical to the
    # general BM+Chien pipeline on arbitrary received words
    import jax.numpy as jnp

    t = TPC(m=5)
    rng = np.random.default_rng(6)
    words = rng.integers(0, 2, (500, 31)).astype(np.float32)
    s1 = np.mod(words @ t._s1, 2.0)
    dist = s1 @ t._match_w + t._match_b
    fast = np.mod(words + (dist == 0.0), 2.0)
    gen, ok, _ = t.base._decode_full(jnp.asarray(words))
    assert np.array_equal(fast, np.asarray(gen))
    assert np.asarray(ok).all()  # perfect code: every word decodes


def test_t2_component_square():
    """(64,51,t=2)^2 — the 802.16-class stronger square (min distance
    36 vs the Hamming square's 16). At Eb/N0 = 3 dB / raw ~5.6% channel
    BER it must decode the whole batch exactly, a point where the t=1
    (64,57)^2 square still fails (measured BER 2.8e-3 at an EASIER
    channel); failed Chase trials are masked by the closed-form
    decoder's exact ok verdict."""
    t = TPC(m=6, p=4, iters=4, t_component=2)
    assert (t.n, t.k) == (64, 51)
    rng = np.random.default_rng(8)
    B = 16
    data = rng.integers(0, 2, (B, t.k, t.k)).astype(np.uint8)
    cw = np.asarray(t.encode(data)).astype(np.float64)
    llr = _awgn_llr(cw, 3.0, t.rate, rng)
    raw = ((llr < 0) != cw).mean()
    assert raw > 0.04
    dec, ok = t.decode(llr)
    assert np.array_equal(np.asarray(dec), data)
    assert np.asarray(ok).all()


def test_t2_encode_structure():
    t = TPC(m=6, t_component=2)
    rng = np.random.default_rng(9)
    data = rng.integers(0, 2, (2, t.k, t.k)).astype(np.uint8)
    cw = np.asarray(t.encode(data)).astype(np.float64)
    synd = np.asarray(t.base._synd)
    for blk in cw:
        for w in (blk, blk.T):
            assert ((w[:, :63] @ synd) % 2 == 0).all()
            assert (w.sum(axis=1) % 2 == 0).all()


def test_sharded_decode_matches_unsharded(eight_devices):
    import jax

    from aether_primitives_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh({"channel": 8})
    t = TPC(m=4, p=3, iters=2)
    rng = np.random.default_rng(7)
    data = rng.integers(0, 2, (16, t.k, t.k)).astype(np.uint8)
    cw = np.asarray(t.encode(data)).astype(np.float64)
    llr = _awgn_llr(cw, 4.0, t.rate, rng)
    dec_s, ok_s = jax.jit(lambda v: t.sharded_decode(v, mesh))(llr)
    dec_u, ok_u = t.decode(llr)
    assert np.array_equal(np.asarray(dec_s), np.asarray(dec_u))
    assert np.array_equal(np.asarray(ok_s), np.asarray(ok_u))


def test_bad_shapes_rejected():
    t = TPC(m=5)
    with pytest.raises(ValueError):
        t.encode(np.zeros((5, 5), np.uint8))
    with pytest.raises(ValueError):
        t.decode(np.zeros((31, 31), np.float32))

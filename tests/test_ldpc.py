"""LDPC: generator/parity consistency, min-sum error correction, coding
gain over uncoded BPSK, batching, and syndrome flags."""

import numpy as np
import pytest

from aether_primitives_tpu.ops import ldpc


@pytest.fixture(scope="module")
def code():
    return ldpc.make_regular_ldpc(648, 3, 6, seed=7)


def test_generator_orthogonal_to_h(code):
    h, g, info = code
    k = g.shape[0]
    assert h.shape == (324, 648)
    # band sums are dependent: rank = m - (dv-1) -> k = n - rank = 326
    assert k == 326
    assert ((g @ h.T) % 2 == 0).all()
    assert info.size == k and np.unique(info).size == k


def test_regular_degrees(code):
    h, _, _ = code
    assert (h.sum(axis=1) == 6).all()  # dc
    assert (h.sum(axis=0) == 3).all()  # dv


def test_encode_systematic_and_valid(rng, code):
    h, g, info = code
    u = rng.integers(0, 2, g.shape[0]).astype(np.uint8)
    c = np.asarray(ldpc.ldpc_encode(u, g))
    assert ((h @ c) % 2 == 0).all()
    assert (c[info] == u).all()  # message bits sit at info_indices


def test_decode_clean_roundtrip(rng, code):
    h, g, info = code
    u = rng.integers(0, 2, g.shape[0]).astype(np.uint8)
    c = np.asarray(ldpc.ldpc_encode(u, g))
    llr = 1.0 - 2.0 * c.astype(np.float32)
    hard, ok = ldpc.ldpc_decode(llr, h, iters=5)
    assert bool(ok)
    assert (np.asarray(ldpc.extract_info(hard, info)) == u).all()


def test_decode_corrects_bit_flips(rng, code):
    h, g, info = code
    u = rng.integers(0, 2, g.shape[0]).astype(np.uint8)
    c = np.array(ldpc.ldpc_encode(u, g))
    flips = rng.choice(648, size=30, replace=False)
    c[flips] ^= 1
    llr = 1.0 - 2.0 * c.astype(np.float32)
    hard, ok = ldpc.ldpc_decode(llr, h, iters=40)
    assert bool(ok)
    assert (np.asarray(ldpc.extract_info(hard, info)) == u).all()


def test_syndrome_flag_false_on_garbage(rng, code):
    h, _, _ = code
    llr = rng.normal(size=648).astype(np.float32) * 0.1
    _, ok = ldpc.ldpc_decode(llr, h, iters=3)
    assert not bool(ok)


def test_awgn_coding_gain(rng, code):
    # BPSK over AWGN at an SNR where uncoded BER ~ 2%: coded link is clean
    h, g, info = code
    n_frames = 8
    u = rng.integers(0, 2, (n_frames, g.shape[0])).astype(np.uint8)
    c = np.asarray(ldpc.ldpc_encode(u, g)).astype(np.float32)
    tx = 1.0 - 2.0 * c
    sigma = 0.69  # Q(1/0.69) ~ 7.4e-2 raw
    rx = tx + sigma * rng.normal(size=tx.shape).astype(np.float32)
    uncoded_ber = np.mean((rx < 0) != (c == 1))
    assert uncoded_ber > 0.02
    llr = 2.0 * rx / sigma**2
    hard, ok = ldpc.ldpc_decode(llr, h, iters=40)
    got = np.asarray(ldpc.extract_info(hard, info))
    assert np.asarray(ok).all()
    assert (got == u).all()


def test_batched_matches_single(rng, code):
    h, g, _ = code
    u = rng.integers(0, 2, (3, g.shape[0])).astype(np.uint8)
    c = np.asarray(ldpc.ldpc_encode(u, g)).astype(np.float32)
    rx = (1.0 - 2.0 * c) + 0.5 * rng.normal(size=c.shape).astype(np.float32)
    llr = 2.0 * rx / 0.25
    hb, okb = ldpc.ldpc_decode(llr, h, iters=10)
    for i in range(3):
        h1, ok1 = ldpc.ldpc_decode(llr[i], h, iters=10)
        assert (np.asarray(hb)[i] == np.asarray(h1)).all()
        assert bool(np.asarray(okb)[i]) == bool(ok1)


def test_rank_deficient_h_handled():
    # dependent rows just shrink the check space: k = n - rank
    h = np.zeros((4, 8), np.uint8)
    h[0, :2] = 1
    h[1, :2] = 1  # dependent row
    h[2, 2:4] = 1
    h[3, 4:6] = 1
    g = ldpc.ldpc_generator(h)
    assert g.shape == (8 - 3, 8)
    assert ((g @ h.T) % 2 == 0).all()


def test_llr_length_mismatch_raises(code):
    h, _, _ = code
    with pytest.raises(ValueError, match="length"):
        ldpc.ldpc_decode(np.zeros(100, np.float32), h)

"""Turbo codes: RSC encoder vs a bit-serial reference, termination,
and iterative decoding gain on the AWGN channel."""

import numpy as np
import pytest

from aether_primitives_tpu.ops.turbo import (
    rsc_encode,
    turbo_decode,
    turbo_encode,
    turbo_interleaver,
)


def _ref_rsc(bits):
    """Bit-serial RSC(1, 15/13): returns (parity, tail_sys, tail_par,
    end_state_after_tail)."""
    s1 = s2 = s3 = 0
    par = []
    for u in bits:
        a = int(u) ^ s2 ^ s3
        par.append(a ^ s1 ^ s3)
        s1, s2, s3 = a, s1, s2
    tail_s, tail_p = [], []
    for _ in range(3):
        u = s2 ^ s3  # forces a = 0
        a = 0
        tail_s.append(u)
        tail_p.append(a ^ s1 ^ s3)
        s1, s2, s3 = a, s1, s2
    return (
        np.array(par, np.uint8),
        np.array(tail_s, np.uint8),
        np.array(tail_p, np.uint8),
        (s1, s2, s3),
    )


def _bpsk_llr(bits, sigma, rng):
    """bit -> +/-1 (0 -> +1) -> AWGN -> channel LLR (positive = bit 0)."""
    x = 1.0 - 2.0 * np.asarray(bits, np.float64)
    y = x + sigma * rng.normal(size=x.shape)
    return (2.0 * y / sigma**2).astype(np.float32)


def test_rsc_matches_reference_and_terminates(rng):
    bits = rng.integers(0, 2, 200).astype(np.uint8)
    par, ts, tp = rsc_encode(bits)
    rpar, rts, rtp, end = _ref_rsc(bits)
    assert (np.asarray(par) == rpar).all()
    assert (np.asarray(ts) == rts).all()
    assert (np.asarray(tp) == rtp).all()
    assert end == (0, 0, 0)  # tail drives the trellis home


def test_interleaver_fixed_and_invertible():
    p1 = turbo_interleaver(512)
    p2 = turbo_interleaver(512)
    assert (p1 == p2).all()
    assert (np.sort(p1) == np.arange(512)).all()


def test_turbo_noiseless_roundtrip(rng):
    bits = rng.integers(0, 2, 512).astype(np.uint8)
    sys, p1, p2, ts, tp = turbo_encode(bits)
    big = 20.0
    dec, llr = turbo_decode(
        big * (1 - 2.0 * np.asarray(sys, np.float32)),
        big * (1 - 2.0 * np.asarray(p1, np.float32)),
        big * (1 - 2.0 * np.asarray(p2, np.float32)),
        big * (1 - 2.0 * np.asarray(ts, np.float32)),
        big * (1 - 2.0 * np.asarray(tp, np.float32)),
        iterations=2,
    )
    assert (np.asarray(dec) == bits).all()


def test_turbo_corrects_heavy_awgn(rng):
    # Eb/N0 = 2 dB at rate 1/3 -> Es/N0 = -2.77 dB: raw channel BER ~ 12%;
    # the turbo decoder drives it below 1e-3 on this block
    n = 8192
    bits = rng.integers(0, 2, n).astype(np.uint8)
    sys, p1, p2, ts, tp = turbo_encode(bits)
    ebn0 = 10 ** (2.0 / 10)
    esn0 = ebn0 / 3.0
    sigma = np.sqrt(1.0 / (2 * esn0))
    ls = _bpsk_llr(np.asarray(sys), sigma, rng)
    lp1 = _bpsk_llr(np.asarray(p1), sigma, rng)
    lp2 = _bpsk_llr(np.asarray(p2), sigma, rng)
    lts = _bpsk_llr(np.asarray(ts), sigma, rng)
    ltp = _bpsk_llr(np.asarray(tp), sigma, rng)
    raw_ber = float(((ls < 0).astype(np.uint8) != bits).mean())
    assert raw_ber > 0.08
    dec, _ = turbo_decode(ls, lp1, lp2, lts, ltp, iterations=8)
    ber = float((np.asarray(dec) != bits).mean())
    assert ber < 1e-3, (raw_ber, ber)


def test_turbo_iterations_help(rng):
    n = 4096
    bits = rng.integers(0, 2, n).astype(np.uint8)
    sys, p1, p2, ts, tp = turbo_encode(bits)
    esn0 = (10 ** (1.2 / 10)) / 3.0
    sigma = np.sqrt(1.0 / (2 * esn0))
    ls = _bpsk_llr(np.asarray(sys), sigma, rng)
    lp1 = _bpsk_llr(np.asarray(p1), sigma, rng)
    lp2 = _bpsk_llr(np.asarray(p2), sigma, rng)
    lts = _bpsk_llr(np.asarray(ts), sigma, rng)
    ltp = _bpsk_llr(np.asarray(tp), sigma, rng)
    errs = []
    for it in (1, 8):
        dec, _ = turbo_decode(ls, lp1, lp2, lts, ltp, iterations=it)
        errs.append(int((np.asarray(dec) != bits).sum()))
    assert errs[1] < errs[0] / 2, errs


def test_turbo_beats_viterbi_rate_half_equivalent(rng):
    # at equal Eb/N0 = 2.5 dB, turbo (rate 1/3) decodes clean where the
    # rate-1/2 K=8 Viterbi still leaves errors
    from aether_primitives_tpu.ops import fec as _fec

    n = 4096
    bits = rng.integers(0, 2, n).astype(np.uint8)
    ebn0 = 10 ** (2.5 / 10)
    # turbo leg
    sys, p1, p2, ts, tp = turbo_encode(bits)
    sig_t = np.sqrt(1.0 / (2 * ebn0 / 3.0))
    dec_t, _ = turbo_decode(
        _bpsk_llr(np.asarray(sys), sig_t, rng),
        _bpsk_llr(np.asarray(p1), sig_t, rng),
        _bpsk_llr(np.asarray(p2), sig_t, rng),
        _bpsk_llr(np.asarray(ts), sig_t, rng),
        _bpsk_llr(np.asarray(tp), sig_t, rng),
        iterations=8,
    )
    errs_turbo = int((np.asarray(dec_t) != bits).sum())
    # viterbi leg (rate 1/2)
    coded = np.asarray(_fec.conv_encode(bits))
    sig_v = np.sqrt(1.0 / (2 * ebn0 / 2.0))
    lv = _bpsk_llr(coded, sig_v, rng)
    dec_v = np.asarray(_fec.viterbi_decode(lv))[:n]
    errs_vit = int((dec_v != bits).sum())
    assert errs_turbo < max(errs_vit, 1), (errs_turbo, errs_vit)


def test_batched_decode_matches_per_codeword(rng):
    """Native batching ([..., n] inputs, batch on the BCJR lane axis)
    must be bit-identical to decoding each codeword alone — windowed and
    exact recursions both."""
    n, B = 512, 5
    bits = rng.integers(0, 2, (B, n)).astype(np.uint8)
    encs = [[np.asarray(v) for v in turbo_encode(bits[i])] for i in range(B)]
    sigma = 0.8
    llrs = [
        [_bpsk_llr(v, sigma, rng) for v in e] for e in encs
    ]
    batched_args = tuple(
        np.stack([llrs[i][j] for i in range(B)]) for j in range(5)
    )
    for kw in ({}, {"window": 64, "guard": 16}):
        dec_b, llr_b = turbo_decode(*batched_args, iterations=4, **kw)
        for i in range(B):
            dec_1, llr_1 = turbo_decode(*llrs[i], iterations=4, **kw)
            assert np.array_equal(np.asarray(dec_b[i]), np.asarray(dec_1)), kw
            assert np.allclose(np.asarray(llr_b[i]), np.asarray(llr_1),
                               atol=1e-4), kw


def test_windowed_bcjr_matches_exact(rng):
    # windowed parallel BCJR: same corrections as the exact recursion on
    # the heavy-AWGN channel (guard warmup replaces state propagation)
    n = 8192
    bits = rng.integers(0, 2, n).astype(np.uint8)
    sys, p1, p2, ts, tp = turbo_encode(bits)
    esn0 = (10 ** (2.0 / 10)) / 3.0
    sigma = np.sqrt(1.0 / (2 * esn0))
    args = tuple(
        _bpsk_llr(np.asarray(v), sigma, rng) for v in (sys, p1, p2, ts, tp)
    )
    dec_exact, _ = turbo_decode(*args, iterations=8)
    dec_win, _ = turbo_decode(*args, iterations=8, window=128, guard=24)
    e_exact = int((np.asarray(dec_exact) != bits).sum())
    e_win = int((np.asarray(dec_win) != bits).sum())
    assert e_exact < 8
    assert e_win <= e_exact + 4, (e_exact, e_win)


def test_windowed_bcjr_noiseless(rng):
    bits = rng.integers(0, 2, 1000).astype(np.uint8)  # non-multiple of window
    sys, p1, p2, ts, tp = turbo_encode(bits)
    big = 20.0
    dec, _ = turbo_decode(
        *[big * (1 - 2.0 * np.asarray(v, np.float32)) for v in (sys, p1, p2, ts, tp)],
        iterations=2,
        window=128,
    )
    assert (np.asarray(dec) == bits).all()

"""Binary BCH codec tests.

The construction is validated against the published code tables WITHOUT
embedding them in the implementation: the classic (n, k, t) triples and
the textbook (15,7) generator must fall out of the cyclotomic-coset
derivation, and the designed distance is checked exhaustively on the
small code (every nonzero BCH(15,7) codeword has weight >= 5). Decode
is validated by exhaustive-property roundtrips: any <= t bit errors
corrected exactly, over-capability patterns either flagged or decoded
to a genuine codeword within bounded distance (the strongest claim a
bounded-distance decoder can make).
"""

import itertools

import jax
import numpy as np
import pytest

from aether_primitives_tpu.ops import bch as bchmod
from aether_primitives_tpu.ops.bch import BCH


# ---- construction vs published code tables -----------------------------------


@pytest.mark.parametrize(
    "n,t,k",
    [
        (15, 1, 11),   # Hamming(15,11)
        (15, 2, 7),
        (15, 3, 5),
        (31, 2, 21),
        (31, 3, 16),
        (63, 3, 45),
        (127, 10, 64),
        (255, 4, 223),
    ],
)
def test_classic_parameters(n, t, k):
    c = BCH(n, t)
    assert c.k == k
    assert c.nsym == n - k


def test_textbook_generator_15_7():
    # g(x) = x^8 + x^7 + x^6 + x^4 + 1 (octal 721) — every coding text
    assert BCH(15, 2).generator == 0o721


def test_min_distance_exhaustive_15_7():
    c = BCH(15, 2)
    msgs = np.array(list(itertools.product([0, 1], repeat=7)), np.uint8)
    cws = np.asarray(c.encode(msgs))
    w = cws.sum(axis=-1)
    assert w[0] == 0 and (w[1:] >= 2 * c.t + 1).all()


def test_non_primitive_poly_rejected():
    # x^4+x^3+x^2+x+1 is irreducible but has order 5, not 15
    with pytest.raises(ValueError, match="primitive"):
        BCH(15, 2, m=4, primitive_poly=0x1F)


def test_unsupported_field_degree_names_the_builtins():
    # n=8191 infers m=13, past the built-in table — must be a descriptive
    # ValueError naming the supported degrees, not a bare KeyError
    # (advisor finding r4)
    with pytest.raises(ValueError, match="primitive_poly"):
        BCH(8191, 2)


def test_encode_is_a_cyclic_codeword():
    # every codeword polynomial must be divisible by g(x)
    c = BCH(31, 2)
    rng = np.random.default_rng(7)
    msg = rng.integers(0, 2, (4, c.k)).astype(np.uint8)
    cws = np.asarray(c.encode(msg))
    for cw in cws:
        poly = 0
        for bit in cw:  # index 0 = highest degree
            poly = (poly << 1) | int(bit)
        assert bchmod._gf2_poly_mod(poly, c.generator) == 0


# ---- decode roundtrips --------------------------------------------------------


@pytest.mark.parametrize("n,t", [(15, 2), (31, 3), (63, 3), (255, 4)])
def test_roundtrip_up_to_t_errors(n, t):
    c = BCH(n, t)
    rng = np.random.default_rng(n * 31 + t)
    msg = rng.integers(0, 2, (6, c.k)).astype(np.uint8)
    cw = np.asarray(c.encode(msg))
    for ne in range(t + 1):
        rx = cw.copy()
        for b in range(rx.shape[0]):
            pos = rng.choice(n, size=ne, replace=False)
            rx[b, pos] ^= 1
        dec, ok, nerr = c.decode(rx)
        assert np.array_equal(np.asarray(dec), msg)
        assert np.asarray(ok).all()
        assert (np.asarray(nerr) == ne).all()


def test_shortened_code_roundtrip():
    c = BCH(100, 3)  # shortened from (127, 106) -> (100, 79)
    assert c.k == 79
    rng = np.random.default_rng(5)
    msg = rng.integers(0, 2, (8, c.k)).astype(np.uint8)
    cw = np.asarray(c.encode(msg))
    rx = cw.copy()
    for b in range(8):
        rx[b, rng.choice(100, size=3, replace=False)] ^= 1
    dec, ok, nerr = c.decode(rx)
    assert np.array_equal(np.asarray(dec), msg)
    assert np.asarray(ok).all() and (np.asarray(nerr) == 3).all()


def test_over_capability_is_honest():
    # with > t errors the decoder must either flag failure or land on a
    # genuine codeword within its bounded distance t of the received word
    c = BCH(15, 2)
    rng = np.random.default_rng(11)
    msg = rng.integers(0, 2, (64, c.k)).astype(np.uint8)
    cw = np.asarray(c.encode(msg))
    rx = cw.copy()
    for b in range(64):
        rx[b, rng.choice(15, size=4, replace=False)] ^= 1
    dec, ok, _ = c.decode(rx)
    ok = np.asarray(ok)
    dec = np.asarray(dec)
    assert not ok.all()  # 4 > t errors must trip detection at least sometimes
    re = np.asarray(c.encode(dec[ok]))
    flips = (re != rx[ok]).sum(axis=-1)
    assert (flips <= c.t).all()  # ok=True always means a <=t-flip codeword


def test_leading_axes_and_jit():
    c = BCH(63, 3)
    rng = np.random.default_rng(3)
    msg = rng.integers(0, 2, (2, 5, c.k)).astype(np.uint8)
    cw = np.asarray(c.encode(msg))
    rx = cw.copy()
    rx[..., 10] ^= 1
    dec, ok, nerr = jax.jit(c.decode)(rx)
    assert dec.shape == (2, 5, c.k) and ok.shape == (2, 5)
    assert np.array_equal(np.asarray(dec), msg)
    assert np.asarray(ok).all() and (np.asarray(nerr) == 1).all()


def test_zero_errors():
    c = BCH(31, 2)
    msg = np.zeros((3, c.k), np.uint8)
    dec, ok, nerr = c.decode(np.asarray(c.encode(msg)))
    assert np.array_equal(np.asarray(dec), msg)
    assert np.asarray(ok).all() and (np.asarray(nerr) == 0).all()


def test_chase_corrects_beyond_t():
    # t+1 = 4 planted errors, two of them on the weakest LLRs: hard
    # decode must fail (or miscorrect) while Chase-2 flips the weak pair
    # in one of its test patterns, leaving t-1 errors — exact recovery
    c = BCH(63, 3)
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 2, (8, c.k)).astype(np.uint8)
    cw = np.asarray(c.encode(msg)).astype(np.float64)
    llr = (1 - 2 * cw) * 4.0
    for b in range(8):
        pos = rng.choice(63, size=4, replace=False)
        llr[b, pos] *= -1
        llr[b, pos[0]] *= 0.0125
        llr[b, pos[1]] *= 0.02
    hd, _, _ = c.decode((llr < 0).astype(np.uint8))
    assert not np.array_equal(np.asarray(hd), msg)
    sd, sok = c.decode_soft(llr.astype(np.float32), p=4)
    assert np.array_equal(np.asarray(sd), msg)
    assert np.asarray(sok).all()


def test_chase_bler_gain():
    # AWGN at a SNR where hard decoding fails ~13% of blocks: Chase-2
    # soft gain must cut BLER by well over 2x (measured ~6x)
    c = BCH(63, 3)
    rng = np.random.default_rng(1)
    B, sigma = 300, 0.55
    msg = rng.integers(0, 2, (B, c.k)).astype(np.uint8)
    cw = np.asarray(c.encode(msg)).astype(np.float64)
    y = (1 - 2 * cw) + sigma * rng.normal(size=cw.shape)
    llr = (2 * y / sigma**2).astype(np.float32)
    hd, _, _ = c.decode((llr < 0).astype(np.uint8))
    sd, _ = c.decode_soft(llr, p=4)
    hbler = (np.asarray(hd) != msg).any(axis=-1).mean()
    sbler = (np.asarray(sd) != msg).any(axis=-1).mean()
    assert hbler > 0.05  # the operating point is genuinely stressed
    assert sbler < hbler / 2


def test_chase_leading_axes_and_jit():
    c = BCH(31, 2)
    rng = np.random.default_rng(2)
    msg = rng.integers(0, 2, (3, 4, c.k)).astype(np.uint8)
    cw = np.asarray(c.encode(msg)).astype(np.float64)
    llr = ((1 - 2 * cw) * 4.0).astype(np.float32)
    dec, ok = jax.jit(lambda v: c.decode_soft(v, p=3))(llr)
    assert dec.shape == (3, 4, c.k) and ok.shape == (3, 4)
    assert np.array_equal(np.asarray(dec), msg)
    assert np.asarray(ok).all()


@pytest.mark.parametrize("n,t", [(15, 1), (31, 2), (255, 2), (100, 2)])
def test_closed_form_matches_bm(n, t):
    """The t<=2 scan-free path (S1 locator match / half-trace quadratic
    solver) must be bit-identical to the general BM+Chien pipeline on
    correctable words, and agree on the exact ok verdict for arbitrary
    junk words (bounded-distance spheres are disjoint, so any ok=True
    decode is THE unique <=t-flip codeword on both paths)."""
    import jax.numpy as jnp

    c = BCH(n, t)
    rng = np.random.default_rng(n + t)
    msg = rng.integers(0, 2, (32, c.k)).astype(np.uint8)
    cw = np.asarray(c.encode(msg)).astype(np.float32)
    rx = cw.copy()
    for b in range(32):
        ne = rng.integers(0, t + 1)
        if ne:
            rx[b, rng.choice(n, size=ne, replace=False)] += 1
    rx %= 2
    for a, b2 in zip(c._decode_closed(jnp.asarray(rx)),
                     c._decode_bm(jnp.asarray(rx))):
        assert np.array_equal(np.asarray(a), np.asarray(b2))
    junk = rng.integers(0, 2, (64, n)).astype(np.float32)
    _, ok_c, _ = c._decode_closed(jnp.asarray(junk))
    _, ok_g, _ = c._decode_bm(jnp.asarray(junk))
    assert np.array_equal(np.asarray(ok_c), np.asarray(ok_g))


def test_t2_roundtrip_and_chase():
    # the closed-form path through the public API, incl. Chase soft
    c = BCH(255, 2)
    assert c.k == 239
    rng = np.random.default_rng(9)
    msg = rng.integers(0, 2, (16, c.k)).astype(np.uint8)
    cw = np.asarray(c.encode(msg))
    rx = cw.copy()
    for b in range(16):
        rx[b, rng.choice(255, size=2, replace=False)] ^= 1
    dec, ok, nerr = c.decode(rx)
    assert np.array_equal(np.asarray(dec), msg)
    assert np.asarray(ok).all() and (np.asarray(nerr) == 2).all()
    llr = ((1 - 2.0 * cw) * 4.0).astype(np.float32)
    for b in range(16):
        pos = rng.choice(255, size=3, replace=False)
        llr[b, pos] *= -1
        llr[b, pos[0]] *= 0.02
        llr[b, pos[1]] *= 0.03
    sdec, sok = c.decode_soft(llr, p=4)
    assert np.array_equal(np.asarray(sdec), msg)
    assert np.asarray(sok).all()


def test_helper_constructions():
    assert (bchmod.bch_15_7().n, bchmod.bch_15_7().k) == (15, 7)
    assert (bchmod.bch_63_45().n, bchmod.bch_63_45().k) == (63, 45)
    c = bchmod.bch_255_t(2)
    assert (c.n, c.m) == (255, 8) and c.k == 239

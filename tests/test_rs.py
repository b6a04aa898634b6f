"""Reed-Solomon codec tests.

Encode is cross-checked against an independent textbook log-table
implementation (written here, synthetic division — the CPU idiom the
module deliberately avoids); decode is validated by exhaustive-property
roundtrips: any <= t symbol errors corrected exactly, failures flagged.
"""

import numpy as np
import pytest

from aether_primitives_tpu.ops import rs as rsmod
from aether_primitives_tpu.ops.rs import ReedSolomon, bits_to_symbols, symbols_to_bits


# ---- independent reference (log/antilog tables, synthetic division) ----------


def _ref_tables(poly=0x11D):
    exp, log = [0] * 510, [0] * 256
    v = 1
    for i in range(255):
        exp[i] = v
        log[v] = i
        v <<= 1
        if v & 0x100:
            v ^= poly
    exp[255:] = exp[:255]
    return exp, log


def _ref_mul(a, b, exp, log):
    return 0 if (a == 0 or b == 0) else exp[log[a] + log[b]]


def _ref_gen_poly(nsym, fcr, exp, log):
    g = [1]
    for i in range(nsym):
        root = exp[fcr + i]
        ng = [0] * (len(g) + 1)
        for d, c in enumerate(g):
            ng[d] ^= c
            ng[d + 1] ^= _ref_mul(c, root, exp, log)
        g = ng
    return g


def _ref_encode(msg, nsym, fcr=1):
    """Systematic RS encode, highest-degree-first symbol order."""
    exp, log = _ref_tables()
    g = _ref_gen_poly(nsym, fcr, exp, log)
    buf = list(msg) + [0] * nsym
    for i in range(len(msg)):
        c = buf[i]
        if c:
            for j in range(1, len(g)):
                buf[i + j] ^= _ref_mul(c, g[j], exp, log)
    return np.array(list(msg) + buf[-nsym:], np.uint8)


# ---- field-arithmetic building blocks ----------------------------------------


def test_gfmul_tensor_matches_tables(rng):
    code = ReedSolomon(30, 22)
    exp, log = _ref_tables()
    a = rng.integers(0, 256, 64).astype(np.uint8)
    b = rng.integers(0, 256, 64).astype(np.uint8)
    got = code._to_syms(code._gfmul(code._to_bits(a), code._to_bits(b)))
    want = np.array([_ref_mul(int(x), int(y), exp, log) for x, y in zip(a, b)])
    assert (np.asarray(got) == want).all()


def test_gfinv_all_nonzero_elements():
    code = ReedSolomon(30, 22)
    a = np.arange(1, 256, dtype=np.uint8)
    inv = code._gfinv(code._to_bits(a))
    prod = code._to_syms(code._gfmul(code._to_bits(a), inv))
    assert (np.asarray(prod) == 1).all()
    # 0^{-1} = 0 by the Fermat chain
    assert int(code._to_syms(code._gfinv(code._to_bits(np.zeros(1, np.uint8))))[0]) == 0


# ---- encode -------------------------------------------------------------------


@pytest.mark.parametrize("n,k,fcr", [(255, 223, 1), (30, 22, 1), (63, 47, 0), (20, 11, 1)])
def test_encode_matches_reference(n, k, fcr, rng):
    code = ReedSolomon(n, k, fcr=fcr)
    msg = rng.integers(0, 256, k).astype(np.uint8)
    got = np.asarray(code.encode(msg))
    want = _ref_encode(msg, n - k, fcr=fcr)
    assert (got == want).all()


def test_encode_batched(rng):
    code = ReedSolomon(30, 22)
    msgs = rng.integers(0, 256, (5, 22)).astype(np.uint8)
    got = np.asarray(code.encode(msgs))
    for i in range(5):
        assert (got[i] == _ref_encode(msgs[i], 8)).all()


def test_codeword_syndromes_zero(rng):
    code = ReedSolomon(30, 22)
    cw = code.encode(rng.integers(0, 256, 22).astype(np.uint8))
    import jax.numpy as jnp

    bits = code._to_bits(cw).reshape(30 * 8)
    synd = jnp.mod(bits @ jnp.asarray(code._synd), 2.0)
    assert (np.asarray(synd) == 0).all()


# ---- decode -------------------------------------------------------------------


@pytest.mark.parametrize("nerr", [0, 1, 2, 3, 4])
def test_decode_corrects_up_to_t(nerr, rng):
    code = ReedSolomon(30, 22)  # t = 4
    msg = rng.integers(0, 256, 22).astype(np.uint8)
    cw = np.asarray(code.encode(msg))
    pos = rng.choice(30, nerr, replace=False)
    bad = cw.copy()
    for p in pos:
        bad[p] ^= rng.integers(1, 256)
    dec, ok, ne = code.decode(bad)
    assert bool(ok)
    assert int(ne) == nerr
    assert (np.asarray(dec) == msg).all()


def test_decode_255_223_full_t(rng):
    code = rsmod.rs_255_223()
    msg = rng.integers(0, 256, 223).astype(np.uint8)
    cw = np.asarray(code.encode(msg))
    pos = rng.choice(255, 16, replace=False)  # exactly t errors
    bad = cw.copy()
    for p in pos:
        bad[p] ^= rng.integers(1, 256)
    dec, ok, ne = code.decode(bad)
    assert bool(ok) and int(ne) == 16
    assert (np.asarray(dec) == msg).all()


def test_decode_beyond_t_flagged(rng):
    code = ReedSolomon(30, 22)  # t = 4
    msg = rng.integers(0, 256, 22).astype(np.uint8)
    cw = np.asarray(code.encode(msg))
    for trial in range(4):
        bad = cw.copy()
        pos = rng.choice(30, 6, replace=False)  # t + 2 errors
        for p in pos:
            bad[p] ^= rng.integers(1, 256)
        dec, ok, ne = code.decode(bad)
        # bounded-distance decoding: either flagged, or (rare) miscorrected
        # to a *valid codeword* != the original message
        if bool(ok):
            assert not (np.asarray(dec) == msg).all()


def test_decode_batched_mixed(rng):
    code = ReedSolomon(30, 22)
    msgs = rng.integers(0, 256, (4, 22)).astype(np.uint8)
    cws = np.asarray(code.encode(msgs))
    bad = cws.copy()
    bad[1, 3] ^= 0x5A
    bad[2, 0] ^= 0x01
    bad[2, 29] ^= 0xFF
    dec, ok, ne = code.decode(bad)
    assert np.asarray(ok).all()
    assert list(np.asarray(ne)) == [0, 1, 2, 0]
    assert (np.asarray(dec) == msgs).all()


def test_decode_jittable(rng):
    import jax

    code = ReedSolomon(30, 22)
    msg = rng.integers(0, 256, 22).astype(np.uint8)
    cw = np.asarray(code.encode(msg)).copy()
    cw[5] ^= 0x42
    dec, ok, ne = jax.jit(code.decode)(cw)
    assert bool(ok) and int(ne) == 1
    assert (np.asarray(dec) == msg).all()


def test_odd_nsym(rng):
    # n - k odd: t = floor(nsym/2) still corrects t errors
    code = ReedSolomon(25, 18)  # nsym = 7, t = 3
    msg = rng.integers(0, 256, 18).astype(np.uint8)
    cw = np.asarray(code.encode(msg))
    bad = cw.copy()
    for p in rng.choice(25, 3, replace=False):
        bad[p] ^= rng.integers(1, 256)
    dec, ok, ne = code.decode(bad)
    assert bool(ok) and int(ne) == 3
    assert (np.asarray(dec) == msg).all()


def test_param_validation():
    with pytest.raises(ValueError, match="n <= 255"):
        ReedSolomon(300, 200)
    with pytest.raises(ValueError, match="n <= 255"):
        ReedSolomon(20, 20)


# ---- bit-stream bridge ---------------------------------------------------------


def test_bits_symbols_roundtrip(rng):
    syms = rng.integers(0, 256, 40).astype(np.uint8)
    bits = symbols_to_bits(syms)
    assert bits.shape == (320,)
    back = bits_to_symbols(bits)
    assert (np.asarray(back) == syms).all()
    # LSB-first convention: first 8 bits are symbol 0 LSB-first
    assert (
        np.asarray(bits[:8])
        == [(int(syms[0]) >> i) & 1 for i in range(8)]
    ).all()


def test_bits_to_symbols_rejects_ragged():
    with pytest.raises(ValueError, match="multiple of 8"):
        bits_to_symbols(np.zeros(12, np.uint8))


# ---- errors-and-erasures decoding ----------------------------------------------


def test_erasures_only_full_budget(rng):
    # rho = nsym erasures, zero errors: the full 2x budget
    code = ReedSolomon(30, 22)  # nsym = 8
    msg = rng.integers(0, 256, 22).astype(np.uint8)
    cw = np.asarray(code.encode(msg))
    pos = rng.choice(30, 8, replace=False)
    bad = cw.copy()
    mask = np.zeros(30, bool)
    for p in pos:
        bad[p] = rng.integers(0, 256)  # garbage (may even equal the truth)
        mask[p] = True
    dec, ok, ne = code.decode_erasures(bad, mask)
    assert bool(ok)
    assert (np.asarray(dec) == msg).all()


@pytest.mark.parametrize("nu,rho", [(0, 5), (1, 6), (2, 4), (3, 2), (4, 0)])
def test_mixed_errors_and_erasures(nu, rho, rng):
    # any 2*nu + rho <= nsym = 8 corrects exactly
    code = ReedSolomon(30, 22)
    msg = rng.integers(0, 256, 22).astype(np.uint8)
    cw = np.asarray(code.encode(msg))
    pos = rng.choice(30, nu + rho, replace=False)
    bad = cw.copy()
    mask = np.zeros(30, bool)
    for p in pos[:rho]:
        bad[p] = rng.integers(0, 256)
        mask[p] = True
    for p in pos[rho:]:
        bad[p] ^= rng.integers(1, 256)
    dec, ok, ne = code.decode_erasures(bad, mask)
    assert bool(ok), (nu, rho)
    assert (np.asarray(dec) == msg).all(), (nu, rho)


def test_erasures_beyond_budget_flagged(rng):
    code = ReedSolomon(30, 22)
    msg = rng.integers(0, 256, 22).astype(np.uint8)
    cw = np.asarray(code.encode(msg))
    for _ in range(3):
        bad = cw.copy()
        mask = np.zeros(30, bool)
        pos = rng.choice(30, 9, replace=False)  # 2*2 + 5 = 9 > 8
        for p in pos[:5]:
            bad[p] = rng.integers(0, 256)
            mask[p] = True
        for p in pos[5:7]:
            bad[p] ^= rng.integers(1, 256)
        dec, ok, _ = code.decode_erasures(bad, mask)
        if bool(ok):
            assert not (np.asarray(dec) == msg).all()


def test_erasures_no_flags_matches_decode(rng):
    # empty mask: identical verdict + output to the errors-only path
    code = ReedSolomon(30, 22)
    msg = rng.integers(0, 256, 22).astype(np.uint8)
    bad = np.asarray(code.encode(msg)).copy()
    for p in rng.choice(30, 4, replace=False):
        bad[p] ^= rng.integers(1, 256)
    d1, ok1, n1 = code.decode(bad)
    d2, ok2, n2 = code.decode_erasures(bad, np.zeros(30, bool))
    assert bool(ok1) and bool(ok2)
    assert int(n1) == int(n2) == 4
    assert (np.asarray(d1) == np.asarray(d2)).all()


def test_erasures_batched_255(rng):
    code = rsmod.rs_255_223()  # nsym = 32
    msgs = rng.integers(0, 256, (3, 223)).astype(np.uint8)
    cws = np.asarray(code.encode(msgs)).copy()
    masks = np.zeros((3, 255), bool)
    # row 0: 30 erasures + 1 error (2 + 30 = 32 = nsym)
    pos = rng.choice(255, 31, replace=False)
    for p in pos[:30]:
        cws[0, p] = rng.integers(0, 256)
        masks[0, p] = True
    cws[0, pos[30]] ^= rng.integers(1, 256)
    # row 1: clean; row 2: 16 plain errors
    for p in rng.choice(255, 16, replace=False):
        cws[2, p] ^= rng.integers(1, 256)
    dec, ok, ne = code.decode_erasures(cws, masks)
    assert np.asarray(ok).all()
    assert (np.asarray(dec) == msgs).all()
    assert list(np.asarray(ne)) == [31, 0, 16]


def test_erasure_mask_shape_validated():
    code = ReedSolomon(30, 22)
    with pytest.raises(ValueError, match="erasure mask"):
        code.decode_erasures(np.zeros(30, np.uint8), np.zeros(29, bool))

"""LDPC codes: GF(2) matmul encoding + batched min-sum decoding.

The modern block-code complement to :mod:`.fec`'s convolutional/Viterbi
pair (the reference has no channel coding at all — this extends the
capability surface the same way the Viterbi layer did). The design is
dictated by the hardware:

- **Encoding** is one f32 matmul mod 2 against a precomputed systematic
  generator (``u @ G``, exact: dot products sum ≤ k ones < 2^24) — the
  same GF(2)-as-matmul trick as
  :func:`~aether_primitives_tpu.ops.sequence.lfsr_matrix_generate`.
  The generator is derived host-side from the parity-check matrix by
  GF(2) Gaussian elimination, once, cached.
- **Decoding** is normalized min-sum belief propagation with the
  messages held as a DENSE ``[m, n]`` plane masked by the parity-check
  support. Sparse edge lists (the CPU/ASIC idiom) become gathers and
  segment reductions — pathological on this backend; the dense plane
  makes every iteration two masked row/column reductions and a few
  elementwise ops, all batched over codewords and fused by XLA. At
  LDPC sizes (n ~ 10^3, m ~ n/2) the dense plane is ~1 MB/codeword —
  cheap against HBM, and the batch dimension keeps the VPU full.

Code construction: :func:`make_regular_ldpc` builds a Gallager
(dv, dc)-regular ensemble with banded structure + fixed-seed column
permutations, retrying until the GF(2) rank is full so the advertised
rate is exact. Bring standard base graphs (802.11/5G QC-LDPC) via
``ldpc_generator(H)`` on any H of your own.

LLR convention matches the rest of the framework (positive = bit 0,
:func:`~.fec.hard_to_llr` / ``demod_soft``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- GF(2) host math


def _gf2_row_reduce(h: np.ndarray) -> Tuple[np.ndarray, np.ndarray, int]:
    """Row-reduce ``h`` over GF(2) with column pivoting.

    Returns ``(reduced, perm, rank)`` where ``reduced[:, perm]`` would be
    in reduced row-echelon form with the identity in the first ``rank``
    permuted columns.
    """
    h = h.copy().astype(np.uint8) % 2
    m, n = h.shape
    perm = np.arange(n)
    rank = 0
    for col in range(n):
        if rank == m:
            break
        # find a pivot row at/below `rank` in any remaining column
        sub = h[rank:, perm[col]]
        nz = np.nonzero(sub)[0]
        if nz.size == 0:
            continue
        piv = rank + nz[0]
        if piv != rank:
            h[[rank, piv]] = h[[piv, rank]]
        # swap this column into pivot position `rank`
        perm[[rank, col]] = perm[[col, rank]]
        # eliminate everywhere else
        hits = np.nonzero(h[:, perm[rank]])[0]
        hits = hits[hits != rank]
        h[hits] ^= h[rank]
        rank += 1
    return h, perm, rank


def ldpc_generator(h: np.ndarray) -> np.ndarray:
    """Systematic generator ``G [k, n]`` for parity-check ``h [m, n]``,
    ``k = n - rank(h)`` (dependent check rows — standard in structured
    ensembles — just mean a few extra info bits). Satisfies
    ``(G @ h.T) % 2 == 0``; info bits land on the non-pivot columns of
    the reduction (systematic up to a column permutation — the decoder
    returns full codewords, ``info_indices`` of the build says where the
    message bits live)."""
    g, idx = _generator_and_info(np.asarray(h, np.uint8))
    del idx
    return g


def _generator_and_info(h: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    red, perm, rank = _gf2_row_reduce(h)
    _, n = h.shape
    k = n - rank
    # reduced system: bit at perm[j] (j < rank) = sum_i P[j, i] * info_i,
    # info_i = bit at perm[rank + i]. Rows beyond `rank` are zero in the
    # reduction (dependent checks) — automatically satisfied.
    p = red[:rank][:, perm[rank:]]  # [rank, k]
    g = np.zeros((k, n), np.uint8)
    g[np.arange(k), perm[rank:]] = 1
    g[:, perm[:rank]] = p.T
    return g, perm[rank:].copy()


@functools.lru_cache(maxsize=None)
def make_regular_ldpc(
    n: int = 648, dv: int = 3, dc: int = 6, seed: int = 7
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Gallager ``(dv, dc)``-regular LDPC code: returns ``(H, G,
    info_indices)`` with ``H [m, n]`` (``m = n*dv/dc``), ``G [k, n]``,
    and the ``k`` codeword positions carrying the message bits.

    Construction: ``dv`` bands of ``m/dv`` rows; band 0 assigns variable
    ``v`` to check ``v // dc``; each further band applies a fixed-seed
    column permutation. Deterministic for a given ``(n, dv, dc, seed)``.
    Band sums are all-ones, so rank(H) ≤ m - (dv-1) by construction —
    ``k = n - rank`` is slightly above the nominal ``n - m`` (e.g. 326
    for the default 648/324 code); the dependent checks still
    participate in decoding.
    """
    if (n * dv) % dc:
        raise ValueError("n*dv must divide by dc")
    m = n * dv // dc
    if m % dv:
        raise ValueError("m must divide by dv (bands)")
    band_rows = m // dv
    if band_rows * dc != n:
        raise ValueError("inconsistent regular parameters")
    rng = np.random.default_rng(seed)
    h = np.zeros((m, n), np.uint8)
    for band in range(dv):
        cols = np.arange(n) if band == 0 else rng.permutation(n)
        for r in range(band_rows):
            h[band * band_rows + r, cols[r * dc : (r + 1) * dc]] = 1
    g, info = _generator_and_info(h)
    return h, g, info


# --------------------------------------------------------------- device codecs


def ldpc_encode(bits, g) -> jnp.ndarray:
    """Encode ``[..., k]`` message bits to ``[..., n]`` codewords: one
    f32 matmul mod 2 (exact — row sums ≤ k < 2^24). MXU-batched."""
    u = jnp.asarray(bits).astype(jnp.float32) % 2
    gm = jnp.asarray(np.asarray(g, np.float32))
    return jnp.mod(u @ gm, 2.0).astype(jnp.uint8)


def ldpc_decode(
    llrs,
    h,
    iters: int = 25,
    alpha: float = 0.75,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized min-sum decode. ``llrs [..., n]`` (positive = bit 0),
    ``h [m, n]`` (numpy 0/1). Returns ``(hard_bits [..., n],
    syndrome_ok [...])`` — ``syndrome_ok`` is True where every parity
    check is satisfied (the frame-level CRC-before-the-CRC).

    Each of ``iters`` scan steps does the full check/variable update on
    the dense masked ``[..., m, n]`` message plane:

    - check update: per-row sign product and smallest/second-smallest
      magnitude (the min-sum kernel), normalized by ``alpha`` — three
      masked row reductions;
    - variable update: per-column totals minus the incoming edge — one
      column reduction and a broadcast subtract.

    No gathers, no data-dependent control flow; everything batches over
    leading axes and fuses.
    """
    lam = jnp.asarray(llrs, jnp.float32)
    hm = np.asarray(h, np.float32)
    m, n = hm.shape
    if lam.shape[-1] != n:
        raise ValueError(f"LLR length {lam.shape[-1]} != code length {n}")
    mask = jnp.asarray(hm)  # [m, n]
    big = jnp.float32(1e30)
    lam_e = lam[..., None, :]  # [..., 1, n]
    v2c0 = lam_e * mask  # initial messages

    def bp_iter(v2c, _):
        # ---- check node update (rows)
        mag = jnp.where(mask == 1, jnp.abs(v2c), big)
        sgn = jnp.where(v2c >= 0, 1.0, -1.0)
        sgn = jnp.where(mask == 1, sgn, 1.0)
        row_sign = jnp.prod(sgn, axis=-1, keepdims=True)  # [..., m, 1]
        min1 = jnp.min(mag, axis=-1, keepdims=True)
        arg1 = jnp.argmin(mag, axis=-1)  # [..., m]
        onehot = jax.nn.one_hot(arg1, n, dtype=jnp.float32)  # [..., m, n]
        min2 = jnp.min(jnp.where(onehot == 1, big, mag), axis=-1, keepdims=True)
        ext_min = jnp.where(onehot == 1, min2, min1)
        c2v = alpha * row_sign * sgn * ext_min * mask
        # ---- variable node update (columns)
        total = lam_e + jnp.sum(c2v, axis=-2, keepdims=True)  # [..., 1, n]
        v2c_next = (total - c2v) * mask
        return v2c_next, None

    v2c, _ = jax.lax.scan(bp_iter, v2c0, None, length=int(iters))
    # final posterior from the last check update
    mag = jnp.where(mask == 1, jnp.abs(v2c), big)
    sgn = jnp.where(v2c >= 0, 1.0, -1.0)
    sgn = jnp.where(mask == 1, sgn, 1.0)
    row_sign = jnp.prod(sgn, axis=-1, keepdims=True)
    min1 = jnp.min(mag, axis=-1, keepdims=True)
    arg1 = jnp.argmin(mag, axis=-1)
    onehot = jax.nn.one_hot(arg1, n, dtype=jnp.float32)
    min2 = jnp.min(jnp.where(onehot == 1, big, mag), axis=-1, keepdims=True)
    c2v = alpha * row_sign * sgn * jnp.where(onehot == 1, min2, min1) * mask
    post = lam + jnp.sum(c2v, axis=-2)  # [..., n]
    hard = (post < 0).astype(jnp.uint8)
    syn = jnp.mod(hard.astype(jnp.float32) @ jnp.asarray(hm.T), 2.0)
    ok = jnp.all(syn == 0, axis=-1)
    return hard, ok


def extract_info(codeword_bits, info_indices) -> jnp.ndarray:
    """Pull the ``k`` message bits back out of decoded codewords
    (``info_indices`` from :func:`make_regular_ldpc`). One static
    gather on the last axis."""
    idx = jnp.asarray(np.asarray(info_indices, np.int32))
    return jnp.take(jnp.asarray(codeword_bits), idx, axis=-1)

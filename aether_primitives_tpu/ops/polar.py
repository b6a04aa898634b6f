"""Polar codes: construction, encoding, and successive-cancellation decoding.

Completes the framework's channel-coding family (convolutional/Viterbi,
turbo, LDPC, Reed-Solomon live in :mod:`.fec`, :mod:`.turbo`,
:mod:`.ldpc`, :mod:`.rs`) with the capacity-achieving code 5G NR adopted
for its control channels. The reference crate stops at uncoded PSK
(``/root/reference/src/modulation.rs``); this is new deployed-modem
surface built on the same conventions (LLR sign: positive = bit 0,
uint8 bit planes, batch-first jittable graphs).

TPU-first realizations:

- :func:`polar_encode` — the Arikan transform ``x = u · F^{⊗n}`` over
  GF(2) is ``log2(N)`` butterfly stages; each stage is one reshape + XOR
  on the whole ``[batch, N]`` plane (no bit-reversal permutation: the
  natural-order factorization ``F^{⊗n} = [[G', 0], [G', G']]`` is used
  throughout, so encoder, construction, and decoder share one indexing
  convention and no gathers are needed).
- :func:`polar_construct` — Bhattacharyya-parameter density evolution
  (host-side f64 numpy, like the LDPC/remez designers): ``z → (2z−z²,
  z²)`` doubled ``n`` times; the doubling order makes index bit ``n−1−s``
  select the stage-``s`` branch, which is exactly the natural-order SC
  recursion below, so the ``K`` smallest parameters are the information
  set with no reindexing.
- :func:`polar_decode` — min-sum successive cancellation. SC is serial
  over bit indices *by definition*, but ``N`` is static, so the decode
  tree is unrolled at trace time: a Python recursion emitting ``2N−1``
  small vectorized nodes (``f`` = sign·min, ``g`` = add/subtract,
  partial-sum XOR), every node batched over ``[batch, half]``. Frozen
  leaves are resolved at trace time from the static mask — no dynamic
  control flow anywhere. Throughput scales with batch (the turbo/BCJR
  finding, DEVNOTES: scan/serial-latency-bound kernels amortize over
  the batch axis, not the block axis).
- :func:`polar_decode_list` — CRC-aided successive-cancellation list
  (CA-SCL) decoding, the production 5G decoder, as a node-classified
  fast-SSCL: Rate-0 / REP / Rate-1 / SPC subtrees resolve in closed form
  at the subtree root (exactly SCL-equivalent under the min-sum path
  metric — verified path-for-path against the kept leaf-wise reference
  :func:`_decode_list_leafwise`), cutting (256,128) from 511 node visits
  / 128 serial ``top_k`` forks to 49 / 82. Every list-axis move
  (genealogy gathers, flip updates, reliability sorting) is expressed as
  one-hot multiply-reduces and iterative min extraction — NO
  ``take_along_axis``, no ``dynamic_update_slice``, no lane-axis
  ``top_k``, each of which is a measured ~45 µs–3 ms fusion-breaker on
  this backend (chip A/B: 16.8x at batch 64, 195x at batch 1024 over
  leaf-wise; 427 Mbit/s info — faster than flooding BP at better BLER;
  benches/results_scl_fast_r5.json).

Sizes: power-of-two ``N``; tests cover N ≤ 512. The unrolled trace is
O(N) nodes — for very large N prefer batching many codewords of
moderate N (the 5G control-channel regime) over one huge block.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def polar_construct(n: int, k: int, design_snr_db: float = 0.0) -> np.ndarray:
    """Information set of the (N=n, K=k) polar code by Bhattacharyya
    density evolution at ``design_snr_db`` (Es/N0 of the BPSK design
    channel). Returns a ``[n]`` bool mask, True = information position.

    Evolution: z₀ = exp(−Es/N0); each Arikan doubling maps
    ``z → 2z−z²`` (the degraded / ``f`` branch) and ``z → z²`` (the
    upgraded / ``g`` branch). The K smallest final parameters carry
    information; the rest are frozen to 0.
    """
    if n < 2 or (n & (n - 1)) != 0:
        raise ValueError(f"polar N must be a power of two >= 2, got {n}")
    if not 0 < k <= n:
        raise ValueError(f"need 0 < K <= N, got K={k}, N={n}")
    z = np.array([np.exp(-(10.0 ** (design_snr_db / 10.0)))], dtype=np.float64)
    while z.shape[0] < n:
        upper = 2.0 * z - z * z
        lower = z * z
        z = np.stack([upper, lower], axis=1).reshape(-1)
    info = np.zeros(n, dtype=bool)
    info[np.argsort(z, kind="stable")[:k]] = True
    return info


def _check_mask(info_mask) -> np.ndarray:
    mask = np.asarray(info_mask, dtype=bool)
    n = mask.shape[0]
    if n < 2 or (n & (n - 1)) != 0:
        raise ValueError(f"polar N must be a power of two >= 2, got {n}")
    return mask


def polar_encode(bits, info_mask) -> jnp.ndarray:
    """Encode ``[..., K]`` information bits into ``[..., N]`` codewords.

    Scatters the bits into the information positions of u (frozen
    positions = 0), then applies ``log2(N)`` butterfly XOR stages —
    stage ``s`` XORs the left half of each ``2^{s+1}``-wide block with
    its right half, smallest blocks first (the ``F^{⊗n}`` factorization
    in natural order; cross-checked against the explicit Kronecker
    matrix in tests/test_polar.py).
    """
    mask = _check_mask(info_mask)
    n = mask.shape[0]
    k = int(mask.sum())
    b = jnp.asarray(bits, jnp.uint8)
    if b.shape[-1] != k:
        raise ValueError(f"expected {k} information bits, got {b.shape[-1]}")
    lead = b.shape[:-1]
    u = jnp.zeros(lead + (n,), jnp.uint8)
    u = u.at[..., np.where(mask)[0]].set(b)
    x = u
    step = 1
    while step < n:
        blk = x.reshape(lead + (n // (2 * step), 2, step))
        left = blk[..., 0, :] ^ blk[..., 1, :]
        x = jnp.concatenate([left[..., None, :], blk[..., 1:2, :]], axis=-2)
        x = x.reshape(lead + (n,))
        step *= 2
    return x


def _f_minsum(a, b):
    # min-sum check-node update; sign via (1-2*(x<0)) so llr==0 keeps
    # magnitude 0 without jnp.sign's 0-eats-everything behavior.
    sgn = (1 - 2 * (a < 0).astype(a.dtype)) * (1 - 2 * (b < 0).astype(b.dtype))
    return sgn * jnp.minimum(jnp.abs(a), jnp.abs(b))


def polar_decode(llrs, info_mask) -> jnp.ndarray:
    """Successive-cancellation decode of ``[..., N]`` channel LLRs
    (positive = bit 0) to ``[..., K]`` hard information bits.

    The SC tree is unrolled at trace time (static N, static frozen
    mask): each internal node computes the min-sum ``f`` LLR for its
    left child, recurses, forms the ``g`` LLR ``b + (1−2·x̂_left)·a``
    from the left child's re-encoded partial sums, recurses right, and
    returns XOR-combined partial sums. Frozen leaves contribute u=0
    without touching the LLR.
    """
    mask = _check_mask(info_mask)
    n = mask.shape[0]
    llr = jnp.asarray(llrs, jnp.float32)
    if llr.shape[-1] != n:
        raise ValueError(f"expected {n} LLRs, got {llr.shape[-1]}")
    lead = llr.shape[:-1]
    flat = llr.reshape((-1, n))
    out_bits: List[jnp.ndarray] = []

    def rec(v, m):
        half = m.shape[0] // 2
        if m.shape[0] == 1:
            if not m[0]:
                return jnp.zeros_like(v, jnp.uint8)
            u = (v < 0).astype(jnp.uint8)
            out_bits.append(u)
            return u
        a, b = v[:, :half], v[:, half:]
        x_left = rec(_f_minsum(a, b), m[:half])
        g = b + (1.0 - 2.0 * x_left.astype(jnp.float32)) * a
        x_right = rec(g, m[half:])
        return jnp.concatenate([x_left ^ x_right, x_right], axis=-1)

    rec(flat, mask)
    bits = jnp.concatenate(out_bits, axis=-1)
    return bits.reshape(lead + (int(mask.sum()),))


# ---------------------------------------------------------------------------
# Belief-propagation (flooding) decoding
# ---------------------------------------------------------------------------


def polar_decode_bp(
    llrs, info_mask, iters: int = 40
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Belief-propagation decode of ``[..., N]`` channel LLRs over the
    polar factor graph: ``(info_bits [..., K], ok [...])``.

    The THROUGHPUT decoder (VERDICT r3 item 4 — the round-3 turbo study's
    conclusion applied to polar): SC/SCL is serial over bit indices by
    construction — ``2N-1`` tiny sequential node evaluations, each a
    dispatch-floor-bound step on this backend, plus a ``top_k`` per
    information leaf for the list variant — whereas BP floods the whole
    ``(log2 N + 1) x N`` message trellis with ``2 log2 N`` full-plane
    min-sum updates per iteration, every one batched over codewords.
    Exactly the LDPC min-sum shape that measured 48x over its own serial
    alternatives (DEVNOTES round 3).

    Graph: column 0 = the u (information) side, column ``n = log2 N`` =
    the x (channel) side, matching :func:`polar_encode`'s natural-order
    butterflies (stage ``s`` pairs offsets ``(j, j + 2^s)`` within
    ``2^{s+1}``-wide blocks). Each butterfly is the degree-3 kernel
    ``x1 = u1 ^ u2, x2 = u2`` with the standard message updates

    - ``L(u1) = f(L(x1), L(x2) + R(u2))``
    - ``L(u2) = f(L(x1), R(u1)) + L(x2)``
    - ``R(x1) = f(R(u1), R(u2) + L(x2))``
    - ``R(x2) = f(R(u1), L(x1)) + R(u2)``

    with ``f`` = min-sum (:func:`_f_minsum`). Frozen priors enter as a
    large positive R at column 0; one iteration = a full right-to-left L
    sweep then a left-to-right R sweep (flooding schedule), iterated a
    STATIC ``iters`` times under ``lax.scan`` — no data-dependent
    control flow.

    ``ok`` is the re-encode check: the u-side hard decision re-encoded
    must equal the x-side hard decision (the polar analog of the LDPC
    syndrome check — necessary, not sufficient, like any parity check).

    Accuracy trade-off: plain BP on the polar graph gives up ~0.5-1 dB
    vs CA-SCL at short block lengths (no CRC aid, no list) — this is the
    documented price of the ~two-orders-of-magnitude throughput gap;
    use :func:`polar_decode_list` when the link budget needs every dB
    and :func:`polar_decode_bp` when the decoder must keep up with a
    wideband stream.

    Carry layout (round-4 A/B, ``benches/polar_layout_ab.py``): the
    columns ride the scan carry as a TUPLE of ``stages+1`` separate
    ``[batch, N]`` planes, not one stacked ``[stages+1, batch, N]``
    tensor. The stacked form turns every column write into a
    ``dynamic_update_slice`` over the whole trellis; on chip the tuple
    layout measured 1.79x faster at batch 64 (51.9 -> 93.0 info
    Mbit/s) and 1.42x at batch 1024 (56.8 -> 80.4), bit-identical
    (``results_polar_layout_r4.json``).
    """
    mask = _check_mask(info_mask)
    n = mask.shape[0]
    stages = int(np.log2(n))
    llr = jnp.asarray(llrs, jnp.float32)
    if llr.shape[-1] != n:
        raise ValueError(f"expected {n} LLRs, got {llr.shape[-1]}")
    lead = llr.shape[:-1]
    flat = llr.reshape((-1, n))
    batch = flat.shape[0]
    big = jnp.float32(1e9)

    # frozen prior at the u column: huge positive LLR (bit 0), 0 for info
    r0 = jnp.broadcast_to(
        jnp.asarray(np.where(mask, 0.0, 1e9), jnp.float32), (batch, n)
    )

    def pairs(v, s):
        """[batch, n] -> (a, b) halves of stage-s butterflies (+ inverse)."""
        step = 1 << s
        blk = v.reshape(batch, n // (2 * step), 2, step)
        return blk[:, :, 0, :], blk[:, :, 1, :]

    def unpairs(a, b):
        step = a.shape[-1]
        out = jnp.stack([a, b], axis=2)
        return out.reshape(batch, -1)

    def bp_iter(carry, _):
        # tuples of [batch, n] planes (len stages+1): rebinding a slot is
        # free; a stacked [stages+1, batch, n] carry would pay a full
        # dynamic_update_slice per column write (see docstring A/B).
        l_cols, r_cols = carry
        l_cols = list(l_cols)
        r_cols = list(r_cols)
        # right-to-left: update L at column s from (L at s+1, R at s)
        for s in range(stages - 1, -1, -1):
            lx1, lx2 = pairs(l_cols[s + 1], s)
            ru1, ru2 = pairs(r_cols[s], s)
            lu1 = _f_minsum(lx1, lx2 + ru2)
            lu2 = _f_minsum(lx1, ru1) + lx2
            l_cols[s] = unpairs(lu1, lu2)
        # left-to-right: update R at column s+1 from (R at s, L at s+1)
        for s in range(stages):
            lx1, lx2 = pairs(l_cols[s + 1], s)
            ru1, ru2 = pairs(r_cols[s], s)
            rx1 = _f_minsum(ru1, ru2 + lx2)
            rx2 = _f_minsum(ru1, lx1) + ru2
            r_cols[s + 1] = unpairs(rx1, rx2)
        return (tuple(l_cols), tuple(r_cols)), None

    zeros = jnp.zeros((batch, n), jnp.float32)
    l_cols = tuple(flat if s == stages else zeros for s in range(stages + 1))
    r_cols = tuple(r0 if s == 0 else zeros for s in range(stages + 1))
    (l_cols, r_cols), _ = jax.lax.scan(
        bp_iter, (l_cols, r_cols), None, length=int(iters)
    )

    u_post = l_cols[0] + r_cols[0]
    u_hard = (u_post < 0).astype(jnp.uint8)
    x_post = l_cols[stages] + r_cols[stages]
    x_hard = (x_post < 0).astype(jnp.uint8)
    # re-encode check: polar_encode pins the frozen positions to 0
    # itself, so the info bits alone carry the whole u-side decision
    info_idx = np.where(mask)[0]
    bits = jnp.take(u_hard, jnp.asarray(info_idx), axis=-1)
    reenc = polar_encode(bits, mask)
    ok = jnp.all(reenc == x_hard, axis=-1)
    return (
        bits.reshape(lead + (int(mask.sum()),)),
        ok.reshape(lead),
    )


# ---------------------------------------------------------------------------
# CRC-aided successive-cancellation list decoding (CA-SCL)
# ---------------------------------------------------------------------------


def _decode_list_leafwise(llrs, info_mask, list_size: int = 8):
    """Leaf-wise SCL — the REFERENCE implementation for
    :func:`polar_decode_list` (kept for the equivalence tests; the
    production path is the node-classified fast decoder below).

    Maintains ``L`` candidate decoding paths. At every information leaf
    each path forks into both bit decisions; the fork disagreeing with
    the LLR sign pays ``|llr|`` path-metric penalty (min-sum PM update,
    frozen leaves penalize a negative LLR the same way), and one
    ``top_k`` prunes ``2L → L``. List-axis state in the enclosing
    recursion frames is reconciled lazily: each prune appends a
    parent-pointer row, pending tensors are gathered through the
    *composed* genealogy only at the nodes that consume them, and the
    final bit sequences are rebuilt by one static backward pass over
    the recorded (parent, bit) trail.
    """
    mask = _check_mask(info_mask)
    n = mask.shape[0]
    L = int(list_size)
    llr = jnp.asarray(llrs, jnp.float32)
    if llr.shape[-1] != n:
        raise ValueError(f"expected {n} LLRs, got {llr.shape[-1]}")
    lead = llr.shape[:-1]
    flat = llr.reshape((-1, n))
    batch = flat.shape[0]

    # Path state: everything carries a list axis [batch, L, ...].
    pm = jnp.concatenate(
        [jnp.zeros((batch, 1)), jnp.full((batch, L - 1), 1e30)], axis=1
    )  # only path 0 is alive initially
    # Genealogy: per decision leaf, (parents [batch, L] int32, bits [batch, L] u8).
    trail: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    # Epoch bookkeeping: how many prunes had happened when a tensor was made.
    n_prunes = [0]

    def align(t, made_at):
        """Gather tensor ``t`` (list axis 1) from the epoch it was made
        at to the current epoch. Parent pointers are composed first
        (cheap ``[batch, L]`` gathers), so the payload tensor is
        gathered exactly once however many prunes elapsed."""
        ps = [p for p, _ in trail[made_at:]]
        if not ps:
            return t
        comp = ps[0]
        for p in ps[1:]:
            comp = jnp.take_along_axis(comp, p, axis=1)
        return jnp.take_along_axis(
            t, comp.reshape(comp.shape + (1,) * (t.ndim - 2)), axis=1
        )

    def leaf(v, frozen):
        nonlocal pm
        # v: [batch, L, 1] leaf LLR for every live path.
        lv = v[..., 0]
        pen = jnp.abs(lv)
        if frozen:
            # u = 0 on every path; paths whose LLR says 1 pay the penalty.
            pm = pm + jnp.where(lv < 0, pen, 0.0)
            return jnp.zeros((batch, L, 1), jnp.uint8)
        # Fork: decision agreeing with the sign is free, the other pays.
        pm2 = jnp.concatenate([pm, pm + pen], axis=1)  # [batch, 2L]
        neg_pm, sel = jax.lax.top_k(-pm2, L)  # best L of 2L
        pm = -neg_pm
        parents = sel % L
        forced = sel >= L  # True → took the sign-disagreeing branch
        nat = (lv < 0).astype(jnp.uint8)  # sign-agreeing bit per old path
        bit = jnp.take_along_axis(nat, parents, axis=1) ^ forced.astype(jnp.uint8)
        trail.append((parents, bit))
        n_prunes[0] += 1
        return bit[..., None]

    def rec(v, m, made_at):
        half = m.shape[0] // 2
        if m.shape[0] == 1:
            return leaf(align(v, made_at), not bool(m[0]))
        a, b = v[..., :half], v[..., half:]
        x_left = rec(_f_minsum(a, b), m[:half], made_at)
        epoch = n_prunes[0]
        a2, b2 = align(a, made_at), align(b, made_at)
        g = b2 + (1.0 - 2.0 * x_left.astype(jnp.float32)) * a2
        x_right = rec(g, m[half:], epoch)
        x_left = align(x_left, epoch)
        return jnp.concatenate([x_left ^ x_right, x_right], axis=-1)

    v0 = jnp.broadcast_to(flat[:, None, :], (batch, L, n))
    rec(v0, mask, 0)

    # Rebuild the K bit decisions per surviving path by composing the
    # genealogy backwards: the i-th decision of path l is trail[i].bits
    # at the ancestor index of l at that epoch.
    k = int(mask.sum())
    assert len(trail) == k
    idx = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (batch, L))
    cols = []
    for parents, bit in reversed(trail):
        cols.append(jnp.take_along_axis(bit, idx, axis=1))
        idx = jnp.take_along_axis(parents, idx, axis=1)
    bits = jnp.stack(cols[::-1], axis=-1)  # [batch, L, K]
    # Sort paths best-first.
    order = jnp.argsort(pm, axis=1)
    pm = jnp.take_along_axis(pm, order, axis=1)
    bits = jnp.take_along_axis(bits, order[..., None], axis=1)
    return bits.reshape(lead + (L, k)), pm.reshape(lead + (L,))


def _butterfly_last(x):
    """Self-inverse Arikan transform over the LAST axis — the same
    smallest-blocks-first XOR stages as :func:`polar_encode`, so it maps a
    subtree's codeword bits ``x`` back to its decision bits ``u`` (and
    vice versa). Operates on exact {0, 1} f32 planes with the arithmetic
    XOR ``a + b − 2ab`` (the list decoder keeps bits as f32 so every
    list-axis move is a fusable multiply-reduce, never an integer gather).
    """
    m = x.shape[-1]
    lead = x.shape[:-1]
    step = 1
    while step < m:
        blk = x.reshape(lead + (m // (2 * step), 2, step))
        a, b = blk[..., 0, :], blk[..., 1, :]
        left = a + b - 2.0 * a * b
        x = jnp.concatenate(
            [left[..., None, :], blk[..., 1:2, :]], axis=-2
        ).reshape(lead + (m,))
        step *= 2
    return x


def polar_decode_list(llrs, info_mask, list_size: int = 8):
    """Successive-cancellation *list* decode: ``[..., N]`` LLRs →
    (``[..., K]`` bits per list path sorted best-first:
    ``[..., L, K]``, path metrics ``[..., L]``).

    Node-classified fast SCL (the Fast-SSCL decomposition): instead of
    descending to all ``N`` leaves (2N−1 node visits, K serial ``top_k``
    forks — the round-4 1.3 Mbit/s floor), special subtrees resolve in
    closed form at the subtree root, each EXACTLY equivalent to leaf-wise
    SCL under the min-sum path metric (verified path-for-path against
    :func:`_decode_list_leafwise` in tests/test_polar.py):

    - **Rate-0** (all frozen): ``pm += Σ relu(−llr)``, x = 0. No fork.
    - **REP** (single info bit, last): two hypotheses (all-zeros /
      all-ones codeword) scored by the summed disagreeing magnitudes —
      one fork for the whole subtree.
    - **Rate-1** (all info): per-path hard decisions are the ML point;
      ``min(L−1, m)`` sequential forks on the least-reliable positions
      reproduce the full SCL list (Hashemi's exactness bound), each fork
      flipping one sorted position with penalty ``|llr|``.
    - **SPC** (single parity check, first bit frozen): parity repaired at
      the least-reliable position (``pm += γ·|llr₀|``), then
      ``min(L, m−1)`` forks each flipping a sorted position *and*
      toggling the repair bit (penalty ``|llrᵢ| + (1−2s)·|llr₀|`` where
      ``s`` is the per-path repair state).

    For (256,128) this cuts 511 node visits / 128 forks to 49 / 82, and
    every surviving op stays plane-shaped over ``[batch, L, m]`` (the
    genealogy is composed lazily exactly as in the leaf-wise decoder).
    Decision bits are recovered per node as ``u = butterfly(x)`` and the
    final sequences rebuilt by one static backward pass.

    Pair with an outer CRC (:func:`~.fec.crc_append`) and pick the
    first path whose CRC checks — CA-SCL, the 5G production decoder
    (:func:`PolarCode.decode` does this when ``crc`` is set).
    """
    mask = _check_mask(info_mask)
    n = mask.shape[0]
    L = int(list_size)
    llr = jnp.asarray(llrs, jnp.float32)
    if llr.shape[-1] != n:
        raise ValueError(f"expected {n} LLRs, got {llr.shape[-1]}")
    lead = llr.shape[:-1]
    flat = llr.reshape((-1, n))
    batch = flat.shape[0]

    state = {
        "pm": jnp.concatenate(
            [jnp.zeros((batch, 1)), jnp.full((batch, L - 1), 1e30)], axis=1
        )
    }
    # Trail: one entry per info-carrying node — (one-hot parent map
    # ``P [batch, L, L]`` with ``P[b, l, k] = 1`` iff post-node path l
    # descends from pre-node path k, u bits ``[batch, L, nb]`` as exact
    # {0, 1} f32). EVERYTHING on the list axis is one-hot multiply-reduce:
    # on this backend a take_along_axis lowers to a fusion-breaking
    # ~45 µs custom gather regardless of size (the profiled cost of the
    # whole decoder was ~550 such gathers + 150 dynamic-update-slices,
    # DEVNOTES round 5), while these 8-term reduces fuse with their
    # neighbors like any elementwise op.
    trail: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    eyeL = jnp.broadcast_to(jnp.eye(L, dtype=jnp.float32), (batch, L, L))
    iota_L = jnp.arange(L, dtype=jnp.int32)

    def onehot_rows(parents):
        return (parents[..., None] == iota_L).astype(jnp.float32)

    def compose(p_old, p_new):
        """``p_new ∘ p_old``: out[b,l,k] = Σ_j p_new[b,l,j] p_old[b,j,k]."""
        return jnp.sum(
            p_new[..., :, :, None] * p_old[..., None, :, :], axis=-2
        )

    def apply_sel(p, t):
        """``t[b, parent(l), ...]`` — one-hot select along the list axis
        (exact: weights are 1.0/0.0, so the sum reproduces the selected
        value bit for bit)."""
        pr = p.reshape(p.shape + (1,) * (t.ndim - 2))
        return jnp.sum(pr * t[:, None, ...], axis=2)

    def align(t, made_at):
        ps = [p for p, _ in trail[made_at:]]
        if not ps:
            return t
        comp = ps[0]
        for p in ps[1:]:
            comp = compose(comp, p)
        return apply_sel(comp, t)

    def fork(pen_alt, base_add=None):
        """Prune 2L → L: keep-branch (optionally + base_add) vs
        alternative (+ pen_alt). Returns (one-hot parents, took_alt f32).
        The top_k runs on the tiny ``[batch, 2L]`` plane (lane-axis top_k
        at that size is ~2 µs; the big lane-axis top_k this decoder once
        used was ~3 ms per call)."""
        pm = state["pm"]
        keep = pm if base_add is None else pm + base_add
        pm2 = jnp.concatenate([keep, pm + pen_alt], axis=1)
        neg, sel = jax.lax.top_k(-pm2, L)
        state["pm"] = -neg
        return (
            onehot_rows((sel % L).astype(jnp.int32)),
            (sel >= L).astype(jnp.float32),
        )

    def node_rate0(v):
        state["pm"] = state["pm"] + jnp.sum(jnp.maximum(-v, 0.0), axis=-1)
        return jnp.zeros(v.shape, jnp.float32)

    def node_rep(v):
        pen0 = jnp.sum(jnp.maximum(-v, 0.0), axis=-1)  # all-zeros codeword
        pen1 = jnp.sum(jnp.maximum(v, 0.0), axis=-1)   # all-ones codeword
        p, took = fork(pen1, base_add=pen0)
        trail.append((p, took[..., None]))
        return jnp.broadcast_to(took[..., None], took.shape + (v.shape[-1],))

    def smallest(mag, kk):
        """The ``kk`` smallest entries of ``mag`` along the last axis, as
        (ascending values ``[..., kk]``, float positions ``[..., kk]``).

        Iterative min extraction with an iota tie-break instead of
        ``lax.top_k``: TopK over the lane axis lowers to a full sort
        (~3 ms per call at [1024, 8, 256] — measured to be ~ALL of the
        decoder's runtime), and even argmin costs 30x a plain min there;
        kk rounds of min / where-mask are ordinary fusable reductions."""
        cur = mag
        m = mag.shape[-1]
        iota = jnp.arange(m, dtype=jnp.float32)
        vals, poss = [], []
        for _ in range(kk):
            vmin = jnp.min(cur, axis=-1, keepdims=True)
            pos = jnp.min(
                jnp.where(cur == vmin, iota, jnp.float32(m)),
                axis=-1, keepdims=True,
            )
            vals.append(vmin[..., 0])
            poss.append(pos[..., 0])
            cur = jnp.where(iota == pos, jnp.float32(1e30), cur)
        return jnp.stack(vals, axis=-1), jnp.stack(poss, axis=-1)

    def fxor(a, b):
        # GF(2) XOR on exact {0,1} f32 planes
        return a + b - 2.0 * a * b

    def realign_forks(ps, tooks):
        """Each fork's took flag, re-expressed in the node's FINAL path
        basis by composing the suffix genealogy (replaces the per-fork
        carry gather + dynamic-update-slice of the flip tensor)."""
        suffix = eyeL
        flips = [None] * len(ps)
        for i in range(len(ps) - 1, -1, -1):
            flips[i] = apply_sel(suffix, tooks[i])
            suffix = compose(ps[i], suffix)
        return flips

    def node_rate1(v):
        m = v.shape[-1]
        t = min(L - 1, m)
        h = (v < 0).astype(jnp.float32)
        comp = eyeL
        if t:
            vals, pos = smallest(jnp.abs(v), t)
            ps, tooks = [], []
            for i in range(t):
                p, took = fork(apply_sel(comp, vals[..., i]))
                comp = compose(comp, p)
                ps.append(p)
                tooks.append(took)
            flips = realign_forks(ps, tooks)
            pos_al = apply_sel(comp, pos)
            iota = jnp.arange(m, dtype=jnp.float32)
            fx = jnp.zeros(h.shape, jnp.float32)
            for i in range(t):
                fx = fx + flips[i][..., None] * (
                    pos_al[..., i, None] == iota
                )
            x = fxor(apply_sel(comp, h), fx)
        else:
            x = h
        trail.append((comp, _butterfly_last(x)))
        return x

    def node_spc(v):
        m = v.shape[-1]
        t = min(L, m - 1)
        h = (v < 0).astype(jnp.float32)
        vals, pos = smallest(jnp.abs(v), t + 1)
        gamma = jnp.mod(jnp.sum(h, axis=-1), 2.0)  # parity violated?
        v0 = vals[..., 0]
        state["pm"] = state["pm"] + gamma * v0
        s = gamma  # per-path repair state: is position j0 flipped?
        comp = eyeL
        ps, tooks = [], []
        for i in range(1, t + 1):
            vi = apply_sel(comp, vals[..., i])
            v0g = apply_sel(comp, v0)
            p, took = fork(vi + (1.0 - 2.0 * s) * v0g)
            s = fxor(apply_sel(p, s), took)
            comp = compose(comp, p)
            ps.append(p)
            tooks.append(took)
        flips = realign_forks(ps, tooks)
        pos_al = apply_sel(comp, pos)  # [batch, L, t+1]
        iota = jnp.arange(m, dtype=jnp.float32)
        fx = s[..., None] * (pos_al[..., 0, None] == iota)
        for i in range(t):
            fx = fx + flips[i][..., None] * (pos_al[..., i + 1, None] == iota)
        x = fxor(apply_sel(comp, h), fx)
        u = _butterfly_last(x)
        trail.append((comp, u[..., 1:]))
        return x

    def rec(v, m, made_at):
        if not m.any():
            return node_rate0(align(v, made_at))
        if m.all():
            return node_rate1(align(v, made_at))
        if not m[:-1].any():  # only the last bit carries info
            return node_rep(align(v, made_at))
        if not m[0] and m[1:].all():
            return node_spc(align(v, made_at))
        half = m.shape[0] // 2
        a, b = v[..., :half], v[..., half:]
        x_left = rec(_f_minsum(a, b), m[:half], made_at)
        epoch = len(trail)
        a2, b2 = align(a, made_at), align(b, made_at)
        g = b2 + (1.0 - 2.0 * x_left) * a2
        x_right = rec(g, m[half:], epoch)
        x_left = align(x_left, epoch)
        return jnp.concatenate([fxor(x_left, x_right), x_right], axis=-1)

    v0 = jnp.broadcast_to(flat[:, None, :], (batch, L, n))
    rec(v0, mask, 0)

    k = int(mask.sum())
    assert sum(int(b.shape[-1]) for _, b in trail) == k
    sel = eyeL
    cols = []
    for p_e, bits_e in reversed(trail):
        cols.append(apply_sel(sel, bits_e))
        sel = compose(p_e, sel)
    bits_f = jnp.concatenate(cols[::-1], axis=-1)  # [batch, L, K]
    pm = state["pm"]
    order = jnp.argsort(pm, axis=1)
    pm = jnp.take_along_axis(pm, order, axis=1)
    bits_f = apply_sel(onehot_rows(order.astype(jnp.int32)), bits_f)
    bits = (bits_f > 0.5).astype(jnp.uint8)
    return bits.reshape(lead + (L, k)), pm.reshape(lead + (L,))


@dataclass(frozen=True)
class PolarCode:
    """A concrete (N, K) polar code: construction + codec in one object.

    ``crc``: optional CRC kind from :mod:`.fec` (e.g. ``"crc16ccitt"``).
    When set, :meth:`encode` appends the CRC inside the K information
    bits (payload is ``K − crc_width``) and :meth:`decode` runs CA-SCL,
    returning the best CRC-passing path (falling back to the best
    metric when none passes) plus a per-codeword ``ok`` flag.
    """

    n: int
    k: int
    design_snr_db: float = 0.0
    crc: str = ""
    list_size: int = 8

    def __post_init__(self):
        object.__setattr__(
            self, "info_mask", polar_construct(self.n, self.k, self.design_snr_db)
        )

    @property
    def payload_bits(self) -> int:
        if not self.crc:
            return self.k
        from . import fec as _fec

        return self.k - _fec.CRC_PARAMS[self.crc][1]

    def encode(self, bits) -> jnp.ndarray:
        if self.crc:
            from . import fec as _fec

            b = jnp.asarray(bits, jnp.uint8)
            flat = b.reshape((-1, b.shape[-1]))
            flat = jax.vmap(lambda r: _fec.crc_append(r, self.crc))(flat)
            bits = flat.reshape(b.shape[:-1] + (self.k,))
        return polar_encode(bits, self.info_mask)

    def decode(self, llrs):
        """→ ``(payload bits [..., payload_bits], ok [...] bool)``.

        Plain SC when ``crc`` is unset (ok = all-True); CA-SCL when set:
        the returned path is the best-metric CRC-passing one (path 0
        when none passes) and ``ok`` says whether any passed.
        """
        if not self.crc:
            bits = polar_decode(llrs, self.info_mask)
            return bits, jnp.ones(bits.shape[:-1], bool)
        from . import fec as _fec

        cand, _pm = polar_decode_list(llrs, self.info_mask, self.list_size)
        flat = cand.reshape((-1, self.k))
        ok = jax.vmap(lambda r: _fec.crc_check(r, self.crc))(flat)
        ok = ok.reshape(cand.shape[:-1])  # [..., L]
        # First (= best-metric, cand is sorted) CRC-passing path, else 0.
        any_ok = jnp.any(ok, axis=-1)
        pick = jnp.where(any_ok, jnp.argmax(ok, axis=-1), 0)
        bits = jnp.take_along_axis(
            cand, pick[..., None, None].astype(jnp.int32), axis=-2
        )[..., 0, :]
        return bits[..., : self.payload_bits], any_ok

    def decode_bp(self, llrs, iters: int = 40):
        """Belief-propagation decode (:func:`polar_decode_bp`) — the
        batch-throughput alternative to :meth:`decode`'s serial SC/SCL
        path (~0.5-1 dB weaker at short N, orders of magnitude faster on
        scan-latency-bound backends). Same return contract; when ``crc``
        is set, ``ok`` additionally requires the inner CRC to pass."""
        bits, ok = polar_decode_bp(llrs, self.info_mask, iters)
        if self.crc:
            from . import fec as _fec

            flat = bits.reshape((-1, self.k))
            cok = jax.vmap(lambda r: _fec.crc_check(r, self.crc))(flat)
            ok = ok & cok.reshape(bits.shape[:-1])
        return bits[..., : self.payload_bits], ok

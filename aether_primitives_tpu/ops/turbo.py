"""Turbo codes: parallel-concatenated RSC encoders + max-log-MAP (BCJR)
iterative decoding.

Completes the channel-coding family next to :mod:`.fec` (conv/Viterbi),
:mod:`.ldpc`, and :mod:`.rs` — the classic capacity-approaching code of
cellular standards. TPU shape: the BCJR forward/backward recursions are
``lax.scan``s over ``[8]``-state metric vectors (the same
vectorized-trellis idiom as :func:`~.fec.viterbi_decode`, twice), all
branch metrics precomputed as one batched elementwise pass, and the
interleaver a fixed permutation (`jnp.take`). Iterations exchange
EXTRINSIC information between the two decoders in the standard schedule.

Code: rate 1/3, two identical RSC(1, 15/13) constituents (K = 4, octal
generators 13 feedback / 15 feedforward — the LTE/CCSDS-class memory-3
workhorse), encoder 1 trellis-terminated with 3 tail pairs, encoder 2
left open (its backward recursion starts uniform). Interleaver: a fixed
seeded uniform permutation per block length.

LLR convention matches the framework: POSITIVE = bit 0
(cf. :func:`~.fec.hard_to_llr`, ``demod_soft``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "turbo_encode",
    "turbo_decode",
    "turbo_interleaver",
    "rsc_encode",
]

# RSC(1, 15/13): feedback g0 = 13 octal = 1011, feedforward g1 = 15 = 1101.
# state s = (s1, s2, s3) as the integer s1*4 + s2*2 + s3;
# a = u ^ s2 ^ s3 (feedback), p = a ^ s1 ^ s3, next = (a, s1, s2).
_K = 4
_N_STATES = 8


@functools.lru_cache(maxsize=None)
def _trellis():
    nxt = np.zeros((_N_STATES, 2), np.int64)
    par = np.zeros((_N_STATES, 2), np.int64)
    fb = np.zeros(_N_STATES, np.int64)  # feedback bit that makes a = 0
    for s in range(_N_STATES):
        s1, s2, s3 = (s >> 2) & 1, (s >> 1) & 1, s & 1
        fb[s] = s2 ^ s3
        for u in (0, 1):
            a = u ^ s2 ^ s3
            p = a ^ s1 ^ s3
            nxt[s, u] = (a << 2) | (s1 << 1) | s2
            par[s, u] = p
    # predecessor table: prev[s'][j] = (s, u) with nxt[s, u] = s' (exactly 2)
    prev_s = np.zeros((_N_STATES, 2), np.int64)
    prev_u = np.zeros((_N_STATES, 2), np.int64)
    fill = np.zeros(_N_STATES, np.int64)
    for s in range(_N_STATES):
        for u in (0, 1):
            sp = nxt[s, u]
            prev_s[sp, fill[sp]] = s
            prev_u[sp, fill[sp]] = u
            fill[sp] += 1
    assert (fill == 2).all()
    return nxt, par, fb, prev_s, prev_u


def rsc_encode(bits, terminate: bool = True):
    """Systematic recursive convolutional encode of a flat {0,1} block:
    returns ``(parity, tail_sys, tail_par)`` (the systematic stream IS the
    input). With ``terminate`` the trellis is driven back to state 0 in
    ``K-1 = 3`` steps whose (data-dependent) systematic bits are returned
    as ``tail_sys``."""
    nxt, par, fb, _, _ = _trellis()
    u = jnp.asarray(bits).astype(jnp.int32) % 2
    nxt_j = jnp.asarray(nxt)
    par_j = jnp.asarray(par)

    def step(s, ub):
        return nxt_j[s, ub], par_j[s, ub]

    s_end, parity = jax.lax.scan(step, jnp.int32(0), u)
    if not terminate:
        return parity.astype(jnp.uint8), jnp.zeros(0, jnp.uint8), jnp.zeros(0, jnp.uint8)
    fb_j = jnp.asarray(fb)

    def tstep(s, _):
        ub = fb_j[s]
        return nxt_j[s, ub], (ub, par_j[s, ub])

    _, (tail_sys, tail_par) = jax.lax.scan(tstep, s_end, None, length=_K - 1)
    return (
        parity.astype(jnp.uint8),
        tail_sys.astype(jnp.uint8),
        tail_par.astype(jnp.uint8),
    )


@functools.lru_cache(maxsize=None)
def turbo_interleaver(n: int, seed: int = 0x5EED) -> np.ndarray:
    """Fixed uniform interleaver permutation for block length ``n``."""
    return np.random.default_rng(seed ^ n).permutation(n)


def turbo_encode(bits, seed: int = 0x5EED):
    """Rate-1/3 turbo encode of ``[n]`` info bits. Returns
    ``(sys, par1, par2, tail_sys, tail_par)``: the systematic stream, the
    two constituent parity streams (``par2`` over the interleaved bits),
    and encoder 1's 3 termination pairs. Transmit all five
    (``3n + 6`` bits total)."""
    u = jnp.asarray(bits).astype(jnp.uint8) % 2
    n = int(u.shape[-1])
    perm = turbo_interleaver(n, seed)
    par1, tail_sys, tail_par = rsc_encode(u, terminate=True)
    par2, _, _ = rsc_encode(jnp.take(u, jnp.asarray(perm)), terminate=False)
    return u, par1, par2, tail_sys, tail_par


def _bcjr_maxlog(l_sys, l_par, l_apr, terminated: bool):
    """Max-log-MAP for one RSC constituent: a-posteriori LLRs (positive =
    bit 0) over the ``T`` info positions. ``l_*`` are channel/a-priori
    LLRs; with ``terminated`` the recursions pin state 0 at both ends."""
    nxt, par, _, prev_s, prev_u = _trellis()
    t_len = l_sys.shape[-1]
    # branch metric gamma[t, s, u] = 0.5*(1-2u)(Ls+La) + 0.5*(1-2p)Lp
    u_sgn = jnp.asarray(1.0 - 2.0 * np.arange(2, dtype=np.float32))  # [2]
    p_sgn = jnp.asarray((1.0 - 2.0 * par).astype(np.float32))  # [8, 2]
    lsum = (l_sys + l_apr)[:, None, None]  # [T, 1, 1]
    gamma = 0.5 * (u_sgn[None, None, :] * lsum + p_sgn[None] * l_par[:, None, None])

    neg = jnp.float32(-1e9)
    a0 = jnp.full((_N_STATES,), neg).at[0].set(0.0)
    prev_s_j = jnp.asarray(prev_s)
    prev_u_j = jnp.asarray(prev_u)
    nxt_j = jnp.asarray(nxt)

    def fwd(alpha, g_t):
        # alpha'[s'] = max_j alpha[prev_s[s',j]] + g_t[prev_s[s',j], prev_u[s',j]]
        cand = alpha[prev_s_j] + g_t[prev_s_j, prev_u_j]  # [8, 2]
        a_new = jnp.max(cand, axis=-1)
        a_new = a_new - jnp.max(a_new)  # normalize (max-log invariant)
        return a_new, alpha

    _, alphas = jax.lax.scan(fwd, a0, gamma)  # alphas[t] = alpha BEFORE step t

    b_end = a0 if terminated else jnp.zeros((_N_STATES,), jnp.float32)

    def bwd(beta, g_t):
        # beta'[s] = max_u g_t[s, u] + beta[nxt[s, u]]
        cand = g_t + beta[nxt_j]  # [8, 2]
        b_new = jnp.max(cand, axis=-1)
        b_new = b_new - jnp.max(b_new)
        return b_new, beta

    _, betas_rev = jax.lax.scan(bwd, b_end, gamma[::-1])
    betas = betas_rev[::-1]  # betas[t] = beta AFTER step t (for next state)

    # LLR[t] = max_{s} [alpha + gamma(u=0) + beta(next)] - same for u=1
    nxt0 = nxt_j[:, 0]
    nxt1 = nxt_j[:, 1]
    m0 = jnp.max(alphas + gamma[:, :, 0] + betas[:, nxt0], axis=-1)
    m1 = jnp.max(alphas + gamma[:, :, 1] + betas[:, nxt1], axis=-1)
    return m0 - m1  # positive = bit 0


def _bcjr_maxlog_windowed(l_sys, l_par, l_apr, window: int, guard: int):
    """Windowed parallel max-log-MAP — the hardware-decoder idiom: the
    block splits into ``T/window`` windows, each extended by ``guard``
    warmup steps on both sides; forward/backward recursions run over ALL
    windows in parallel (scan length ``window + 2*guard`` instead of
    ``T``), initialized uniform and converged by the warmup. Approximation
    vs the exact recursion: window-edge metrics lose the propagated state
    pinning (measured: no BER change at guard >= 16 on the test channels,
    and the tail LLRs still bias decoder 1's end states through gamma).
    """
    nxt, par, _, prev_s, prev_u = _trellis()
    t_len = int(l_sys.shape[-1])
    u_sgn = jnp.asarray(1.0 - 2.0 * np.arange(2, dtype=np.float32))
    p_sgn = jnp.asarray((1.0 - 2.0 * par).astype(np.float32))
    lsum = (l_sys + l_apr)[:, None, None]
    gamma = 0.5 * (u_sgn[None, None, :] * lsum + p_sgn[None] * l_par[:, None, None])

    n_win = -(-t_len // window)
    t_pad = n_win * window
    gp = jnp.pad(
        gamma, [(guard, guard + (t_pad - t_len)), (0, 0), (0, 0)]
    )  # neutral (uniform) branches outside the block
    lw = window + 2 * guard
    wins = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(gp, w * window, lw, axis=0)
            for w in range(n_win)
        ],
        axis=1,
    )  # [Lw, W, 8, 2]

    prev_s_j = jnp.asarray(prev_s)
    prev_u_j = jnp.asarray(prev_u)
    nxt_j = jnp.asarray(nxt)

    # ONE combined scan advances the forward recursion and the
    # time-reversed backward recursion together — half the serial scan
    # steps of two separate scans for identical output. This is the only
    # reformulation of this kernel that measured >= the two-scan baseline
    # on chip: gather radix-4, max-plus [8, 8] transition matrices, a
    # sublane-state/lane-batch radix-2^k kernel, slab framing, and
    # skipping the per-step normalization ALL measured slower
    # (DEVNOTES.md round-3 negative results).
    def step(carry, inp):  # alpha/beta [W, 8]; g [W, 8, 2]
        alpha, beta = carry
        g_t, g_rev_t = inp
        cand = alpha[:, prev_s_j] + g_t[:, prev_s_j, prev_u_j]
        a_new = jnp.max(cand, axis=-1)
        a_new = a_new - jnp.max(a_new, axis=-1, keepdims=True)
        bc = g_rev_t + beta[:, nxt_j]
        b_new = jnp.max(bc, axis=-1)
        b_new = b_new - jnp.max(b_new, axis=-1, keepdims=True)
        return (a_new, b_new), (alpha, beta)

    a0 = jnp.zeros((n_win, _N_STATES), jnp.float32)
    _, (alphas, betas_rev) = jax.lax.scan(
        step, (a0, a0), (wins, wins[::-1])
    )  # [Lw, W, 8] each
    betas = betas_rev[::-1]

    core = slice(guard, guard + window)
    g_core = wins[core]  # [window, W, 8, 2]
    a_core = alphas[core]
    b_core = betas[core]
    nxt0, nxt1 = nxt_j[:, 0], nxt_j[:, 1]
    m0 = jnp.max(a_core + g_core[..., 0] + b_core[:, :, nxt0], axis=-1)
    m1 = jnp.max(a_core + g_core[..., 1] + b_core[:, :, nxt1], axis=-1)
    llr = (m0 - m1).T.reshape(t_pad)  # [W, window] -> time order
    return llr[:t_len]


def turbo_decode(
    llr_sys,
    llr_par1,
    llr_par2,
    llr_tail_sys=None,
    llr_tail_par=None,
    iterations: int = 6,
    seed: int = 0x5EED,
    window: int = 0,
    guard: int = 24,
):
    """Iterative turbo decode. Inputs are channel LLRs (positive = bit 0)
    for the streams :func:`turbo_encode` emits; tail LLRs terminate
    decoder 1 exactly (pass None to decode open-ended). Returns
    ``(bits, llr)`` — hard decisions and final a-posteriori LLRs for the
    ``n`` info bits.

    ``window > 0`` switches both constituents to the WINDOWED parallel
    BCJR (:func:`_bcjr_maxlog_windowed`): scan length drops from ``T`` to
    ``window + 2*guard`` with the windows batched — the throughput mode
    on accelerators (measured ~15x on chip at window=128 with unchanged
    BER on the test channels); ``window = 0`` is the exact recursion."""
    ls = jnp.asarray(llr_sys, jnp.float32)
    lp1 = jnp.asarray(llr_par1, jnp.float32)
    lp2 = jnp.asarray(llr_par2, jnp.float32)
    n = int(ls.shape[-1])
    perm = jnp.asarray(turbo_interleaver(n, seed))
    inv = jnp.asarray(np.argsort(turbo_interleaver(n, seed)))
    if llr_tail_sys is not None:
        lts = jnp.asarray(llr_tail_sys, jnp.float32)
        ltp = jnp.asarray(llr_tail_par, jnp.float32)
        ls1 = jnp.concatenate([ls, lts])
        lp1e = jnp.concatenate([lp1, ltp])
        terminated = True
    else:
        ls1, lp1e = ls, lp1
        terminated = False
    ls2 = jnp.take(ls, perm)

    if window:
        def _bcjr(ls_, lp_, la_, term_):
            return _bcjr_maxlog_windowed(ls_, lp_, la_, window, guard)
    else:
        _bcjr = _bcjr_maxlog

    def one_iter(la1, _):
        la1_full = (
            jnp.concatenate([la1, jnp.zeros(ls1.shape[-1] - n, jnp.float32)])
            if ls1.shape[-1] != n
            else la1
        )
        l1 = _bcjr(ls1, lp1e, la1_full, terminated)[:n]
        ext1 = l1 - ls - la1
        la2 = jnp.take(ext1, perm)
        l2 = _bcjr(ls2, lp2, la2, False)
        ext2 = l2 - ls2 - la2
        la1_new = jnp.take(ext2, inv)
        llr_final = jnp.take(l2, inv)
        return la1_new, llr_final

    la0 = jnp.zeros(n, jnp.float32)
    _, llrs = jax.lax.scan(one_iter, la0, None, length=int(iterations))
    llr = llrs[-1]
    return (llr < 0).astype(jnp.uint8), llr

"""Resident-metric Viterbi kernel: forward ACS + in-kernel traceback.

The XLA Viterbi (:func:`~aether_primitives_tpu.ops.fec.viterbi_decode`)
pays the serial trellis twice per block — an ACS scan and a traceback
scan whose per-step work is a handful of small HBM-bound ops — and its
traceback step is a per-path dynamic gather. This kernel runs BOTH
passes over a lane tile with everything resident in VMEM: path metrics
``[S, tile]``, the per-step decision planes stored in VMEM scratch, and
the traceback as a ONE-HOT state vector advanced by pure plane
arithmetic (the feedforward trellis has ``pred[s', j] = (s' >> 1) |
(j << (K-2))``, so "follow the survivor" is an interleaved pairwise sum
— no gather anywhere).

Branch metrics come from iota, not captured tables (the round-3 Mosaic
probe rejected captured array constants): encoder output ``o_m`` of the
transition INTO state ``s'`` from predecessor half ``j`` is the parity
of ``(s' | j << (K-1)) & poly_m`` — computed per ``[S, 1]`` column once
per kernel with XOR chains over iota bits, then each step's metric is
``Σ_m o_m · llr_m[t]`` (the XLA decoder's affine-equivalent cost, kept
exactly so tie-breaks match): two broadcast FMAs per predecessor half.

Same decision rule and tie-breaks as the XLA path (``argmin`` keeps the
first of equal candidates ⇔ ``cand1 < cand0``), so outputs are
bit-identical (tests/test_pallas.py; chip A/B in
benches/viterbi_kernel_ab.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _parity_columns(polys, k, s_count):
    """Closure-free recipe executed at trace time INSIDE the kernel:
    returns a function building the ``o_m [S, 1]`` output-bit columns
    for predecessor half ``j`` from a broadcasted iota."""
    def build(j):
        iota = jax.lax.broadcasted_iota(jnp.int32, (s_count, 1), 0).astype(jnp.float32)
        cols = []
        for poly in polys:
            par = None
            for b in range(k):
                # register bit b (b=0: current input = LSB of s'; b=K-1:
                # the predecessor-half bit j) is weighted by poly bit
                # K-1-b (_poly_taps: octal generators are MSB-first)
                if not (poly >> (k - 1 - b)) & 1:
                    continue
                if b == k - 1:
                    bit = jnp.full((s_count, 1), float(j), jnp.float32)
                else:
                    bit = jnp.mod(jnp.floor(iota / float(1 << b)), 2.0)
                par = bit if par is None else par + bit - 2.0 * par * bit
            cols.append(par if par is not None
                        else jnp.zeros((s_count, 1), jnp.float32))
        return cols
    return build


def _viterbi_kernel(sym_ref, bits_ref, dec_buf, *, lw: int, n: int,
                    s_count: int, k: int, polys, init_state0: bool,
                    end_state0: bool):
    tile = sym_ref.shape[-1]
    build_cols = _parity_columns(polys, k, s_count)
    # branch cost Σ_m o_m · llr_m with o ∈ {0,1} — the XLA decoder's
    # affine-equivalent metric, kept EXACTLY (not 1−2o) so path metrics
    # and tie-breaks match bit for bit
    coef = [build_cols(j) for j in (0, 1)]

    big = jnp.float32(1e9)
    if init_state0:
        iota = jax.lax.broadcasted_iota(jnp.int32, (s_count, tile), 0).astype(jnp.float32)
        pm0 = jnp.where(iota == 0.0, 0.0, big)
    else:
        pm0 = jnp.zeros((s_count, tile), jnp.float32)

    def fwd(t, pm):
        ls = [sym_ref[pl.ds(t, 1), m, :] for m in range(n)]  # [1, tile]
        cands = []
        for j in (0, 1):
            # pred[s', j] = (s' >> 1) | (j << (K-2)): rows j*S/2 .. +S/2,
            # each repeated twice in s' order
            half = pm[j * (s_count // 2):(j + 1) * (s_count // 2), :]
            # element-wise repeat ([a, b] -> [a, a, b, b]): row s' reads
            # pm[j*S/2 + (s' >> 1)]
            rep = jnp.broadcast_to(
                half[:, None, :], (s_count // 2, 2, tile)
            ).reshape(s_count, tile)
            g = None
            for m in range(n):
                term = coef[j][m] * ls[m]
                g = term if g is None else g + term
            cands.append(rep + g)
        c0, c1 = cands
        dec = (c1 < c0)
        pm_new = jnp.minimum(c0, c1)
        pm_new = pm_new - jnp.min(pm_new, axis=0, keepdims=True)
        dec_buf[t] = dec.astype(jnp.uint8)  # u8: the decision history is
        # the VMEM budget driver (lw * S * tile bytes)
        return pm_new

    pm = jax.lax.fori_loop(0, lw, fwd, pm0)

    # traceback start: state 0 (terminated full block) or per-lane argmin
    if end_state0:
        iota = jax.lax.broadcasted_iota(jnp.int32, (s_count, tile), 0).astype(jnp.float32)
        oh0 = (iota == 0.0).astype(jnp.float32)
    else:
        iota = jax.lax.broadcasted_iota(jnp.int32, (s_count, tile), 0).astype(jnp.float32)
        pmin = jnp.min(pm, axis=0, keepdims=True)
        first = jnp.min(
            jnp.where(pm == pmin, iota, jnp.float32(s_count)),
            axis=0, keepdims=True,
        )
        oh0 = (iota == first).astype(jnp.float32)

    odd = jnp.mod(
        jax.lax.broadcasted_iota(jnp.int32, (s_count, tile), 0)
        .astype(jnp.float32), 2.0)

    def bwd(i, oh):
        t = lw - 1 - i
        # Mosaic has no direct u8->f32 cast; widen through int32
        dec = dec_buf[t].astype(jnp.int32).astype(jnp.float32)  # [S, tile]
        bit = jnp.sum(oh * odd, axis=0, keepdims=True)
        bits_ref[pl.ds(t, 1), :] = bit.astype(jnp.float32)
        # survivor move: prev = (s >> 1) | (dec[s] << (K-2)); inverse map:
        # prev_oh[p] sums oh over s in {2q, 2q+1} (q = p mod S/2) whose
        # decision matches p's top bit — interleaved pairwise sums
        a = (oh * dec).reshape(s_count // 2, 2, tile)
        b = (oh * (1.0 - dec)).reshape(s_count // 2, 2, tile)
        top = jnp.sum(a, axis=1)    # decisions == 1 -> p >= S/2
        bot = jnp.sum(b, axis=1)    # decisions == 0 -> p <  S/2
        return jnp.concatenate([bot, top], axis=0)

    jax.lax.fori_loop(0, lw, bwd, oh0)


@functools.partial(
    jax.jit,
    static_argnames=("lw", "n", "polys", "constraint", "init_state0",
                     "end_state0", "tile_n", "interpret"),
)
def viterbi_lanes(sym, lw: int, n: int, polys, constraint: int,
                  init_state0: bool, end_state0: bool,
                  tile_n: int = 256, interpret: bool = False):
    """Decode ``sym [Lw, n, N]`` LLR spans (independent trellises on the
    lane axis, padded by the caller to a tile multiple) → hard bits
    ``[Lw, N]`` f32 {0,1} (f32 out: per-bit u8 emission relayouts are
    the measured pathology this framework avoids — DEVNOTES r5)."""
    k = int(constraint)
    s_count = 1 << (k - 1)
    if sym.shape[0] != lw or sym.shape[1] != n:
        raise ValueError(f"bad span shape {sym.shape} for Lw={lw}, n={n}")
    n_lanes = sym.shape[2]
    # clamp the lane tile to the ~12 MB VMEM budget (the PFB fold's rule):
    # decisions lw*S bytes + spans/out lw*(n+1)*4 bytes per lane
    per_lane = lw * s_count + lw * (n + 1) * 4
    tile_fit = max(128, (12_000_000 // per_lane) // 128 * 128)
    tile_n = min(tile_n, tile_fit)
    if lw * s_count * 128 > 12_000_000:
        raise ValueError(
            f"trellis of {lw} steps x {s_count} states cannot fit VMEM "
            "even at tile 128 — use the windowed decoder"
        )
    if n_lanes % tile_n:
        raise ValueError(f"N={n_lanes} must divide by tile_n={tile_n}")
    kernel = functools.partial(
        _viterbi_kernel, lw=lw, n=n, s_count=s_count, k=k,
        polys=tuple(int(p) for p in polys),
        init_state0=bool(init_state0), end_state0=bool(end_state0),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((lw, n_lanes), jnp.float32),
        grid=(n_lanes // tile_n,),
        in_specs=[
            pl.BlockSpec((lw, n, tile_n), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lw, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((lw, s_count, tile_n), jnp.uint8),
        ],
        interpret=interpret,
    )(sym)

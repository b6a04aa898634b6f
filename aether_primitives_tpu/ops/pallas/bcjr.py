"""Resident-metric windowed BCJR kernel for the turbo decoder.

The XLA realization (:func:`~aether_primitives_tpu.ops.turbo.
_bcjr_maxlog_windowed`) re-reads its ``[8, W, B]`` state planes from HBM
for every one of the ~34 small ops in every one of the ``window +
2*guard`` scan steps, and materializes the full ``[Lw, 8, W, B]``
alpha/beta histories — measured HBM-traffic-bound at large batch (b1024:
34.5 ms vs b256's 4.7, benches/results_turbo_r5.json). This kernel keeps
everything resident in VMEM: each grid program owns a lane tile of the
flattened ``window x batch`` axis, runs the backward recursion once
(storing its 8-state beta plane history in VMEM scratch, ~3 MB at
tile 1024), then the forward recursion emits a-posteriori LLRs on the
fly — HBM traffic collapses to one read of the two LLR streams and one
write of the output.

Trellis structure enters as TRACE-TIME scalar coefficients (the
:func:`~aether_primitives_tpu.ops.turbo._step_coeffs` tables — plain
Python floats, so the step body is static row slices + FMA + max; the
round-3 Pallas probe failed on captured array constants and dynamic lane
gathers, neither of which appears here). Max-log arithmetic is the same
expression tree as the XLA path, so outputs match bit for bit (asserted
in tests/test_pallas.py and on chip in benches/turbo_batch_ab.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _bcjr_kernel(ls_ref, lp_ref, llr_ref, beta_buf, *, lw: int,
                 s_count: int, nxt, prev_s, fw0, fw1, bw0, bw1):
    # Trellis-generic: fw{0,1}[s'][j] weight streams 0/1 on the forward
    # transition INTO s' via predecessor slot j; bw{0,1}[s][u] weight them
    # on the transition FROM s with input u (also the completion step).
    # The RSC-8 turbo trellis and the feedforward conv trellises are both
    # instances (ops/turbo._step_coeffs / ops/fec._conv_soft_coeffs).
    n = ls_ref.shape[-1]

    def bwd(i, beta):
        t = lw - 1 - i
        beta_buf[t] = beta  # beta AFTER step t (metrics from steps > t)
        ls_t = ls_ref[pl.ds(t, 1), :]  # [1, n]
        lp_t = lp_ref[pl.ds(t, 1), :]
        b_new = jnp.concatenate([
            jnp.maximum(
                beta[nxt[s][0]:nxt[s][0] + 1, :]
                + (bw0[s][0] * ls_t + bw1[s][0] * lp_t),
                beta[nxt[s][1]:nxt[s][1] + 1, :]
                + (bw0[s][1] * ls_t + bw1[s][1] * lp_t),
            )
            for s in range(s_count)
        ], axis=0)
        return b_new - jnp.max(b_new, axis=0, keepdims=True)

    jax.lax.fori_loop(0, lw, bwd, jnp.zeros((s_count, n), jnp.float32))

    def fwd(t, alpha):
        ls_t = ls_ref[pl.ds(t, 1), :]
        lp_t = lp_ref[pl.ds(t, 1), :]
        beta_t = beta_buf[t]  # [S, n]
        m0 = m1 = None
        for s in range(s_count):
            c0 = (alpha[s:s + 1, :] + (bw0[s][0] * ls_t + bw1[s][0] * lp_t)
                  + beta_t[nxt[s][0]:nxt[s][0] + 1, :])
            c1 = (alpha[s:s + 1, :] + (bw0[s][1] * ls_t + bw1[s][1] * lp_t)
                  + beta_t[nxt[s][1]:nxt[s][1] + 1, :])
            m0 = c0 if m0 is None else jnp.maximum(m0, c0)
            m1 = c1 if m1 is None else jnp.maximum(m1, c1)
        llr_ref[pl.ds(t, 1), :] = m0 - m1
        a_new = jnp.concatenate([
            jnp.maximum(
                alpha[prev_s[sp][0]:prev_s[sp][0] + 1, :]
                + (fw0[sp][0] * ls_t + fw1[sp][0] * lp_t),
                alpha[prev_s[sp][1]:prev_s[sp][1] + 1, :]
                + (fw0[sp][1] * ls_t + fw1[sp][1] * lp_t),
            )
            for sp in range(s_count)
        ], axis=0)
        return a_new - jnp.max(a_new, axis=0, keepdims=True)

    jax.lax.fori_loop(0, lw, fwd, jnp.zeros((s_count, n), jnp.float32))


def _rsc8_tables():
    """Coefficient tables for the turbo RSC-8 trellis in the generic
    (fw0, fw1, bw0, bw1) form."""
    from ..turbo import _step_coeffs

    nxt, prev_s, cu, cp, du, dp = _step_coeffs()
    s_count = nxt.shape[0]
    bw0 = np.broadcast_to(np.asarray(du)[None, :], (s_count, 2))
    return (
        tuple(map(tuple, nxt.tolist())),
        tuple(map(tuple, prev_s.tolist())),
        tuple(map(tuple, cu.tolist())),
        tuple(map(tuple, cp.tolist())),
        tuple(map(tuple, bw0.tolist())),
        tuple(map(tuple, np.asarray(dp).tolist())),
    )


@functools.partial(
    jax.jit, static_argnames=("lw", "tables", "tile_n", "interpret")
)
def bcjr_windowed_llr(ls, lp, lw: int, tables=None, tile_n: int = 512,
                      interpret: bool = False):
    """Per-position max-log a-posteriori LLRs for the windowed BCJR.

    ``ls, lp [Lw, N]``: the two LLR streams' spans, windows flattened
    onto the lane axis (``N = n_windows * batch``, padded by the caller
    to a multiple of ``tile_n``). ``tables``: the trellis as hashable
    ``(nxt, prev_s, fw0, fw1, bw0, bw1)`` coefficient tuples (None = the
    turbo RSC-8 trellis). Returns ``[Lw, N]`` — the core slice /
    reassembly stays in XLA. Uniform (all-zero) initial metrics at both
    ends, exactly the windowed contract.
    """
    if tables is None:
        tables = _rsc8_tables()
    nxt, prev_s, fw0, fw1, bw0, bw1 = tables
    s_count = len(nxt)
    if ls.shape != lp.shape or ls.shape[0] != lw:
        raise ValueError(f"bad spans {ls.shape} {lp.shape} for Lw={lw}")
    n = ls.shape[1]
    # clamp the lane tile to the ~12 MB VMEM budget (beta history
    # lw * S * tile * 4 bytes dominates; K=7 soft decodes have S=64)
    per_lane = lw * s_count * 4 + lw * 3 * 4
    tile_fit = max(128, (12_000_000 // per_lane) // 128 * 128)
    tile_n = min(tile_n, tile_fit)
    if lw * s_count * 128 * 4 > 12_000_000:
        raise ValueError(
            f"{lw} steps x {s_count} states cannot fit VMEM at tile 128 "
            "— shrink the window"
        )
    if n % tile_n:
        raise ValueError(f"N={n} must divide by tile_n={tile_n}")
    kernel = functools.partial(
        _bcjr_kernel, lw=lw, s_count=s_count,
        nxt=nxt, prev_s=prev_s, fw0=fw0, fw1=fw1, bw0=bw0, bw1=bw1,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((lw, n), jnp.float32),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((lw, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lw, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lw, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((lw, s_count, tile_n), jnp.float32),
        ],
        interpret=interpret,
    )(ls, lp)

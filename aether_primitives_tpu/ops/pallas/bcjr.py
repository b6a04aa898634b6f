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

_N_STATES = 8


def _bcjr_kernel(ls_ref, lp_ref, llr_ref, beta_buf, *, lw: int,
                 nxt, prev_s, cu, cp, du, dp):
    n = ls_ref.shape[-1]

    def bwd(i, beta):
        t = lw - 1 - i
        beta_buf[t] = beta  # beta AFTER step t (metrics from steps > t)
        ls_t = ls_ref[pl.ds(t, 1), :]  # [1, n]
        lp_t = lp_ref[pl.ds(t, 1), :]
        b_new = jnp.concatenate([
            jnp.maximum(
                beta[nxt[s][0]:nxt[s][0] + 1, :]
                + (du[0] * ls_t + dp[s][0] * lp_t),
                beta[nxt[s][1]:nxt[s][1] + 1, :]
                + (du[1] * ls_t + dp[s][1] * lp_t),
            )
            for s in range(_N_STATES)
        ], axis=0)
        return b_new - jnp.max(b_new, axis=0, keepdims=True)

    jax.lax.fori_loop(0, lw, bwd, jnp.zeros((_N_STATES, n), jnp.float32))

    def fwd(t, alpha):
        ls_t = ls_ref[pl.ds(t, 1), :]
        lp_t = lp_ref[pl.ds(t, 1), :]
        beta_t = beta_buf[t]  # [8, n]
        m0 = m1 = None
        for s in range(_N_STATES):
            c0 = (alpha[s:s + 1, :] + (du[0] * ls_t + dp[s][0] * lp_t)
                  + beta_t[nxt[s][0]:nxt[s][0] + 1, :])
            c1 = (alpha[s:s + 1, :] + (du[1] * ls_t + dp[s][1] * lp_t)
                  + beta_t[nxt[s][1]:nxt[s][1] + 1, :])
            m0 = c0 if m0 is None else jnp.maximum(m0, c0)
            m1 = c1 if m1 is None else jnp.maximum(m1, c1)
        llr_ref[pl.ds(t, 1), :] = m0 - m1
        a_new = jnp.concatenate([
            jnp.maximum(
                alpha[prev_s[sp][0]:prev_s[sp][0] + 1, :]
                + (cu[sp][0] * ls_t + cp[sp][0] * lp_t),
                alpha[prev_s[sp][1]:prev_s[sp][1] + 1, :]
                + (cu[sp][1] * ls_t + cp[sp][1] * lp_t),
            )
            for sp in range(_N_STATES)
        ], axis=0)
        return a_new - jnp.max(a_new, axis=0, keepdims=True)

    jax.lax.fori_loop(0, lw, fwd, jnp.zeros((_N_STATES, n), jnp.float32))


@functools.partial(jax.jit, static_argnames=("lw", "tile_n", "interpret"))
def bcjr_windowed_llr(ls, lp, lw: int, tile_n: int = 512,
                      interpret: bool = False):
    """Per-position max-log a-posteriori LLRs for the windowed BCJR.

    ``ls, lp [Lw, N]``: systematic+a-priori and parity LLR spans, windows
    flattened onto the lane axis (``N = n_windows * batch``, padded by the
    caller to a multiple of ``tile_n``). Returns ``[Lw, N]`` — the core
    slice / reassembly stays in XLA. Uniform (all-zero) initial metrics at
    both ends, exactly the windowed contract.
    """
    from ..turbo import _step_coeffs

    nxt, prev_s, cu, cp, du, dp = _step_coeffs()
    if ls.shape != lp.shape or ls.shape[0] != lw:
        raise ValueError(f"bad spans {ls.shape} {lp.shape} for Lw={lw}")
    n = ls.shape[1]
    if n % tile_n:
        raise ValueError(f"N={n} must divide by tile_n={tile_n}")
    kernel = functools.partial(
        _bcjr_kernel, lw=lw,
        nxt=tuple(map(tuple, nxt.tolist())),
        prev_s=tuple(map(tuple, prev_s.tolist())),
        cu=tuple(map(tuple, cu.tolist())),
        cp=tuple(map(tuple, cp.tolist())),
        du=tuple(du.tolist()),
        dp=tuple(map(tuple, dp.tolist())),
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
            pltpu.VMEM((lw, _N_STATES, tile_n), jnp.float32),
        ],
        interpret=interpret,
    )(ls, lp)

"""Resident-tile WOLA fold for the oversampled polyphase filterbank.

The XLA realization of the os-PFB analysis fold
(:func:`~aether_primitives_tpu.models.channelizer.pfb_channelize_os`)
performs ``P * os`` full-tensor slice-multiply-add passes — measured
fold-traffic-bound at 462 Msa/s on chip (os=2, P=16; DEVNOTES.md round-2),
an order of magnitude under the critically sampled bank. This kernel keeps
the overlapped input slab RESIDENT in VMEM: each grid program DMAs the
``(tile_t + P - 1) * M`` samples its ``tile_t`` output frames need ONCE
from HBM, then runs all ``P`` branch multiply-adds against VMEM. HBM
traffic drops from ``P * os`` input passes to ``~1.2 * os`` (the
``(P-1)/tile_t`` tile overlap), plus one output write.

Layout: split f32 planes (Pallas has no complex dtype), prototype branches
``hb [P, M]`` real (root-Nyquist designs are), frames ``M`` wide on lanes.
The per-class absolute-time reference roll ``(j * hop) % M`` happens
in-kernel on the VMEM tile (static per class, unrolled over ``os``).

Generalizes the reference's chunked-FFT waterfall prototype
(``/root/reference/src/util/plot.rs:59-62``) the same way the XLA fold
does — this file only changes WHERE the fold's operands live.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_kernel(xr_ref, xi_ref, hb_ref, or_ref, oi_ref, *,
                 hop: int, m: int, p: int, tile_t: int, os: int):
    j = pl.program_id(0)  # oversampling class
    i = pl.program_id(1)  # frame tile within the class

    def body(sr, si, sem):
        span = (tile_t + p - 1) * m
        start = j * hop + i * (tile_t * m)
        cp_r = pltpu.make_async_copy(
            xr_ref.at[pl.ds(start, span)], sr, sem.at[0]
        )
        cp_i = pltpu.make_async_copy(
            xi_ref.at[pl.ds(start, span)], si, sem.at[1]
        )
        cp_r.start()
        cp_i.start()
        cp_r.wait()
        cp_i.wait()

        acc_r = jnp.zeros((tile_t, m), jnp.float32)
        acc_i = jnp.zeros((tile_t, m), jnp.float32)
        for pi in range(p):
            w = hb_ref[pi, :]  # [m] real prototype branch
            xr_t = sr[pl.ds(pi * m, tile_t * m)].reshape(tile_t, m)
            xi_t = si[pl.ds(pi * m, tile_t * m)].reshape(tile_t, m)
            acc_r = acc_r + xr_t * w
            acc_i = acc_i + xi_t * w

        # absolute-time reference roll: constant (j*hop) % m per class
        for jj in range(os):
            a = (jj * hop) % m

            @pl.when(j == jj)
            def _(a=a, acc_r=acc_r, acc_i=acc_i):
                if a:
                    acc_r = jnp.concatenate(
                        [acc_r[:, m - a:], acc_r[:, : m - a]], axis=1
                    )
                    acc_i = jnp.concatenate(
                        [acc_i[:, m - a:], acc_i[:, : m - a]], axis=1
                    )
                or_ref[0] = acc_r
                oi_ref[0] = acc_i

    pl.run_scoped(
        body,
        sr=pltpu.VMEM(((tile_t + p - 1) * m,), jnp.float32),
        si=pltpu.VMEM(((tile_t + p - 1) * m,), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(
    jax.jit, static_argnames=("os", "t_cls", "tile_t", "interpret")
)
def pfb_fold_os(x_re, x_im, hb, os: int, t_cls: int,
                tile_t: int = 64, interpret: bool = False):
    """Oversampled-PFB analysis fold on split planes.

    ``x_re/x_im``: flat f32 samples, already padded so every class tile's
    span exists (the caller pads; see the length requirement below).
    ``hb``: ``[P, M]`` real f32 prototype branches. Returns
    ``(out_re, out_im)`` of shape ``[os, t_cls, M]`` — class ``j`` holds
    frames ``t = i*os + j`` with the class reference roll applied, i.e.
    exactly the per-class tensors the XLA path stacks.

    Required input length: ``(os-1)*hop + (t_cls_pad - 1 + P)*M`` where
    ``t_cls_pad`` rounds ``t_cls`` up to ``tile_t``.
    """
    p, m = hb.shape
    hop = m // os
    n_t = -(-t_cls // tile_t)
    t_pad = n_t * tile_t
    need = (os - 1) * hop + (t_pad - 1 + p) * m
    if x_re.shape[-1] < need:
        raise ValueError(f"input too short: {x_re.shape[-1]} < {need}")

    kernel = functools.partial(
        _fold_kernel, hop=hop, m=m, p=p, tile_t=tile_t, os=os
    )
    out_block = pl.BlockSpec(
        (1, tile_t, m), lambda j, i: (j, i, 0), memory_space=pltpu.VMEM
    )
    out_r, out_i = pl.pallas_call(
        kernel,
        grid=(os, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(out_block, out_block),
        out_shape=(
            jax.ShapeDtypeStruct((os, t_pad, m), jnp.float32),
            jax.ShapeDtypeStruct((os, t_pad, m), jnp.float32),
        ),
        interpret=interpret,
    )(x_re, x_im, hb)
    return out_r[:, :t_cls], out_i[:, :t_cls]

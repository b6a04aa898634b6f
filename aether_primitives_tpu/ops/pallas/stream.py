"""Double-buffered HBM streaming kernel.

The Pallas realization of the reference's pool/pipeline steady state
(SURVEY.md §3.4): a long capture stays in HBM; chunks DMA into a two-slot
VMEM ring while the previous chunk computes — the on-chip analog of the
pool's checkout/return cycle with the mpsc hop replaced by an async copy.

The compute payload here is the fused complex multiply-accumulate used by
the correlator's spectrum stage; the structure (warm-up DMA, overlap, wait,
process) is the template for any streaming stage whose block is too big for
a single VMEM residency.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BUFFERS = 2


def _stream_kernel(
    xr_hbm, xi_hbm, rr_vmem, ri_vmem, or_hbm, oi_hbm,
    scratch, sems, out_scratch, out_sems, *, chunk_rows: int, n_chunks: int
):
    """out = x * r (complex), x streamed HBM->VMEM in double-buffered chunks.

    ``x``/``out``: [rows, lanes] in HBM; ``r``: [chunk_rows, lanes]
    broadcast per chunk (resident in VMEM).
    """

    def get_in_dma(slot, idx):
        return pltpu.make_async_copy(
            xr_hbm.at[pl.ds(idx * chunk_rows, chunk_rows), :],
            scratch.at[slot, 0],
            sems.at[slot, 0],
        ), pltpu.make_async_copy(
            xi_hbm.at[pl.ds(idx * chunk_rows, chunk_rows), :],
            scratch.at[slot, 1],
            sems.at[slot, 1],
        )

    def get_out_dma(slot, idx):
        return pltpu.make_async_copy(
            out_scratch.at[slot, 0],
            or_hbm.at[pl.ds(idx * chunk_rows, chunk_rows), :],
            out_sems.at[slot, 0],
        ), pltpu.make_async_copy(
            out_scratch.at[slot, 1],
            oi_hbm.at[pl.ds(idx * chunk_rows, chunk_rows), :],
            out_sems.at[slot, 1],
        )

    # warm up: start chunk 0 inbound
    for dma in get_in_dma(0, 0):
        dma.start()

    def body(idx, _):
        slot = idx % N_BUFFERS
        nxt = (idx + 1) % N_BUFFERS

        @pl.when(idx + 1 < n_chunks)
        def _():
            for dma in get_in_dma(nxt, idx + 1):
                dma.start()

        for dma in get_in_dma(slot, idx):
            dma.wait()

        # previous outbound from this slot must have drained before reuse
        @pl.when(idx >= N_BUFFERS)
        def _():
            for dma in get_out_dma(slot, idx - N_BUFFERS):
                dma.wait()

        ar = scratch[slot, 0]
        ai = scratch[slot, 1]
        br = rr_vmem[:]
        bi = ri_vmem[:]
        out_scratch[slot, 0] = ar * br - ai * bi
        out_scratch[slot, 1] = ar * bi + ai * br
        for dma in get_out_dma(slot, idx):
            dma.start()
        return ()

    jax.lax.fori_loop(0, n_chunks, body, ())
    # drain the tail
    for idx in range(max(n_chunks - N_BUFFERS, 0), n_chunks):
        for dma in get_out_dma(idx % N_BUFFERS, idx):
            dma.wait()


@functools.partial(jax.jit, static_argnames=("chunk_rows", "interpret"))
def streamed_cmul(xr, xi, rr, ri, chunk_rows: int = 256, interpret: bool = False):
    """``x * r`` over a [rows, lanes] block, streamed through VMEM.

    ``x`` ([rows, lanes] split planes) stays in HBM; ``r`` ([chunk_rows,
    lanes]) is VMEM-resident and reused for every chunk (rows must divide by
    chunk_rows). Returns split planes. Equivalent jnp reference:
    ``x * tile(r)``.
    """
    rows, lanes = xr.shape
    if rows % chunk_rows:
        raise ValueError(f"rows {rows} not divisible by chunk_rows {chunk_rows}")
    vmem_bytes = (2 * N_BUFFERS * 2 + 2) * chunk_rows * lanes * 4
    if vmem_bytes > 12 * 1024 * 1024:
        raise ValueError(
            f"chunk_rows {chunk_rows} x lanes {lanes} needs ~{vmem_bytes >> 20} MiB "
            "of VMEM scratch (limit ~12); use a smaller chunk"
        )
    n_chunks = rows // chunk_rows
    kernel = functools.partial(
        _stream_kernel, chunk_rows=chunk_rows, n_chunks=n_chunks
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x re (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # x im (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r re
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r im
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N_BUFFERS, 2, chunk_rows, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUFFERS, 2)),
            pltpu.VMEM((N_BUFFERS, 2, chunk_rows, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUFFERS, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(xr, xi, rr, ri)
    return out


def streamed_cmul_reference(xr, xi, rr, ri):
    """jnp reference: chunk-broadcast complex multiply."""
    rows = xr.shape[0]
    reps = rows // rr.shape[0]
    br = jnp.tile(rr, (reps, 1))
    bi = jnp.tile(ri, (reps, 1))
    return xr * br - xi * bi, xr * bi + xi * br

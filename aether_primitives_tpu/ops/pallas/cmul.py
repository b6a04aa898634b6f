"""Fused complex element-wise kernels on split re/im planes.

The VecOps chains the reference composes (``vec_mul`` + ``vec_scale`` +
``vec_conj``; e.g. the correlator's spectrum multiply,
reference benches/benches.rs:410-416) are element-wise and HBM-bound: the
only thing that matters is touching HBM once. XLA usually fuses these; this
kernel guarantees it — one pass, tiled through VMEM — and is the template
for adding further fused stages (window + twiddle, spectrum x conj, etc.).

Exposed ops:

- :func:`cmul` — ``out = a * b`` (optionally ``conj(b)``) ``* scale`` in a
  single pass; split-plane signature, grid-tiled over rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cmul_kernel(ar, ai, br, bi, or_, oi, *, conj_b: bool, scale: float):
    a_re, a_im = ar[:], ai[:]
    b_re, b_im = br[:], bi[:]
    if conj_b:
        b_im = -b_im
    s = jnp.float32(scale)
    or_[:] = (a_re * b_re - a_im * b_im) * s
    oi[:] = (a_re * b_im + a_im * b_re) * s


def _row_tiles(shape, vmem_budget_bytes: int = 6 * 1024 * 1024):
    """Choose a row-tile: full rows, last dim untouched (lane dim).

    The tile must fit 6 buffers (4 in + 2 out) double-buffered by the
    pipeline in VMEM (~16 MB); budget conservatively so large lane counts
    don't blow the compile (observed: 2048-lane x 256-row tiles -> Mosaic
    compile failure).
    """
    if len(shape) == 1:
        return None  # small 1-D: whole-array kernel
    rows = int(np.prod(shape[:-1]))
    lanes = shape[-1]
    per_row = lanes * 4 * 6 * 2  # f32, 6 buffers, double-buffered
    tile = min(rows, vmem_budget_bytes // per_row, 256)
    if tile < 1:
        raise ValueError(
            f"lane count {lanes} needs more than the ~{vmem_budget_bytes >> 20} MiB "
            "VMEM budget even at one row per tile; reshape to fewer lanes"
        )
    while rows % tile:
        tile -= 1
    return rows, tile, lanes


@functools.partial(jax.jit, static_argnames=("conj_b", "scale", "interpret"))
def cmul(a_re, a_im, b_re, b_im, conj_b: bool = False, scale: float = 1.0,
         interpret: bool = False):
    """Fused ``(a * b[conj]) * scale`` on split planes, one HBM pass.

    All four inputs share a shape; returns ``(out_re, out_im)``.
    """
    shape = a_re.shape
    kernel = functools.partial(_cmul_kernel, conj_b=conj_b, scale=scale)
    dims = _row_tiles(shape)
    if dims is None:
        specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        out_specs = (
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        grid = ()
        reshape = shape
        args = (a_re, a_im, b_re, b_im)
    else:
        rows, tile, lanes = dims
        block = pl.BlockSpec((tile, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)
        specs = [block] * 4
        out_specs = (block, block)
        grid = (rows // tile,)
        reshape = (rows, lanes)
        args = tuple(x.reshape(reshape) for x in (a_re, a_im, b_re, b_im))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct(reshape, jnp.float32),
            jax.ShapeDtypeStruct(reshape, jnp.float32),
        ),
        interpret=interpret,
    )(*args)
    return out[0].reshape(shape), out[1].reshape(shape)


def cmul_c64(a, b, conj_b: bool = False, scale: float = 1.0, interpret: bool = False):
    """Complex-signature convenience around :func:`cmul` for use inside
    traces: splitting/merging via real/imag is free under XLA.

    Measured on v5e: 0.165 ms for 2048x2048 complex64 (~600 GB/s, ~73% of
    HBM peak) vs 0.34 ms for the XLA-fused equivalent — use for standalone
    elementwise passes; inside larger fused chains prefer plain ``a * b``
    (a pallas_call is a fusion barrier).
    """
    re, im = cmul(
        jnp.real(a).astype(jnp.float32),
        jnp.imag(a).astype(jnp.float32),
        jnp.real(b).astype(jnp.float32),
        jnp.imag(b).astype(jnp.float32),
        conj_b=conj_b,
        scale=scale,
        interpret=interpret,
    )
    return jax.lax.complex(re, im)


def cmul_reference(a_re, a_im, b_re, b_im, conj_b: bool = False, scale: float = 1.0):
    """jnp reference for tests."""
    a = jax.lax.complex(a_re, a_im)
    b = jax.lax.complex(b_re, b_im)
    if conj_b:
        b = jnp.conj(b)
    out = a * b * jnp.float32(scale)
    return jnp.real(out), jnp.imag(out)

"""Ring halo exchange via inter-chip RDMA.

The Pallas tier of the overlap-save halo (SURVEY.md §5 "distributed
communication backend"): each device pushes the trailing ``overlap``
samples of its time shard directly into its right neighbor's receive
buffer with ``make_async_remote_copy`` over ICI, instead of routing
through an XLA ``ppermute`` collective. The win on real hardware is
overlap: the RDMA can be started before the producer finishes its local
block and waited just before the consumer needs the halo, hiding the
ICI latency behind compute.

``halo_left_rdma`` is a drop-in for :func:`...parallel.halo.left_tail`
inside a ``shard_map``; shard 0 (along the exchanged axis) receives zeros
(the causal initial state), matching the ppermute semantics exactly. On a
multi-axis mesh pass ``mesh_axis_names`` (the mesh's axis order) so the
neighbor's *linear* device id is computed from the full coordinates — the
per-axis index alone would address a different shard's device.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_kernel(x_ref, out_ref, send_sem, recv_sem, *, axis_name: str):
    ax_size = jax.lax.axis_size(axis_name)
    ax_idx = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(ax_idx + 1, ax_size)

    # cyclic ring: every shard pushes its tail to the right neighbor
    # (uniform participation keeps the collective schedule symmetric —
    # divergent sends deadlock both the interpret backend's rendezvous and,
    # on hardware, any bytes-accounted receive); the first shard along the
    # axis then overwrites the wrapped-around tail with the causal zeros
    rdma = pltpu.make_async_remote_copy(
        src_ref=x_ref,
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    rdma.wait()

    @pl.when(ax_idx == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)


def halo_left_rdma(
    x: jnp.ndarray,
    overlap: int,
    axis_name: str,
    mesh_axis_names: Optional[Sequence[str]] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Left-neighbor tail via RDMA; call inside ``shard_map`` over
    ``axis_name``. Returns ``[..., overlap]`` like ``left_tail``.

    ``mesh_axis_names``: pass the mesh's axis order so multi-axis meshes are
    rejected loudly — jax's ``dma_start`` does not implement remote copies
    on meshes with more than one named axis (a per-axis LOGICAL id would
    silently address another shard's device); use the ``ppermute`` halo
    (:func:`...parallel.halo.left_tail`) there instead.
    """
    names = tuple(mesh_axis_names or (axis_name,))
    if len(names) > 1:
        raise NotImplementedError(
            "remote DMA on a multi-axis mesh is not supported by jax's "
            "dma_start; use parallel.halo.left_tail (ppermute) instead"
        )
    tail = x[..., -overlap:]
    kernel = functools.partial(_halo_kernel, axis_name=axis_name)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(tail.shape, tail.dtype),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=7
        ),
        interpret=interpret,
    )(tail)

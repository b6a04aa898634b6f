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
(the causal initial state), matching the ppermute semantics exactly.

Multi-axis meshes (e.g. the flagship ``(channel, time)`` RX layout) are
addressed with a **mesh-coordinate dict** device id
(``{axis_name: right}``, ``DeviceIdType.MESH``): axes absent from the
dict default to the sender's own coordinate, so the copy goes to the
device that differs only along the exchanged axis — jax converts the
coordinates to the linear id with the mesh's strides. This lowers
correctly on TPU hardware for any mesh rank. **Interpret mode** (the CPU
emulation used in CI) supports it only for single-axis meshes: jax's
``dma_start`` discharge rule raises ``NotImplementedError`` for meshes
with more than one named axis (jax/_src/pallas/primitives.py,
``dma_start_p`` discharge: "Meshes with more than 1 named dimension not
implemented"), so multi-axis correctness is validated on hardware, and CI
covers the 1-D ring plus the dict-addressing construction (DEVNOTES.md).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_kernel(x_ref, out_ref, send_sem, recv_sem, *, axis_name: str,
                 mesh_addressing: bool):
    ax_size = jax.lax.axis_size(axis_name)
    ax_idx = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(ax_idx + 1, ax_size)

    # cyclic ring: every shard pushes its tail to the right neighbor
    # (uniform participation keeps the collective schedule symmetric —
    # divergent sends deadlock both the interpret backend's rendezvous and,
    # on hardware, any bytes-accounted receive); the first shard along the
    # axis then overwrites the wrapped-around tail with the causal zeros.
    # The dict device id pins only the exchanged axis; every other mesh
    # axis keeps the sender's coordinate (DeviceIdType.MESH semantics), so
    # one kernel serves 1-D and multi-axis meshes on hardware. Interpret
    # mode's discharge rule handles neither dict ids nor multi-axis meshes
    # (jax 0.9 dma_start discharge) — it gets the LOGICAL single-axis form.
    if mesh_addressing:
        device_id = {axis_name: right}
        id_type = pltpu.DeviceIdType.MESH
    else:
        device_id = right
        id_type = pltpu.DeviceIdType.LOGICAL
    rdma = pltpu.make_async_remote_copy(
        src_ref=x_ref,
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=device_id,
        device_id_type=id_type,
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

    Works on meshes of any rank on TPU hardware (mesh-coordinate device
    ids, see module docstring). ``mesh_axis_names`` is accepted for
    backward compatibility and to validate that ``axis_name`` is one of
    the mesh axes; it is no longer needed for addressing. In interpret
    mode jax only implements remote DMA for single-axis meshes — rejected
    loudly here so the failure names the workaround
    (:func:`...parallel.halo.left_tail`).
    """
    names = tuple(mesh_axis_names or (axis_name,))
    if axis_name not in names:
        raise ValueError(f"axis {axis_name!r} not in mesh axes {names}")
    if interpret and len(names) > 1:
        raise NotImplementedError(
            "interpret-mode remote DMA supports single-axis meshes only "
            "(jax dma_start discharge limitation); on hardware this kernel "
            "addresses multi-axis meshes via mesh-coordinate device ids — "
            "for CPU/CI validation of a multi-axis layout use "
            "parallel.halo.left_tail (ppermute) instead"
        )
    tail = x[..., -overlap:]
    kernel = functools.partial(
        _halo_kernel, axis_name=axis_name, mesh_addressing=not interpret
    )
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
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

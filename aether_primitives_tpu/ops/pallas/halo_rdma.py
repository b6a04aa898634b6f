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
inside a ``shard_map``; shard 0 receives zeros (causal initial state),
matching the ppermute semantics exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_kernel(x_ref, out_ref, send_sem, recv_sem, *, axis_name: str):
    my_id = jax.lax.axis_index(axis_name)
    num = jax.lax.axis_size(axis_name)
    right = jax.lax.rem(my_id + 1, num)

    # cyclic ring: every shard pushes its tail to the right neighbor
    # (uniform participation keeps the collective schedule symmetric —
    # divergent sends deadlock both the interpret backend's rendezvous and,
    # on hardware, any bytes-accounted receive); shard 0 then overwrites
    # the wrapped-around tail with the causal zero state
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

    @pl.when(my_id == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)


def halo_left_rdma(
    x: jnp.ndarray, overlap: int, axis_name: str, interpret: bool = False
) -> jnp.ndarray:
    """Left-neighbor tail via RDMA; call inside ``shard_map`` over
    ``axis_name``. Returns ``[..., overlap]`` like ``left_tail``.

    Note: correctness of the wait/signal pairing here follows the jax
    distributed-Pallas right-permute pattern; exercised in interpret mode
    in CI and intended for validation on real multi-chip slices.
    """
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

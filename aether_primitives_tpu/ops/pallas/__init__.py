"""Hand-written Pallas TPU kernels for hot paths where XLA fusion leaves
throughput on the table (SURVEY.md §7 step 8).

Pallas TPU has no complex dtype, so every kernel here works on split re/im
f32 planes — the same layout as :class:`aether_primitives_tpu.boundary.Split`.
All kernels have jnp reference implementations and interpret-mode tests.
"""

from . import cmul
from . import stream
from . import halo_rdma

__all__ = ["cmul", "stream", "halo_rdma"]

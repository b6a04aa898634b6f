"""Worker for the two-process distributed test (test_distributed.py).

Each process owns 4 virtual CPU devices; together they form one 8-device
process-spanning ``time`` mesh per docs/MULTIHOST.md. The sharded RX chain
runs over a global array assembled from per-process local slices, and every
process asserts its addressable output shards bit-match the float64 numpy
reference chain — exercising ``init_distributed``, the cross-process mesh,
and the halo exchange that crosses the process boundary.

Usage: python tests/distributed_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from aether_primitives_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()

    import numpy as np

    from aether_primitives_tpu.cli import numpy_reference_bits
    from aether_primitives_tpu.models import RxChain, RxChainConfig

    ndev = len(jax.devices())
    assert ndev == 4 * nproc, ndev
    cfg = RxChainConfig(fft_len=256, decimation=4, fir_mode="fused")
    chain = RxChain(cfg)
    span = cfg.fft_len * cfg.decimation
    n = ndev * span * 2

    # identical full capture in every process (fixed seed); each process
    # contributes only its local slice to the global array
    rng = np.random.default_rng(815)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)

    mesh = make_mesh({"time": ndev})
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("time")
    )
    local = x[pid * n // nproc : (pid + 1) * n // nproc]
    xg = jax.make_array_from_process_local_data(sharding, local, (n,))

    out = chain.sharded_step(xg, mesh)

    ref = numpy_reference_bits(x, chain.taps, cfg.decimation, cfg.fft_len)
    checked = 0
    for sh in out.addressable_shards:
        got = np.asarray(sh.data)
        want = ref[sh.index[-1]]
        assert got.shape == want.shape
        agree = float((got == want).mean())
        assert agree == 1.0, f"process {pid} shard {sh.index}: {agree}"
        checked += got.size
    assert checked == ref.size // nproc, (checked, ref.size)

    # second cross-process path: the sharded DDC (per-shard exact NCO
    # rotators + a halo that crosses the process boundary)
    from aether_primitives_tpu.models.ddc import Ddc, DdcConfig, sharded_ddc

    dcfg = DdcConfig(freq=0.1375, decimation=4)
    xd = jax.make_array_from_process_local_data(sharding, local, (n,))
    got_d = sharded_ddc(xd, dcfg, mesh)
    ref_d = np.asarray(Ddc(dcfg).step(x))
    for sh in got_d.addressable_shards:
        g = np.asarray(sh.data)
        w = ref_d[sh.index[-1]]
        err = np.sqrt(np.mean(np.abs(g - w) ** 2) / (np.mean(np.abs(w) ** 2)))
        assert err < 1e-5, f"process {pid} ddc shard {sh.index}: {err}"

    print(f"process {pid}: {checked} bits verified OK", flush=True)


if __name__ == "__main__":
    main()

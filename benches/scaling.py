"""Scaling-efficiency benchmark: sharded RX chain at 1..N devices.

The north-star scaling metric (BASELINE.md: >= 85% samples/s efficiency at
2 hosts) measured by running the time-sharded chain on growing device
subsets of the available mesh and comparing per-device throughput against
the single-device baseline.

On a multi-chip TPU slice this is the real measurement (halos ride ICI).
On a single-chip or CPU host it still validates the sharded path end to end
(pass --cpu to use the 8-virtual-device CPU mesh; numbers are then about
the machinery, not the silicon). Multi-host: run one process per host with
``jax.distributed.initialize`` (parallel.mesh.init_distributed) and the
same flags — the mesh spans all processes automatically.

Usage: python benches/scaling.py [--cpu] [--samples-per-dev 2097152]
"""

import argparse
import json
import os
import time

import numpy as np



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--samples-per-dev", type=int, default=1 << 21)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aether_primitives_tpu.boundary import Split
    from aether_primitives_tpu.models import RxChain, RxChainConfig
    from aether_primitives_tpu.parallel import mesh as mesh_mod

    devs = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    chain = RxChain(RxChainConfig(fft_len=2048, decimation=4))
    rng = np.random.default_rng(815)

    digest = jax.jit(lambda bits: jnp.sum(bits.astype(jnp.float32).ravel()[:1024]))

    rows = []
    base_rate = None
    for nd in sizes:
        mesh = mesh_mod.make_mesh({"time": nd}, devices=devs[:nd])
        n = args.samples_per_dev * nd
        x = Split(
            rng.normal(size=n).astype(np.float32),
            rng.normal(size=n).astype(np.float32),
        )
        sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("time"))
        xd = jax.device_put(x, sharding)

        def step(blk):
            return chain.sharded_step(blk.to_complex(), mesh)

        f = jax.jit(step)
        out = f(xd)
        jax.block_until_ready(out)
        float(np.asarray(digest(out)))

        def run(iters):
            t0 = time.perf_counter()
            o = None
            for _ in range(iters):
                o = f(xd)
            float(np.asarray(digest(o)))
            return time.perf_counter() - t0

        run(2)
        t1 = min(run(3) for _ in range(2))
        t2 = min(run(13) for _ in range(2))
        dt = max((t2 - t1) / 10, 1e-9)
        rate = n / dt / 1e6
        per_dev = rate / nd
        if base_rate is None:
            base_rate = per_dev
        eff = per_dev / base_rate
        rows.append(
            {
                "devices": nd,
                "msamples_per_s": round(rate, 1),
                "per_device": round(per_dev, 1),
                "efficiency": round(eff, 3),
            }
        )
        print(
            f"devices={nd:3d}: {rate:10.1f} Msa/s total, {per_dev:10.1f}/dev, "
            f"efficiency {eff * 100:5.1f}%",
            flush=True,
        )

    payload = {"platform": devs[0].platform, "rows": rows}
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(payload, fh, indent=1)
    return payload


if __name__ == "__main__":
    main()

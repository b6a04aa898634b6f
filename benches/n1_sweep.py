"""Whole-chain sweep of the fused op's first-stage size ``n1`` on chip.

The two-einsum factorization of the RX frame op picks ``n1`` (stage-1 DFT
size); the heuristic takes the largest divisor of ``fft_len`` <= 128, which
for the flagship chain (dec 4, fft 2048) gives n1=128 -> stage-2 GEMMs of
shape [nsym, 64] x [64, 16] with a 16-lane minor dim (heavily padded on
TPU: the VPU/MXU lane width is 128) and 604M cmacs/block total. Smaller n1
trades stage-1 contraction depth for stage-2 lane utilisation and fewer
total FLOPs (n1=64: 402M cmacs, minor dim 32). Which wins is a hardware
question — this sweeps the WHOLE chain (spectra + staged sign demod), the
robust ~1 ms workload, with interleaved repeated rounds so relay timing
drift (±3-4x on micro-sweeps, DEVNOTES.md) decorrelates, and gates every
candidate on bit agreement vs the float64 numpy reference.

Usage: python benches/n1_sweep.py [--cpu] [--n 4194304] [--rounds 3]
Writes one line per (round, candidate) immediately (buffering=1 safe).
"""

try:
    import aether_primitives_tpu  # noqa: F401
except ModuleNotFoundError:  # bare offline clone: resolve the in-tree package
    import os as _os
    import sys as _sys

    _sys.path.append(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=1 << 22)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--candidates", type=int, nargs="*",
                    default=[16, 32, 64, 128, 256])
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from aether_primitives_tpu.boundary import Split
    from aether_primitives_tpu.cli import (
        _Digest, marginal_cost, numpy_reference_bits,
    )
    from aether_primitives_tpu.models import RxChain, RxChainConfig

    dev = jax.devices()[0]
    n = args.n
    rng = np.random.default_rng(815)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    blk = jax.device_put(Split(x.real.copy(), x.imag.copy()), dev)
    digest = _Digest()

    chain0 = RxChain(RxChainConfig(fft_len=2048, decimation=4,
                                   fir_mode="fused"))
    ref_bits = numpy_reference_bits(
        x, chain0.taps, chain0.config.decimation, chain0.config.fft_len
    )

    steps = {}
    for n1 in args.candidates:
        cfg = RxChainConfig(fft_len=2048, decimation=4, fir_mode="fused",
                            stage_n1=n1)
        steps[n1] = RxChain(cfg).jitted(donate=False, split_boundary=True)

    # gate + warm (also triggers each candidate's compile exactly once)
    for n1, step in steps.items():
        got = np.asarray(step(blk))
        agree = float((got == ref_bits).mean())
        print(f"n1={n1:4d} bit-agree {agree:.6f}"
              + ("  ** GATE FAIL **" if agree < 0.999 else ""), flush=True)

    best = {}
    for rnd in range(args.rounds):
        for n1, step in steps.items():
            def run(kk, f=step):
                t0 = time.perf_counter()
                o = None
                for _ in range(kk):
                    o = f(blk)
                digest(o)
                return time.perf_counter() - t0

            run(2)  # settle
            dt, _ = marginal_cost(run, 10, 40)
            if dt is None:
                print(f"round {rnd} n1={n1:4d}  unresolved", flush=True)
                continue
            best[n1] = min(best.get(n1, float("inf")), dt)
            print(f"round {rnd} n1={n1:4d} {dt*1e3:7.3f} ms "
                  f"{n/dt/1e6:7.0f} Msa/s", flush=True)

    print("--- min over rounds ---", flush=True)
    for n1 in sorted(best):
        dt = best[n1]
        print(f"n1={n1:4d} {dt*1e3:7.3f} ms {n/dt/1e6:7.0f} Msa/s",
              flush=True)


if __name__ == "__main__":
    main()

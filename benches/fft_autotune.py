"""On-chip autotuner for the matmul FFT's stage-1 factor + HBM roofline report.

For each size it times ``mm_fft`` (marginal-cost methodology, device-resident
split planes, jitted digest completion barrier — DEVNOTES.md) over every
usable stage-1 divisor candidate, picks the fastest, and reports achieved
HBM GB/s against the v5e peak (~819 GB/s) counting the minimum stream
(read input + write output complex64 = 16 B/sample; recursion
intermediates mean real traffic is a small multiple of this, so the
"fraction of roofline" column is conservative).

Writes ``benches/results_fft_autotune.json``; the winning table is
committed into ``ops/fft.py:_V5E_FACTORS``.

Usage: python benches/fft_autotune.py [--sizes 512,1024,...] [--json out]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

try:
    import aether_primitives_tpu  # noqa: F401
except ModuleNotFoundError:  # bare offline clone: resolve the in-tree package
    sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_PEAK_GBPS = 819.0  # v5e


def candidates(n: int):
    """Usable stage-1 divisors: multiples of 8 up to 256 (stage-1 matrix
    [n1, n1] must stay MXU-tileable), plus the shallow divisors 2/4 (for
    small n they make the stage-2 minor dim a full 128 lanes — the layout
    effect that won the fused chain op its n1=16 entry, DEVNOTES.md), plus
    the single-stage dense DFT (n1 == n) for n <= 2048 where the O(n^2)
    matmul is lane-perfect end to end."""
    out = [d for d in (2, 4) if n % d == 0 and n > 256]
    out += [d for d in range(8, min(n, 257), 8) if n % d == 0]
    if 256 < n <= 2048:
        out.append(n)  # dense
    return out or [d for d in range(2, min(n, 257)) if n % d == 0][:4]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sizes", default="512,1024,2048,4096,8192,16384,32768,65536"
    )
    ap.add_argument("--json", default="benches/results_fft_autotune.json")
    ap.add_argument("--rows-target", type=int, default=1 << 22)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aether_primitives_tpu.boundary import f32_boundary, Split
    from aether_primitives_tpu.ops import fft as fft_mod
    from aether_primitives_tpu.cli import marginal_cost, _Digest

    dev = jax.devices()[0]
    rng = np.random.default_rng(815)
    digest = _Digest()
    results = []
    table = {}

    for n in (int(s) for s in args.sizes.split(",")):
        rows = max(1, args.rows_target // n)
        blk = jax.device_put(
            Split(
                rng.normal(size=(rows, n)).astype(np.float32),
                rng.normal(size=(rows, n)).astype(np.float32),
            ),
            dev,
        )
        # compile every candidate first, then time them in INTERLEAVED
        # repeated rounds: relay/compile-service drift between candidates
        # is minutes-scale, so back-to-back per-candidate timing attributed
        # 10x swings to factors (observed); round-robin + median-of-rounds
        # decorrelates it
        fns = {}
        for n1 in candidates(n):
            fft_mod.set_factor(n, n1)
            try:
                fn = jax.jit(f32_boundary(lambda x: fft_mod.mm_fft(x, -1)))
                out = fn(blk)
                jax.block_until_ready(out)
                digest(out)
                fns[n1] = fn
            except Exception as e:  # compile failure for a pathological shape
                print(f"n={n} n1={n1}: FAILED {type(e).__name__}", flush=True)
            finally:
                fft_mod.set_factor(n, None)

        def run_fn(fn, k):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = fn(blk)
            digest(o)
            return time.perf_counter() - t0

        samples = {n1: [] for n1 in fns}
        for _ in range(args.rounds):
            for n1, fn in fns.items():
                run_fn(fn, 2)
                dt, _ = marginal_cost(lambda k, f=fn: run_fn(f, k), 5, 25,
                                      max_escalations=1)
                if dt is not None:
                    samples[n1].append(dt)
        per_factor = []
        for n1, dts in samples.items():
            if not dts:
                print(f"n={n} n1={n1}: below timing floor", flush=True)
                continue
            dt = sorted(dts)[len(dts) // 2]
            msps = rows * n / dt / 1e6
            gbps = rows * n * 16 / dt / 1e9
            per_factor.append(
                {"n1": n1, "ms": dt * 1e3, "msamples_per_s": msps,
                 "gbps_min_stream": gbps,
                 "rounds_ms": [round(d * 1e3, 3) for d in sorted(dts)]}
            )
            print(
                f"n={n:6d} n1={n1:4d}: {dt*1e3:8.3f} ms  {msps:9.0f} Msa/s "
                f"{gbps:6.1f} GB/s ({100*gbps/HBM_PEAK_GBPS:4.1f}% roofline) "
                f"rounds={[round(d*1e3,3) for d in sorted(dts)]}",
                flush=True,
            )
        if not per_factor:
            continue
        best = max(per_factor, key=lambda r: r["msamples_per_s"])
        heur = fft_mod._heuristic_factor(n)
        table[n] = best["n1"]
        results.append(
            {
                "n": n,
                "rows": rows,
                "best_n1": best["n1"],
                "heuristic_n1": heur,
                "best_ms": best["ms"],
                "best_msamples_per_s": best["msamples_per_s"],
                "best_gbps_min_stream": best["gbps_min_stream"],
                "roofline_fraction": best["gbps_min_stream"] / HBM_PEAK_GBPS,
                "candidates": per_factor,
            }
        )
        print(
            f"--> n={n}: best n1={best['n1']} (heuristic {heur}) "
            f"{best['best_msamples_per_s'] if 'best_msamples_per_s' in best else best['msamples_per_s']:.0f} Msa/s",
            flush=True,
        )

    payload = {
        "device": str(jax.devices()[0]),
        "hbm_peak_gbps": HBM_PEAK_GBPS,
        "table": table,
        "results": results,
    }
    with open(args.json, "w") as f:
        json.dump(payload, f, indent=1)
    print("table =", table)
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

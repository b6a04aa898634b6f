"""Micro-benchmark suite — the criterion-equivalent harness
(reference benches/benches.rs): vecops mul/clone/scale @ 2048, interpolate,
downsample 30720->1024, BPSK/QPSK modulate+demod, FFT fwd/bwd @ 512/1024/
2048, and the freq-domain correlator @ 512/1024/2048.

Run on whatever backend is active (TPU by default in this image; pass
--cpu to force CPU). Each op is jitted with the f32 split boundary, warmed
up, then timed over many iterations; batched variants show the
throughput-oriented TPU numbers alongside the single-vector latency the
reference measured.

Usage: python benches/microbench.py [--cpu] [--json out.json]
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aether_primitives_tpu.boundary import Split, f32_boundary
    from aether_primitives_tpu.ops import fir, modulation, sampling, vecops
    from aether_primitives_tpu.ops.fft import Scale, plan as fft_plan

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(815)
    results = []

    def timed(name, fn, blk, samples, iters=args.iters):
        fn = jax.jit(fn)
        out = jax.block_until_ready(fn(blk))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(blk)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        msps = samples / dt / 1e6
        results.append(
            {"bench": name, "us_per_call": dt * 1e6, "msamples_per_s": msps}
        )
        print(f"{name:42s} {dt*1e6:10.1f} us/call {msps:12.0f} Msamples/s", flush=True)

    def rsplit(shape):
        return Split(
            rng.normal(size=shape).astype(np.float32),
            rng.normal(size=shape).astype(np.float32),
        )

    B = args.batch

    # vecops @ N=2048 (reference benches/benches.rs:28-70)
    n = 2048
    two = rsplit((B, n))
    timed("vecops mul [batch x 2048]", f32_boundary(lambda x: vecops.mul(x, x)), two, B * n)
    timed("vecops scale [batch x 2048]", f32_boundary(lambda x: vecops.scale(x, 2.0)), two, B * n)
    timed("vecops conj+mirror [batch x 2048]", f32_boundary(lambda x: vecops.mirror(vecops.conj(x))), two, B * n)

    # interpolate / downsample (reference benches/benches.rs:72-133)
    timed(
        "interpolate (1024,4) [batch]",
        f32_boundary(lambda x: sampling.interpolate(x, 4)),
        rsplit((B, 1024)),
        B * 1024,
    )
    timed(
        "downsample 30720->1024 [batch]",
        f32_boundary(lambda x: sampling.downsample(x, 1024)),
        rsplit((B // 8 or 1, 30720)),
        (B // 8 or 1) * 30720,
    )

    # modulation (reference benches/benches.rs:192-281)
    qpsk = modulation.qpsk()
    bits = rng.integers(0, 2, (B, 8000)).astype(np.uint8)
    timed("qpsk modulate 8000 bits [batch]", lambda b: qpsk.modulate(b), bits, B * 8000)
    syms = rsplit((B, 4000))
    timed("qpsk demod 4000 syms [batch]", f32_boundary(lambda s: qpsk.demod(s)), syms, B * 4000)
    bpsk = modulation.bpsk()
    timed("bpsk modulate 8000 bits [batch]", lambda b: bpsk.modulate(b), bits, B * 8000)

    # FFT fwd/bwd (reference benches/benches.rs:288-380)
    for nfft in (512, 1024, 2048):
        p = fft_plan(nfft)
        blk = rsplit((B, nfft))
        timed(f"fft {nfft} fwd SN [batch]", f32_boundary(lambda x, p=p: p.fwd(x, Scale.SN)), blk, B * nfft)
        timed(f"fft {nfft} bwd SN [batch]", f32_boundary(lambda x, p=p: p.bwd(x, Scale.SN)), blk, B * nfft)

    # freq-domain correlator (reference benches/benches.rs:382-423)
    for nfft in (512, 1024, 2048):
        sig = rsplit((nfft,))
        blk = rsplit((B, nfft))
        timed(
            f"correlator {nfft} [batch]",
            f32_boundary(lambda x, s=sig: fir.correlate(x, s.to_complex())),
            blk,
            B * nfft,
        )

    payload = {"platform": platform, "batch": B, "results": results}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

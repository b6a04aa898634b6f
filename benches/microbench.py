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
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    dev = jax.devices()[0]
    rng = np.random.default_rng(815)
    results = []

    # digest jits per output structure: forcing a host fetch through a tiny
    # jitted reduction is the only reliable completion barrier on the axon
    # relay (block_until_ready can ack early; eager ops hang) — DEVNOTES.md
    _digs = {}

    def _digest(o):
        leaves = jax.tree_util.tree_leaves(o)
        key = tuple((l.shape, str(l.dtype)) for l in leaves)
        f = _digs.get(key)
        if f is None:
            def _d(x):
                ls = jax.tree_util.tree_leaves(x)
                return sum(jnp.sum(l.astype(jnp.float32).ravel()[:256]) for l in ls)
            f = jax.jit(_d)
            _digs[key] = f
        return float(np.asarray(f(o)))

    def timed(name, fn, blk, samples, iters=args.iters):
        fn = jax.jit(fn)
        blk = jax.device_put(blk, dev)
        out = fn(blk)
        jax.block_until_ready(out)
        _digest(out)

        def run(k):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = fn(blk)
            _digest(o)
            return time.perf_counter() - t0

        run(2)
        k1, k2 = max(2, iters // 5), iters
        t1 = min(run(k1) for _ in range(2))
        t2 = min(run(k2) for _ in range(2))
        dt = max((t2 - t1) / (k2 - k1), 1e-9)
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
        sig_c = rsplit((nfft,)).numpy()  # host numpy complex: trace constant
        blk = rsplit((B, nfft))
        timed(
            f"correlator {nfft} [batch]",
            f32_boundary(lambda x, s=sig_c: fir.correlate(x, s)),
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

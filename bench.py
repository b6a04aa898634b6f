"""Headline benchmark: complex Msamples/s/chip on the FIR+decimate+FFT+demod
receive chain (BASELINE.json metric), printed as ONE JSON line.

Methodology (see .claude/skills/verify/SKILL.md for the axon quirks):

- input blocks are **device-resident** f32 Split planes (production data
  arrives over ICI/DMA streaming, not per-call host PCIe; the axon relay's
  host link would otherwise dominate);
- timing uses the **marginal-cost** estimator: run the jitted chain K1 and
  K2 times, each measurement ending with a scalar digest fetched to host
  (forcing completion through the async relay), and report
  ``(T(K2) - T(K1)) / (K2 - K1)`` — the fixed sync overhead cancels;
- before timing, a small block is checked bit-for-bit against a float64
  numpy reference implementation of the whole chain (FIR -> decimate ->
  FFT -> hard demod), so the number reported is for a verified-correct
  computation.

vs_baseline: ratio against the north-star per-chip target of 250 Msamples/s
(BASELINE.md: >= 4 Gsamples/s aggregate on a 16-chip v5e-16).
"""

import json
import sys
import time

import numpy as np

TARGET_MSPS_PER_CHIP = 250.0  # 4 Gsamples/s / 16 chips (BASELINE.md)


def numpy_reference_bits(x: np.ndarray, taps: np.ndarray, dec: int, fft_len: int):
    """float64 reference chain: causal FIR, decimate, fft(SN), QPSK demod."""
    y = np.convolve(x.astype(np.complex128), taps.astype(np.complex128))[: len(x)]
    y = y[::dec]
    frames = y.reshape(-1, fft_len)
    spec = np.fft.fft(frames, axis=-1) / np.sqrt(np.float32(fft_len))
    b0 = (spec.real < 0).astype(np.uint8)
    b1 = (spec.imag < 0).astype(np.uint8)
    return np.stack([b0, b1], axis=-1).reshape(-1)


def main():
    import jax
    import jax.numpy as jnp

    # NOTE: do NOT enable the persistent compilation cache here — on the
    # axon remote-compile backend the cache write path hangs compiles
    # (observed empirically; plain compiles take ~15 s and work).

    from aether_primitives_tpu.boundary import Split
    from aether_primitives_tpu.models import RxChain, RxChainConfig

    dev = jax.devices()[0]
    chain = RxChain(RxChainConfig(fft_len=2048, decimation=4))
    step = chain.jitted(donate=False, split_boundary=True)
    digest = jax.jit(lambda bits: jnp.sum(bits.astype(jnp.float32)))

    rng = np.random.default_rng(815)
    n = 1 << 22  # one shape for gate + timing: one jit compile total

    # -- correctness gate ---------------------------------------------------
    x_small = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    got = np.asarray(
        step(Split(x_small.real.copy(), x_small.imag.copy()))
    )
    ref_bits = numpy_reference_bits(
        x_small, chain.taps, chain.config.decimation, chain.config.fft_len
    )
    agree = float((got == ref_bits).mean())
    if agree < 0.999:
        print(
            json.dumps(
                {
                    "metric": "rx_chain_msamples_per_s_per_chip",
                    "value": 0.0,
                    "unit": "Msamples/s",
                    "vs_baseline": 0.0,
                    "error": f"correctness gate failed: bit agreement {agree}",
                }
            )
        )
        sys.exit(1)

    # -- throughput ---------------------------------------------------------
    nblocks = 4
    blocks = [
        jax.device_put(
            Split(
                rng.normal(size=n).astype(np.float32),
                rng.normal(size=n).astype(np.float32),
            ),
            dev,
        )
        for _ in range(nblocks)
    ]
    # warm: compile + first executions
    for b in blocks:
        step(b)
    float(np.asarray(digest(step(blocks[0]))))

    def run(iters: int) -> float:
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = step(blocks[i % nblocks])
        float(np.asarray(digest(out)))  # force completion through the relay
        return time.perf_counter() - t0

    run(3)  # settle
    k1, k2 = 10, 60
    t1 = min(run(k1) for _ in range(2))
    t2 = min(run(k2) for _ in range(2))
    dt = max((t2 - t1) / (k2 - k1), 1e-9)
    msps = n / dt / 1e6

    print(
        json.dumps(
            {
                "metric": "rx_chain_msamples_per_s_per_chip",
                "value": round(msps, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / TARGET_MSPS_PER_CHIP, 2),
                "detail": {
                    "chain": f"fir{chain.taps.shape[-1]}+dec4+fft2048+qpsk_demod",
                    "block_samples": n,
                    "ms_per_block": round(dt * 1e3, 3),
                    "correctness_bit_agreement": agree,
                    "device": str(dev),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

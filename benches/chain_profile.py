"""Stage-level profile of the fused RX chain on the current backend.

Times (marginal-cost methodology) the full jitted step and each stage in
isolation — boundary merge, stage-1 einsum, combined stage-2 einsum, tail
correction, demod — to show where the block time goes and how far the
chain sits from the two-einsum roofline. Chip results recorded in
DEVNOTES.md.

Usage: python benches/chain_profile.py [--cpu] [--n 4194304]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=1 << 22)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from aether_primitives_tpu.boundary import Split
    from aether_primitives_tpu.cli import _Digest, marginal_cost
    from aether_primitives_tpu.models import RxChain, RxChainConfig
    from aether_primitives_tpu.ops import fir as fir_mod
    from aether_primitives_tpu.ops.fft import Scale

    dev = jax.devices()[0]
    chain = RxChain(RxChainConfig(fft_len=2048, decimation=4, fir_mode="fused"))
    cfg = chain.config
    dec, n_fft = cfg.decimation, cfg.fft_len
    span = dec * n_fft
    n = args.n
    rng = np.random.default_rng(815)
    blk = jax.device_put(
        Split(rng.normal(size=n).astype(np.float32),
              rng.normal(size=n).astype(np.float32)),
        dev,
    )
    digest = _Digest()

    taps = chain.taps
    k = taps.shape[-1]
    n1 = fir_mod._fused_stage_n1(dec, n_fft)
    f1, gp = fir_mod._fused_stage_matrices(taps.tobytes(), k, dec, n_fft, n1)
    _, cm = fir_mod._fused_rx_matrices(taps.tobytes(), k, dec, n_fft)
    n2 = span // n1
    nsym = n // span
    print(f"n={n} frames={nsym} span={span} n1={n1} n2={n2} K={k}")

    def stage_full(b):
        return chain.step_split(b)

    def stage_merge(b):
        return b.to_complex()

    def stage_e1(b):
        x = b.to_complex().reshape(nsym, n1, n2)
        return jnp.einsum("fnm,nk->fkm", x, jnp.asarray(f1),
                          precision=jax.lax.Precision.HIGHEST)

    def stage_e1e2(b):
        x = b.to_complex().reshape(nsym, n1, n2)
        a = jnp.einsum("fnm,nk->fkm", x, jnp.asarray(f1),
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("fkm,kmd->fkd", a, jnp.asarray(gp),
                          precision=jax.lax.Precision.HIGHEST)

    def stage_spectra(b):
        return fir_mod.fir_decimate_fft(b.to_complex(), taps, dec, n_fft, Scale.SN)

    stages = [
        ("full step (spectra+demod)", stage_full),
        ("boundary merge only", stage_merge),
        ("einsum1 (stage-1 DFT)", stage_e1),
        ("einsum1+einsum2", stage_e1e2),
        ("full spectra (with correction)", stage_spectra),
    ]
    for name, fn in stages:
        jfn = jax.jit(fn)
        out = jfn(blk)
        jax.block_until_ready(out)
        digest(out)

        def run(kk, f=jfn):
            t0 = time.perf_counter()
            o = None
            for _ in range(kk):
                o = f(blk)
            digest(o)
            return time.perf_counter() - t0

        run(2)
        dt, floor = marginal_cost(run, 10, 50)
        if dt is None:
            print(f"{name:34s} < {floor*1e6:8.1f} us (below floor)", flush=True)
        else:
            print(f"{name:34s} {dt*1e3:8.3f} ms  {n/dt/1e6:8.0f} Msa/s", flush=True)


if __name__ == "__main__":
    main()

"""Sustained-stream soak on chip: the reference pipeline example's
10-second throughput harness (reference examples/pipeline.rs:54,198)
realized as a StatefulExecutor run — one contiguous stream, carried FIR
state, sustained-rate-over-time recorded per ~1-second window
(VERDICT r4 item 6).

Gates before timing: 2-block streaming bit-agreement vs contiguous (the
headline bench's gate) and exact StageStats accounting at the end.
Writes results_soak_r5.json with the per-window rates so rate stability
over time is in the artifact, not just the mean.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from aether_primitives_tpu.boundary import Split
from aether_primitives_tpu.models import RxChain, RxChainConfig
from aether_primitives_tpu.parallel.streaming import StatefulExecutor

DURATION_S = 10.0
BLOCK = 16 * 1024 * 1024  # amortize the relay dispatch RTT (~25 ms/call)


def main():
    dev = jax.devices()[0]
    chain = RxChain(RxChainConfig(fft_len=2048, decimation=4,
                                  fir_mode="fused", fft_backend="matmul"))
    rng = np.random.default_rng(7)
    blk = Split(
        rng.normal(size=BLOCK).astype(np.float32),
        rng.normal(size=BLOCK).astype(np.float32),
    )
    blk2 = Split(
        rng.normal(size=BLOCK).astype(np.float32),
        rng.normal(size=BLOCK).astype(np.float32),
    )

    # correctness gate: 2 streaming blocks == contiguous (CPU reference
    # for the contiguous double block would be slow here; instead reuse
    # the framework's own N-blocks==contiguous contract on a short
    # capture at this exact config)
    short = 4 * chain.frame_span
    cs = Split(rng.normal(size=2 * short).astype(np.float32),
               rng.normal(size=2 * short).astype(np.float32))
    fn_s = jax.jit(chain.streaming_step_split, donate_argnums=(1,))
    st = chain.init_state_split()
    b1, st = fn_s(Split(cs.re[:short], cs.im[:short]), st)
    b2, st = fn_s(Split(cs.re[short:], cs.im[short:]), st)
    got = np.concatenate([np.asarray(b1), np.asarray(b2)])
    ref = np.asarray(jax.jit(chain.step_split)(cs))
    gate = float((got == ref).mean())
    assert gate == 1.0, f"streaming gate failed: {gate}"
    print(f"streaming gate: 2 blocks == contiguous ({gate:.7f})", flush=True)

    ex = StatefulExecutor(
        chain.streaming_step_split, chain.init_state_split(),
        name="soak", printer=None,
    )
    # device-resident block ring: the soak measures the STREAM machinery
    # (state donation, executor accounting, sustained dispatch), not the
    # axon tunnel's host->device link (~30 MB/block would bound the loop
    # at ~3 Msa/s). A real deployment's feed is local DMA, not a relay.
    blk = jax.tree.map(lambda a: jax.device_put(a, dev), blk)
    blk2 = jax.tree.map(lambda a: jax.device_put(a, dev), blk2)
    # warmup (compile + steady allocator)
    for _ in range(3):
        ex.send(blk)
        np.asarray(ex.recv())

    windows = []
    t_start = time.perf_counter()
    win_t0, win_samples, n_blocks = t_start, 0, 0
    use_first = True
    while True:
        now = time.perf_counter()
        if now - t_start >= DURATION_S:
            break
        ex.send(blk if use_first else blk2)
        use_first = not use_first
        if len(ex._inflight) >= ex.depth:  # keep the pipe full: recv the
            out = ex.recv()                # oldest only once depth is used
            jax.block_until_ready(out)
        n_blocks += 1
        win_samples += BLOCK
        now = time.perf_counter()
        if now - win_t0 >= 1.0:
            windows.append(win_samples / (now - win_t0) / 1e6)
            win_t0, win_samples = now, 0
    for out in ex:  # drain
        jax.block_until_ready(out)
    total_s = time.perf_counter() - t_start

    st_stats = ex.chain_stats
    assert st_stats.total_n == n_blocks + 3  # incl. warmup
    assert st_stats.total_samples == (n_blocks + 3) * 2 * BLOCK  # re+im

    rates = np.asarray(windows)
    out = {
        "bench": "10 s sustained stateful stream (StatefulExecutor, "
                 "fused fft2048 matmul chain)",
        "device": str(dev),
        "duration_s": total_s,
        "blocks": n_blocks,
        "block_samples": BLOCK,
        "mean_msa_s": n_blocks * BLOCK / total_s / 1e6,
        "per_window_msa_s": [round(float(r), 1) for r in windows],
        "window_min_msa_s": float(rates.min()) if rates.size else None,
        "window_max_msa_s": float(rates.max()) if rates.size else None,
        "stats_blocks": st_stats.total_n,
        "streaming_gate_agreement": gate,
        "relay_band_note": "single-session capture; chain relay band "
                           "4.1-4.9 Gsa/s across sessions (DEVNOTES)",
        "bound_note": "sustained rate here is bound by the axon relay's "
                      "~25 ms per-dispatch RTT (one send+recv round trip "
                      "per block through the tunnel), not by compute — "
                      "the chain's marginal on-device rate is the "
                      "headline bench's 4+ Gsa/s; a local host would sit "
                      "between the two",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_soak_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{n_blocks} blocks in {total_s:.1f} s = "
          f"{out['mean_msa_s']:.0f} Msa/s sustained; windows "
          f"{out['window_min_msa_s']:.0f}-{out['window_max_msa_s']:.0f}",
          flush=True)
    print("wrote", path)


if __name__ == "__main__":
    main()

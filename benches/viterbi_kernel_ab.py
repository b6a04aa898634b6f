"""Interleaved chip A/B: resident-metric Pallas Viterbi vs the XLA scans.

Rows (decode-exactness asserted on chip before timing; pallas == xla
bits asserted where both run):

- batched full-block, K=7 rate-1/2, 660-step bursts (the PacketModem
  frame scale) at batch 64 / 256 / 1024;
- one long stream (131072 info bits), windowed w64 g48 — the streaming
  regime where the XLA windowed decoder was built.

Writes results_viterbi_r5.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from aether_primitives_tpu.cli import marginal_cost
from aether_primitives_tpu.ops import fec


def _time(fn, args, digest, rounds=3, k1=3, k2=12):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(digest(out)))

    def run(k):
        t = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        float(np.asarray(digest(o)))
        return time.perf_counter() - t

    run(2)
    samples = []
    for _ in range(rounds):
        d, _f = marginal_cost(run, k1, k2)
        if d is not None:
            samples.append(d)
    return (min(samples) if samples else None), samples


def _np_conv_encode(bits, polys=(0o171, 0o133), k=7):
    taps = [np.array([(p >> (k - 1 - j)) & 1 for j in range(k)], np.int64)
            for p in polys]
    b, t = bits.shape
    ext = np.concatenate(
        [np.zeros((b, k - 1), np.int64), bits.astype(np.int64),
         np.zeros((b, k - 1), np.int64)], axis=1
    )
    t_out = t + k - 1
    out = np.zeros((b, t_out, len(polys)), np.uint8)
    for ti in range(t_out):
        win = ext[:, ti:ti + k][:, ::-1]  # newest first
        for gi, tp in enumerate(taps):
            out[:, ti, gi] = (win @ tp) % 2
    return out.reshape(b, -1)


def main():
    dev = jax.devices()[0]
    rng = np.random.default_rng(7)
    digest = jax.jit(lambda o: sum(
        jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(o)
    ))
    results = []

    # sanity: numpy encoder matches the framework encoder
    chk = rng.integers(0, 2, (2, 50)).astype(np.uint8)
    for i in range(2):
        assert np.array_equal(
            _np_conv_encode(chk[i:i + 1])[0],
            np.asarray(fec.conv_encode(chk[i])),
        )

    # ---- batched full-block bursts
    t_info = 654  # 660-step trellis with the K-1 flush
    for batch in (64, 256, 1024):
        bits = rng.integers(0, 2, (batch, t_info)).astype(np.uint8)
        enc = _np_conv_encode(bits)
        llr = jax.device_put(
            ((1.0 - 2.0 * enc) * 4
             + 0.8 * rng.normal(size=enc.shape)).astype(np.float32), dev)

        pallas = jax.jit(lambda v: fec.viterbi_decode(v, backend="pallas"))
        xla = jax.jit(lambda v: fec.viterbi_decode(v, backend="xla"))
        dp = pallas(llr)
        assert np.array_equal(np.asarray(dp), bits), "pallas decode not clean"
        if batch == 64:
            dx = xla(llr)
            assert np.array_equal(np.asarray(dx), np.asarray(dp))
        d_pal, pal_s = _time(pallas, (llr,), digest)
        d_xla, xla_s = (_time(xla, (llr,), digest, rounds=2)
                        if batch <= 256 else (None, []))
        info = batch * t_info
        results.append({
            "config": f"full-block K=7 r1/2 T=660 b{batch}",
            "pallas_ms": d_pal * 1e3,
            "pallas_info_mbit_s": info / d_pal / 1e6,
            "xla_vmapped_ms": None if d_xla is None else d_xla * 1e3,
            "speedup": None if d_xla is None else d_xla / d_pal,
            "pallas_samples_ms": [s * 1e3 for s in pal_s],
            "xla_samples_ms": [s * 1e3 for s in xla_s],
        })
        sp = "-" if d_xla is None else f"{d_xla/d_pal:.1f}x"
        print(f"full-block b{batch}: pallas {d_pal*1e3:.2f} ms = "
              f"{info/d_pal/1e6:.1f} Mbit/s info ({sp} vs xla)", flush=True)

    # ---- one long windowed stream
    n_info = 131072
    bits = rng.integers(0, 2, (1, n_info)).astype(np.uint8)
    enc = _np_conv_encode(bits)
    llr = jax.device_put(
        ((1.0 - 2.0 * enc[0]) * 4
         + 0.8 * rng.normal(size=enc.shape[-1])).astype(np.float32), dev)
    pal = jax.jit(lambda v: fec.viterbi_decode(v, window=64, guard=48,
                                               backend="pallas"))
    xl = jax.jit(lambda v: fec.viterbi_decode(v, window=64, guard=48,
                                              backend="xla"))
    dp = pal(llr)
    dx = xl(llr)
    assert np.array_equal(np.asarray(dp), np.asarray(dx))
    assert np.array_equal(np.asarray(dp), bits[0])
    d_pal, pal_s = _time(pal, (llr,), digest)
    d_xla, xla_s = _time(xl, (llr,), digest, rounds=2)
    results.append({
        "config": f"windowed w64 g48 stream {n_info} info bits",
        "pallas_ms": d_pal * 1e3,
        "pallas_info_mbit_s": n_info / d_pal / 1e6,
        "xla_ms": d_xla * 1e3,
        "speedup": d_xla / d_pal,
        "pallas_samples_ms": [s * 1e3 for s in pal_s],
        "xla_samples_ms": [s * 1e3 for s in xla_s],
    })
    print(f"windowed stream: pallas {d_pal*1e3:.2f} ms = "
          f"{n_info/d_pal/1e6:.1f} Mbit/s ({d_xla/d_pal:.1f}x vs xla)",
          flush=True)

    out = {
        "bench": "Pallas resident-metric Viterbi vs XLA scans, chip A/B",
        "device": str(dev),
        "rows": results,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_viterbi_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()

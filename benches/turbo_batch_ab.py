"""Interleaved chip A/B: natively batched turbo decode (batch on the
BCJR lane axis) vs the round-4 vmapped per-codeword form (VERDICT r4
item 2 — the 20 Mbit/s windowed-BCJR floor).

Decode-exactness is asserted on chip before timing (noisy channel at a
comfortably-correctable operating point; batched == per-codeword is
pinned in tests/test_turbo.py). Rows: n=1024, 8 iterations, window 64 /
guard 16, batches 64 / 256 / 1024. Writes results_turbo_r5.json.
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
from aether_primitives_tpu.ops.turbo import (
    _trellis,
    turbo_decode,
    turbo_interleaver,
)


def _np_turbo_encode(bits):
    """Host-side numpy rate-1/3 turbo encode (batched) — avoids thousands
    of per-codeword device dispatches just to build bench inputs; matches
    ops.turbo.turbo_encode bit for bit (same trellis tables)."""
    nxt, par, fb, _, _ = _trellis()
    b, n = bits.shape

    def rsc(u, terminate):
        s = np.zeros(b, np.int64)
        p = np.zeros_like(u)
        for t in range(u.shape[1]):
            p[:, t] = par[s, u[:, t]]
            s = nxt[s, u[:, t]]
        if not terminate:
            return p, None, None
        ts = np.zeros((b, 3), np.uint8)
        tp = np.zeros((b, 3), np.uint8)
        for t in range(3):
            ub = fb[s]
            ts[:, t] = ub
            tp[:, t] = par[s, ub]
            s = nxt[s, ub]
        return p, ts, tp

    u = bits.astype(np.int64)
    p1, ts, tp = rsc(u, True)
    perm = turbo_interleaver(n)
    p2, _, _ = rsc(u[:, perm], False)
    return bits, p1.astype(np.uint8), p2.astype(np.uint8), ts, tp


def _time(fn, args, digest, rounds=3, k1=2, k2=6):
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
    return min(samples), samples


def main():
    dev = jax.devices()[0]
    rng = np.random.default_rng(7)
    digest = jax.jit(lambda o: sum(
        jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(o)
    ))
    n = 1024
    sigma = 0.7  # ~1.3 dB Eb/N0 at rate 1/3: decodes clean at 8 iters

    def llr(b):
        y = (1.0 - 2.0 * np.asarray(b, np.float64)) + sigma * rng.normal(
            size=np.shape(b)
        )
        return (2.0 * y / sigma**2).astype(np.float32)

    results = []
    for batch in (64, 256, 1024):
        bits = rng.integers(0, 2, (batch, n)).astype(np.uint8)
        enc = _np_turbo_encode(bits)
        args = tuple(jax.device_put(llr(v), dev) for v in enc)

        native = jax.jit(lambda a, b, c, d, e: turbo_decode(
            a, b, c, d, e, iterations=8, window=64, guard=16)[0])
        pallas = jax.jit(lambda a, b, c, d, e: turbo_decode(
            a, b, c, d, e, iterations=8, window=64, guard=16,
            bcjr_backend="pallas")[0])
        vmapped = jax.jit(jax.vmap(lambda a, b, c, d, e: turbo_decode(
            a, b, c, d, e, iterations=8, window=64, guard=16)[0]))

        dec = native(*args)
        ber = float((np.asarray(dec) != bits).mean())
        assert ber == 0.0, f"batched decode not clean: BER {ber}"
        dec_p = pallas(*args)
        agree = float((np.asarray(dec_p) == np.asarray(dec)).mean())
        assert agree == 1.0, f"pallas != xla bits: {agree}"

        d_nat, nat_s = _time(native, args, digest)
        d_pal, pal_s = _time(pallas, args, digest)
        if batch <= 256:  # the vmapped form at b1024 is prohibitively slow
            d_vm, vm_s = _time(vmapped, args, digest, rounds=2)
        else:
            d_vm, vm_s = None, []
        info = batch * n
        row = {
            "config": f"turbo n={n} 8it w64 g16 b{batch}",
            "native_ms": d_nat * 1e3,
            "native_info_mbit_s": info / d_nat / 1e6,
            "pallas_ms": d_pal * 1e3,
            "pallas_info_mbit_s": info / d_pal / 1e6,
            "vmapped_ms": None if d_vm is None else d_vm * 1e3,
            "vmapped_info_mbit_s": None if d_vm is None else info / d_vm / 1e6,
            "speedup_vs_vmapped": None if d_vm is None else d_vm / d_nat,
            "native_samples_ms": [s * 1e3 for s in nat_s],
            "pallas_samples_ms": [s * 1e3 for s in pal_s],
            "vmapped_samples_ms": [s * 1e3 for s in vm_s],
        }
        results.append(row)
        vm_txt = "-" if d_vm is None else f"{d_vm*1e3:.1f} ms ({d_vm/d_nat:.1f}x)"
        print(f"b{batch}: native {d_nat*1e3:.2f} ms = "
              f"{info/d_nat/1e6:.1f} Mbit/s; pallas {d_pal*1e3:.2f} ms = "
              f"{info/d_pal/1e6:.1f} Mbit/s (bits identical); "
              f"vmapped {vm_txt}", flush=True)

    out = {
        "bench": "turbo batched-BCJR (lane-axis batch) vs vmapped, chip A/B",
        "device": str(dev),
        "r4_floor_info_mbit_s": 20.0,
        "rows": results,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_turbo_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()

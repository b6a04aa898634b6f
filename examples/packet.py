"""Packet-link demo: the full burst transceiver over a hostile channel.

One PacketModem burst (CRC-32 -> DVB scrambler -> K=7 Viterbi FEC ->
interleaver -> QPSK behind a Gold-code preamble) is dropped at an unknown
offset into a long capture, scaled/rotated by an unknown complex gain,
spun by a carrier offset, and buried in AWGN. The receiver — one jittable
graph — acquires, corrects, decodes, and verifies the CRC.

Run: python examples/packet.py
"""

import _bootstrap  # noqa: F401  (offline bare-clone path setup)
import sys

import numpy as np


def main():
    import jax

    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from aether_primitives_tpu.models.packet import PacketConfig, PacketModem

    rng = np.random.default_rng(815)
    pm = PacketModem(
        PacketConfig(payload_bits=960, fec="viterbi", interleave_rows=4)
    )
    payload = rng.integers(0, 2, 960).astype(np.uint8)
    burst = np.asarray(pm.tx(payload))
    print(f"burst: {burst.size} symbols "
          f"({pm.preamble.size} preamble + {pm.n_data_symbols} data)")

    # hostile channel: unknown delay, gain, carrier offset, heavy AWGN
    capture = np.zeros(8192, np.complex64)
    delay, cfo, gain = 2741, 1.7e-3, 0.31 * np.exp(1j * 2.4)
    capture[delay : delay + burst.size] = burst
    capture *= gain * np.exp(2j * np.pi * cfo * np.arange(capture.size))
    capture += 0.15 * (
        rng.normal(size=capture.size) + 1j * rng.normal(size=capture.size)
    )
    capture = capture.astype(np.complex64)

    bits, ok, diag = pm.rx(capture)
    errs = int((np.asarray(bits) != payload).sum())
    print(f"offset: {int(diag['offset'])} (true {delay})")
    print(f"cfo: {float(diag['cfo']):.6f} cyc/sample (true {cfo})")
    print(f"gain magnitude: {abs(complex(np.asarray(diag['gain']))):.3f} "
          f"(true {abs(gain):.3f})")
    print(f"preamble metric: {float(diag['metric']):.3f}, "
          f"est. noise var: {float(diag['noise_var']):.3f}")
    print(f"CRC ok: {bool(ok)}; payload bit errors: {errs}/960")
    assert bool(ok) and errs == 0
    print("packet recovered exactly")


if __name__ == "__main__":
    main()

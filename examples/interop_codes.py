"""Standard-table interop: load a foreign LDPC code from a file and run
it through the full burst link (ops/code_io.py, round 5).

Three legs:

1. export the built-in 802.11n QC table to BOTH interchange formats
   (MacKay ``.alist`` and QC ``.npz``) and audit the reload with
   :func:`validate_parity_check` (rank/rate, degrees, girth report);
2. decode a noisy burst with ``PacketModem(fec="ldpc", ldpc_file=...)``
   — the file IS the code, nothing else changes;
3. drop a file-loaded base graph into the NR-style LDPC via
   ``nr_base_graph_file=`` (the TS 38.212 shift-table slot).

Run: python examples/interop_codes.py
"""

import _bootstrap  # noqa: F401
import tempfile
import os

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from aether_primitives_tpu.ops import code_io, ldpc
    from aether_primitives_tpu.ops.nr_ldpc import make_nr_base_graph
    from aether_primitives_tpu.models.packet import PacketConfig, PacketModem

    d = tempfile.mkdtemp(prefix="aether_codes_")
    rng = np.random.default_rng(7)

    # --- 1. export + audit
    h, _, _ = ldpc.wifi_ldpc()
    alist = os.path.join(d, "wifi_648.alist")
    qcnpz = os.path.join(d, "wifi_648_qc.npz")
    code_io.save_alist(h, alist)
    code_io.save_qc_npz(ldpc._WIFI_648_R12, 27, qcnpz)
    for path in (alist, qcnpz):
        h2, g, info = code_io.ldpc_from_file(path)
        rep = code_io.validate_parity_check(h2, expect_k=324)
        assert np.array_equal(h2, h)
        print(f"{os.path.basename(path):22s} -> {rep.summary()}")

    # --- 2. the file is the code: burst link round trip
    pm = PacketModem(PacketConfig(payload_bits=280, fec="ldpc",
                                  ldpc_file=qcnpz))
    payload = rng.integers(0, 2, 280).astype(np.uint8)
    burst = np.asarray(pm.tx(payload))
    cap = np.zeros(burst.size + 120, np.complex64)
    cap[57:57 + burst.size] = burst
    cap += 0.05 * (rng.normal(size=cap.shape)
                   + 1j * rng.normal(size=cap.shape))
    bits, ok, diag = pm.rx(cap.astype(np.complex64))
    assert bool(ok) and np.array_equal(np.asarray(bits), payload)
    print(f"ldpc_file burst link: payload exact, CRC ok "
          f"(offset {int(diag['offset'])}, QC edge decoder engaged: "
          f"{pm._ldpc_qc is not None})")

    # --- 3. NR base graph from a file
    bg = os.path.join(d, "bg2_seed99.npz")
    code_io.save_qc_npz(make_nr_base_graph(bg=2, z=64, seed=99), 64, bg)
    pm_nr = PacketModem(PacketConfig(payload_bits=500, fec="nr_ldpc",
                                     nr_base_graph_file=bg))
    p2 = rng.integers(0, 2, 500).astype(np.uint8)
    bits2, ok2, _ = pm_nr.loopback(p2)
    assert bool(ok2) and np.array_equal(np.asarray(bits2), p2)
    print("nr_base_graph_file loopback: payload exact (file-loaded "
          "graph replaced the built-in)")
    print("interop_codes: OK")


if __name__ == "__main__":
    main()

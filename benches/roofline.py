"""Roofline / MFU accounting for the headline chain and the top microbench
rows (VERDICT r3 item 5): every committed Msa/s figure gets its denominator —
achieved GB/s and TFLOP/s against the v5e ceilings, and % of the binding
roofline.

Machine model (public v5e numbers):
- HBM bandwidth: 819 GB/s
- MXU peak: 197 TFLOP/s bf16. Precision derating for the matmul paths this
  framework uses: HIGHEST = full-f32 emulation = 6 bf16 passes -> /6
  (~32.8 TFLOP/s); HIGH = bf16x3 = 3 passes -> /3 (~65.7 TFLOP/s).

Cost models (bytes = HBM reads + writes of the jitted graph's unfused
boundaries; flops = 8 * complex MACs):
- RX chain (fused two-einsum, dec=4, fft=2048, n1=16, K=65, HIGH):
  per 4M-sample block: e1 = nsym*n2*n1*k1, e2 = k1*nsym*n2*r,
  wrap = nsym*(K-1)*fft cMACs; bytes = in 33.5 MB + e1 out/in 33.5 MB +
  spectra out 8.4 MB (k1-leading sign demod reads it once) + bits 2 MB.
- fft 2048 (n1=128, HIGHEST, batch 2048 rows): cMACs = rows*n*(n1+n2);
  bytes = 3 passes of [rows, n] c64 (in, stage boundary, out).
- correlator 1024 (three chained ffts + 2 elementwise, n1=8, HIGHEST).
- vecops mul / bpsk modulate / qpsk demod: pure HBM traffic.

Reads the committed artifacts, prints the markdown table pasted into
BASELINE.md (run from repo root or benches/).
"""

import json
import os
import sys

HBM = 819e9
MXU_BF16 = 197e12
MXU_HIGHEST = MXU_BF16 / 6
MXU_HIGH = MXU_BF16 / 3

HERE = os.path.dirname(os.path.abspath(__file__))


def _load(name):
    with open(os.path.join(HERE, name)) as f:
        return json.load(f)


def row(label, t_s, nbytes, flops, mxu_peak):
    gbs = nbytes / t_s / 1e9
    tfs = flops / t_s / 1e12
    mem_frac = gbs * 1e9 / HBM
    mxu_frac = tfs * 1e12 / mxu_peak if mxu_peak else 0.0
    bound = "HBM" if mem_frac >= mxu_frac else "MXU"
    roof = max(mem_frac, mxu_frac)
    return (label, t_s, gbs, tfs, 100 * mem_frac, 100 * mxu_frac,
            bound, 100 * roof)


def main(bench_json="../BENCH_r03.json", micro_json="results_v5e_round3.json"):
    rows = []

    # ---- headline chain
    bench = json.load(open(os.path.join(HERE, bench_json)))
    if "tail" in bench:  # driver capture format: JSON line inside "tail"
        line = [l for l in bench["tail"].splitlines()
                if l.startswith("{\"metric\"")][-1]
        bench = json.loads(line)
    t_chain = bench["detail"]["ms_per_block"] / 1e3
    n = bench["detail"]["block_samples"]
    fft, dec, n1, k = 2048, 4, 16, 65
    span = fft * dec
    nsym, n2, r, k1 = n // span, span // n1, fft // n1, n1
    cmacs = nsym * n2 * n1 * k1 + k1 * nsym * n2 * r + nsym * (k - 1) * fft
    flops = 8 * cmacs
    nbytes = (n * 8) + (k1 * nsym * n2 * 8 * 2) + (k1 * nsym * r * 8) + n // 2
    rows.append(row(
        f"RX chain (streaming, {bench['value']:.0f} Msa/s)",
        t_chain, nbytes, flops, MXU_HIGH,
    ))

    # ---- microbench rows
    micro = _load(micro_json)["results"]

    def find(name):
        for rec in micro:
            if rec["bench"] == name and rec.get("us_per_call"):
                return rec
        raise KeyError(name)

    # fft 2048 fwd (batch = samples / 2048 rows)
    rec = find("fft 2048 fwd SN [batch]")
    t = rec["us_per_call"] / 1e6
    samples = rec["msamples_per_s"] * 1e6 * t
    rows_n = samples / 2048
    cmacs = rows_n * 2048 * (128 + 16)
    rows.append(row(
        f"fft 2048 fwd ({rec['msamples_per_s']:.0f} Msa/s)",
        t, 3 * samples * 8, 8 * cmacs, MXU_HIGHEST,
    ))

    # correlator 1024 (3 ffts n1=8 + elementwise mul; r3 row)
    rec = find("correlator 1024 [batch]")
    t = rec["us_per_call"] / 1e6
    samples = rec["msamples_per_s"] * 1e6 * t
    cmacs = 3 * samples * (8 + 128) + 2 * samples
    rows.append(row(
        f"correlator 1024 ({rec['msamples_per_s']:.0f} Msa/s)",
        t, 7 * samples * 8, 8 * cmacs, MXU_HIGHEST,
    ))

    # pure-bandwidth rows
    for name, bps, label in (
        ("vecops mul [batch x 2048]", 24, "vecops mul"),
        ("bpsk modulate 8000 bits [batch]", 9, "bpsk modulate"),
        ("qpsk demod 4000 syms [batch]", 8.25, "qpsk demod"),
    ):
        rec = find(name)
        t = rec["us_per_call"] / 1e6
        samples = rec["msamples_per_s"] * 1e6 * t
        rows.append(row(
            f"{label} ({rec['msamples_per_s']:.0f} Msa/s)",
            t, samples * bps, 0, None,
        ))

    print("| Row | time | GB/s | TFLOP/s | %HBM | %MXU@prec | bound | % of roofline |")
    print("|---|---|---|---|---|---|---|---|")
    for (label, t, gbs, tfs, memp, mxup, bound, roof) in rows:
        print(f"| {label} | {t*1e6:.0f} us | {gbs:.0f} | {tfs:.1f} | "
              f"{memp:.0f}% | {mxup:.0f}% | {bound} | {roof:.0f}% |")


if __name__ == "__main__":
    main(*sys.argv[1:])

"""Headline benchmark shim — the driver entry point.

Implementation lives in :mod:`aether_primitives_tpu.cli` (``bench_main``),
also installed as the ``aether-bench`` console script. Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N}``.
"""

from aether_primitives_tpu.cli import bench_main

if __name__ == "__main__":
    bench_main()

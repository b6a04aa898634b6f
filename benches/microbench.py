"""Micro-benchmark shim — criterion-equivalent suite
(reference benches/benches.rs). Implementation:
:func:`aether_primitives_tpu.cli.microbench_main`, also installed as the
``aether-microbench`` console script.

Usage: python benches/microbench.py [--cpu] [--json out.json]
"""

from aether_primitives_tpu.cli import microbench_main

if __name__ == "__main__":
    microbench_main()

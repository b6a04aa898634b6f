"""Micro-benchmark shim — criterion-equivalent suite
(reference benches/benches.rs). Implementation:
:func:`aether_primitives_tpu.cli.microbench_main`, also installed as the
``aether-microbench`` console script.

Usage: python benches/microbench.py [--cpu] [--json out.json]
"""

try:
    import aether_primitives_tpu  # noqa: F401
except ModuleNotFoundError:  # bare offline clone: resolve the in-tree package
    import os as _os
    import sys as _sys

    _sys.path.append(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from aether_primitives_tpu.cli import microbench_main

if __name__ == "__main__":
    microbench_main()

"""Docstring examples as executable contracts.

The reference uses doctests as API contracts (fft round-trip + DC-bin
energy src/fft.rs:84-120, pool checkout src/pool.rs:13-42, sequence
expansion src/sequence.rs:4-46); this runs the framework's equivalents
under the CPU test config so every published example is known-correct.
"""

import doctest

import pytest

import aether_primitives_tpu.models.ddc as ddc_mod
import aether_primitives_tpu.ops.fft as fft_mod
import aether_primitives_tpu.ops.frontend as frontend_mod
import aether_primitives_tpu.ops.sequence as sequence_mod
import aether_primitives_tpu.ops.vecops as vecops_mod
import aether_primitives_tpu.parallel.streaming as streaming_mod
import aether_primitives_tpu.utils.db as db_mod
import aether_primitives_tpu.utils.profiling as profiling_mod

_MODULES = [
    ddc_mod,
    frontend_mod,
    fft_mod,
    sequence_mod,
    vecops_mod,
    streaming_mod,
    db_mod,
    profiling_mod,
]


@pytest.mark.parametrize("mod", _MODULES, ids=lambda m: m.__name__)
def test_module_doctests(mod):
    result = doctest.testmod(
        mod, optionflags=doctest.NORMALIZE_WHITESPACE, verbose=False
    )
    assert result.attempted > 0 or mod is profiling_mod, mod.__name__
    assert result.failed == 0, f"{result.failed} doctest failures in {mod.__name__}"

"""Make ``python examples/<name>.py`` work from a bare, offline clone.

If ``aether_primitives_tpu`` is already installed (``pip install -e .``,
the CI path) this is a no-op; otherwise the repo root — the parent of this
``examples/`` directory — is appended to ``sys.path`` so the in-tree
package resolves.  One shared module instead of per-file ``sys.path``
hacks (round-1 advisor finding); pip's build isolation needs network, so
a bare offline clone must not require installation to run the demos.
"""

import os
import sys

try:
    import aether_primitives_tpu  # noqa: F401
except ModuleNotFoundError:
    sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

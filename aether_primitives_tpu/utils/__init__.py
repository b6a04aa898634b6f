"""I/O, dB conversion, metrics, and visualization utilities."""

from .db import DB
from . import db
from . import file

__all__ = ["DB", "db", "file", "plot", "metrics"]


def __getattr__(name):
    # plot pulls in matplotlib; import lazily so headless/compute-only
    # environments never pay for it (the reference gates plotting behind a
    # cargo feature, Cargo.toml:39-46 — this is the Python analog).
    if name == "plot":
        from . import plot

        return plot
    if name == "metrics":
        from . import metrics

        return metrics
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

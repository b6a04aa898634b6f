"""I/O, dB conversion, metrics, and visualization utilities."""

from .db import DB
from . import db
from . import file

__all__ = ["DB", "db", "file", "plot", "metrics"]


def __getattr__(name):
    # plot pulls in matplotlib; import lazily so headless/compute-only
    # environments never pay for it (the reference gates plotting behind a
    # cargo feature, Cargo.toml:39-46 — this is the Python analog).
    if name in ("plot", "metrics"):
        import importlib

        mod = importlib.import_module("." + name, __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

"""Disk cache for setup-phase artifacts.

The offline setup (mRPI, Gilbert–Tan, tightening, QP assembly) for the 4-D
cartpole takes ~1 minute on this host; the reference pays the same cost on
every script run.  ``cached_setup`` memoizes any ``setup_*`` call to a
pickle keyed by a hash of the function name and arguments, under
``.rtmpc_cache/`` (gitignored).
"""

from __future__ import annotations

import hashlib
import os
import pickle

import numpy as np

__all__ = ["cached_setup", "CACHE_DIR"]

# Bump when the pickled MPCSetup schema changes (e.g. new QPTemplate
# fields): stale entries are keyed out rather than half-loaded.
_SCHEMA = 2

CACHE_DIR = os.environ.get(
    "RTMPC_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".rtmpc_cache"))


def _digest(obj) -> str:
    h = hashlib.sha256()

    def feed(o):
        if isinstance(o, np.ndarray):
            h.update(b"nd")
            h.update(str(o.shape).encode())
            h.update(np.ascontiguousarray(o).tobytes())
        elif isinstance(o, (list, tuple)):
            h.update(b"seq")
            for it in o:
                feed(it)
        elif isinstance(o, dict):
            h.update(b"map")
            for k in sorted(o):
                feed(k)
                feed(o[k])
        elif hasattr(o, "A") and hasattr(o, "b"):   # Polytope
            h.update(b"poly")
            feed(o.A)
            feed(o.b)
        else:
            h.update(repr(o).encode())

    feed(obj)
    return h.hexdigest()[:24]


def cached_setup(fn, *args, cache: bool = True, **kwargs):
    """``cached_setup(setup_tube_tracking, A, B, ...)`` with disk memo."""
    if not cache:
        return fn(*args, **kwargs)
    key = _digest((fn.__name__, _SCHEMA, args, kwargs))
    path = os.path.join(CACHE_DIR, f"{fn.__name__}-{key}.pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                return pickle.load(f)
        except Exception:
            pass  # stale/corrupt cache entry: recompute
    out = fn(*args, **kwargs)
    os.makedirs(CACHE_DIR, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(out, f)
    os.replace(tmp, path)
    return out

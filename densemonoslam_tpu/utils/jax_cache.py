"""Persistent XLA compilation cache setup.

The SLAM pipeline compiles a handful of large programs (the fused per-frame
step, bundle adjustment, map compaction, loop-closure programs); on this
class of host a single `compact` at 4M-row capacity costs ~13 s of COMPILE
time.  Programs that first run mid-sequence (BA once enough keyframes exist,
compaction at its cadence, PGO on the first loop) would otherwise stall the
live pipeline — the persistent cache makes every compile a once-per-machine
cost (measured 22.3 s -> 1.0 s across processes).

Opt out with ``DMS_JAX_CACHE=0``; override the location with
``DMS_JAX_CACHE=/path``.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable(path: str | None = None) -> bool:
    """Point JAX at a persistent compilation cache directory.  Safe to call
    multiple times; returns True when the cache is active."""
    env = os.environ.get("DMS_JAX_CACHE", "")
    if env == "0":
        return False
    path = path or (env if env not in ("", "1") else None) or _DEFAULT
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return True
    except Exception:  # pragma: no cover — never break startup over a cache
        return False

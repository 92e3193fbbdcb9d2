"""Persistent XLA compilation cache setup.

The reference has no compile step at all (eager torch); our every entry point
pays an XLA compile, and on this machine that compile goes through a remote
TPU compile service with highly variable latency (12-417 s observed for the
identical ORIE program — CLAUDE.md "Known flakiness"). JAX's persistent
compilation cache keys the serialized executable by program hash, so the
second run of any unchanged program loads from disk in milliseconds instead.

Call enable_compilation_cache() before the first jit execution (bench.py and
every CLI do). Opt out with EDGEML_COMPILE_CACHE=off; point elsewhere with
EDGEML_COMPILE_CACHE=/path.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)

_enabled = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache (idempotent).

    :param path: cache directory; default $EDGEML_COMPILE_CACHE or
        <repo>/.jax_cache. "off" disables.
    :return: the cache dir in effect, or None if disabled.
    """
    global _enabled
    explicit = path is not None or "EDGEML_COMPILE_CACHE" in os.environ
    path = path or os.environ.get("EDGEML_COMPILE_CACHE", _DEFAULT)
    if path == "off":
        return None
    if not explicit and os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # CPU runs (tests) skip the cache by default: XLA:CPU AOT results
        # embed exact machine features and the loader warns/SIGILL-risks on
        # any mismatch, and CPU compiles are local anyway — the cache exists
        # for the TPU remote-compile round trip (12-417 s observed).
        return None
    if _enabled:
        return path
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything: the default thresholds skip sub-second compiles, but
    # on this machine even trivial programs pay the remote-compile round trip.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return path

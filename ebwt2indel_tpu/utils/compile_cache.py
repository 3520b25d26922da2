"""Persistent XLA compilation cache.

The traversal/cluster/calling programs compile once per (n, chunk, flags)
shape family; on the remote-tunnel TPU backend a cold mode-1 compile costs
~5 minutes. JAX's persistent compilation cache removes that cost across
processes (measured 12.4 s -> 0.3 s for a probe program on this backend),
so it is enabled by default for every pipeline entry point.

Knob: ``EBWT_COMPILE_CACHE`` — a directory path; set to ``0`` or the empty
string to disable; unset for the default ``~/.cache/ebwt2indel_tpu/xla``.
The cache has no size bound or eviction (see docs/KNOBS.md for the
tradeoff); delete the directory to reclaim space.

``enable()`` is called from the entry points (cli.main, the pipeline
run_* functions, bench) rather than at import time, so importing the
package never mutates global jax config and a library consumer can set
``EBWT_COMPILE_CACHE`` (or jax's own cache config) before the first run.
"""

from __future__ import annotations

import os

_DONE = False


def enable() -> None:
    """Idempotently point jax at a persistent compilation cache dir."""
    global _DONE
    if _DONE:
        return
    _DONE = True
    val = os.environ.get("EBWT_COMPILE_CACHE")
    if "EBWT_COMPILE_CACHE" in os.environ and val in ("", "0"):
        return
    if val is None and os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        # default-on only for the remote TPU backend, where a compile
        # costs minutes. CPU compiles are fast, and serializing certain
        # CPU executables for the cache write segfaults the process
        # (observed in jax's put_executable_and_time during the test
        # suite). Set EBWT_COMPILE_CACHE explicitly to force it on CPU.
        return
    cache_dir = val or os.path.join(
        os.path.expanduser("~"), ".cache", "ebwt2indel_tpu", "xla"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every program: the pipeline's many medium-sized traversal /
        # cluster programs all sit behind one process-fatal recompile wall.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

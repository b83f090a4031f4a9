"""Persistent XLA compilation cache for the CLI/serving entry points.

TPU graph compiles are expensive (minutes through a remote relay; tens of
seconds locally), and the codec's jitted graphs are identical across CLI
invocations for a given model/config. Enabling JAX's persistent compilation
cache makes every invocation after the first start hot.

Opt out with VQVDB_COMPILE_CACHE=off; point elsewhere with
VQVDB_COMPILE_CACHE=/path. The reference has no analogous concern (ORT
sessions deserialize pre-built graphs; our equivalent of its "embedded
model" startup cost is exactly this cache).

Caveat: cached CPU executables are AOT artifacts tied to the compiling
machine's ISA features; jax detects mismatches at load (logs a warning and
may refuse the entry). Do not share the cache directory between
heterogeneous hosts — it defaults under $XDG_CACHE_HOME, which is
per-machine in sane setups.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_persistent_cache() -> str | None:
    """Configure jax's persistent compilation cache; returns the directory
    used, or None if disabled/unsupported."""
    loc = os.environ.get("VQVDB_COMPILE_CACHE", "")
    if loc.lower() == "off":
        return None
    cache_dir = Path(loc) if loc else (
        Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
        / "vqvdb_tpu" / "xla")
    try:
        import jax

        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        # Cache everything: tiny graphs recompile fast anyway, but the relay
        # round trip dominates, so no minimum-size/time gate.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        return str(cache_dir)
    except Exception:
        return None  # unsupported jax version or read-only filesystem

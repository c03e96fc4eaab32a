"""Persistent XLA compilation cache for the tunneled TPU.

First compile of a conv graph over the axon tunnel costs 100-300+s
(remote compile, see CLAUDE.md); JAX's persistent compilation cache
amortizes that across processes AND across driver rounds.  Enabled by
default for bench/CLI entry points; set ``CAE_TPU_COMPILE_CACHE=0`` to
disable, ``CAE_TPU_CACHE_DIR`` to relocate the directory.

The reference has no equivalent (torch eager, no compile step); this is
TPU-native plumbing, not a ported feature.
"""

import os


def default_cache_dir() -> str:
    # repo checkout root (the package's parent) -> .jax_cache
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(pkg), ".jax_cache")


def _user_cache_dir() -> str:
    # pip-installed layout: the package parent is site-packages (not a
    # writable checkout) — cache under the user's cache dir instead
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "cae_tools_tpu", "jax")


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache.

    Safe to call multiple times and before/after the first jax import;
    must run before the first compilation to help that compilation.
    Returns the cache dir in use, or None when disabled/unavailable.
    """
    if os.environ.get("CAE_TPU_COMPILE_CACHE", "1") == "0":
        return None
    explicit = path or os.environ.get("CAE_TPU_CACHE_DIR")
    for candidate in filter(None, (explicit, default_cache_dir(),
                                   _user_cache_dir())):
        try:
            os.makedirs(candidate, exist_ok=True)
            import jax

            jax.config.update("jax_compilation_cache_dir", candidate)
            # the tunnel makes even small graphs expensive; cache everything
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
            return candidate
        except Exception:  # pragma: no cover - old jax / read-only fs
            continue
    return None

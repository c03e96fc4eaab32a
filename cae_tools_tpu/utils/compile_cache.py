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


def _patch_location_free_mosaic() -> None:
    """Strip source locations from Pallas/Mosaic kernel payloads.

    XLA's cache key canonicalizes the StableHLO with ``strip-debuginfo``,
    but a Pallas kernel rides inside ``tpu_custom_call`` as *serialized
    MLIR bytecode* whose internal location info (file + line of the
    kernel source) survives canonicalization.  Any edit that shifts line
    numbers in a pallas-bearing module therefore churns the cache key of
    every graph embedding a kernel — measured: a one-line comment shift
    in ops/pallas/train_tail.py changed the canonical IR hash, forcing
    400-500 s remote recompiles of the big train graphs on every edit.

    Fix at the source: run ``strip-debuginfo`` on the Mosaic module
    before it is serialized into the custom call, so the payload itself
    is location-free (kernel error messages lose source lines — set
    ``CAE_TPU_KERNEL_DEBUG_LOC=1`` to keep them and accept key churn).
    """
    if os.environ.get("CAE_TPU_KERNEL_DEBUG_LOC") == "1":
        return
    try:
        from jax._src import tpu_custom_call as tcc
        from jaxlib.mlir.passmanager import PassManager
    except Exception:  # pragma: no cover - layout changed in a new jax
        return
    orig = getattr(tcc, "_lower_mosaic_module_to_asm", None)
    if orig is None or getattr(orig, "_cae_locfree", False):
        return

    def patched(module, **kw):
        try:
            with module.context:
                clone = module.operation.clone()
                PassManager.parse(
                    "builtin.module(strip-debuginfo)"
                ).run(clone)
            return orig(clone, **kw)
        except Exception:  # pragma: no cover - fall back to locations
            return orig(module, **kw)

    patched._cae_locfree = True
    tcc._lower_mosaic_module_to_asm = patched


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
    _patch_location_free_mosaic()
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

"""gpd_tpu: TPU-native grasp pose detection (see README.md).

Enables JAX's persistent compilation cache: the detection pipeline is a few
large fused XLA programs whose first compile is expensive (notably on
remote-compile TPU backends); caching makes every later process start fast.
"""

import os as _os

import jax as _jax

if _os.environ.get("GPD_FORCE_CPU"):
    # Real CPU override for apps/tools: the TPU harness's sitecustomize
    # clobbers an inherited JAX_PLATFORMS=cpu at interpreter start, so env
    # alone cannot switch backends (CLAUDE.md); the jax.config update works
    # as long as it happens before first backend use — which importing this
    # package guarantees for every gpd_tpu entry point.
    _jax.config.update("jax_platforms", "cpu")
    _os.environ["JAX_PLATFORMS"] = "cpu"

if (_os.environ.get("GPD_TPU_DISABLE_CACHE") != "1"
        and not _os.environ.get("JAX_PLATFORMS", "").startswith("cpu")):
    # CPU runs skip the cache: XLA:CPU AOT artifacts embed machine features
    # and a cache entry written by a different host (e.g. the remote-compile
    # helper) can SIGILL on load.
    _cache = _os.environ.get(
        "GPD_TPU_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization only
        pass

"""Repo-local persistent XLA compilation cache for chip-side entrypoints.

The driver's environment does not share /tmp with the builder's (measured
round 4: every driver bench run compiled cold and the ungated headline ate
the whole budget), so anything that wants warm compiles across processes
must cache inside the repo. bench.py sets this up inline for its own
subdir; the chip tools (ss_convergence, dualcrop_headroom, profile_step)
share one subdir here so repeated experiment runs — which reuse the same
train/SS-step shapes — pay each compile once.

Reference parity: the reference has no equivalent (torch caches kernels
per-process only); this is TPU-operational plumbing, not surface API.
"""

from __future__ import annotations

import os
import pathlib

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]


def enable_persistent_cache(subdir: str = "tools",
                            min_compile_secs: float = 5.0) -> pathlib.Path:
    """Point JAX's persistent compilation cache at .jax_cache/<subdir>.

    Call BEFORE the first jit dispatch. Returns the cache directory.
    Honors an explicit JAX_COMPILATION_CACHE_DIR in the environment
    (e.g. a test pointing the tool at a scratch dir).
    """
    import jax

    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    cache = pathlib.Path(env) if env else _REPO_ROOT / ".jax_cache" / subdir
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache

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

import hashlib
import os
import pathlib
import platform
import re

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]


def machine_fingerprint() -> str:
    """8-hex fingerprint of this host's CPU feature set.

    XLA:CPU AOT cache entries encode the compile machine's features but
    the persistent-cache key does NOT, so loading another machine's
    entries can SIGILL the process (observed r5: killed a pod-DP test
    worker mid-collective). CPU caches must be keyed by this; TPU caches
    need not be (the compiled binary targets the chip, not the host).
    """
    try:
        with open("/proc/cpuinfo") as f:
            m = re.search(r"^flags\s*:\s*(.*)$", f.read(), re.M)
        feats = m.group(1) if m else platform.machine()
    except OSError:
        feats = platform.machine()
    return hashlib.sha1(feats.encode()).hexdigest()[:8]


def enable_persistent_cache(subdir: str = "tools",
                            min_compile_secs: float = 5.0) -> pathlib.Path:
    """Point JAX's persistent compilation cache at .jax_cache/<subdir>.

    Call BEFORE the first jit dispatch. Returns the cache directory.
    Honors an explicit JAX_COMPILATION_CACHE_DIR in the environment
    (e.g. a test pointing the tool at a scratch dir). CPU backends get a
    machine-fingerprint subdir (see machine_fingerprint).
    """
    import jax

    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    cache = pathlib.Path(env) if env else _REPO_ROOT / ".jax_cache" / subdir
    if env is None and jax.default_backend() == "cpu":
        cache = cache / machine_fingerprint()
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache

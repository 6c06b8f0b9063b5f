"""Shared helpers for tests that spawn python subprocesses."""

import os

from epipolarpose_tpu.utils.compile_cache import machine_fingerprint


def test_cache_dir() -> str:
    """Repo-local, MACHINE-KEYED persistent compile cache for the suite.

    The fingerprint subdir exists because XLA:CPU AOT entries written on
    another box can SIGILL this one (observed r5: a pod worker died
    mid-collective — Gloo "connection closed by peer" — right after the
    loader warned about a feature mismatch in `.jax_cache/tests`).
    """
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache", "tests",
        machine_fingerprint())


def cpu_env(**extra) -> dict:
    """Subprocess env that runs jax on the HOST CPU, really.

    ``JAX_PLATFORMS=cpu`` alone is NOT enough: the axon sitecustomize
    registers the tunneled TPU plugin at interpreter start and rewrites
    jax_platforms, so "CPU" CLI tests silently dispatch every step through
    the high-RTT tunnel (measured: a 16 s refiner run took 215 s).
    Dropping ``PALLAS_AXON_POOL_IPS`` disables that registration entirely.

    Also shares the persistent compilation cache with the in-process suite
    (conftest.py) so repeated subprocess compiles of identical HLO are free.
    """
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env.update(JAX_PLATFORMS="cpu", MPLBACKEND="Agg")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", test_cache_dir())
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    env.update({k: str(v) for k, v in extra.items()})
    return env

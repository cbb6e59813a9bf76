"""Persistent XLA compile-cache helper.

One rule, applied everywhere (CLI, bench, probes, demo, driver entry): the
persistent cache is enabled ONLY for TPU runs. TPU executables are
host-portable and expensive to build, so they go to a shared
``.jax_cache``. XLA:CPU AOT blobs, by contrast, never load back: the
compiler stamps pseudo-features (``+prefer-no-scatter``,
``+prefer-no-gather``) into the target machine that the loader then fails
to find in the *host* feature list — every load errors with a
feature-mismatch wall (MULTICHIP_r04 tail; reproduced same-machine in
round 5), so on CPU the cache is pure overhead plus log noise.

Must go through ``jax.config.update``, not env vars: this machine's
sitecustomize imports jax at interpreter startup, so the config is already
frozen from the environment before library code runs.
"""
from __future__ import annotations

import os.path as osp


def enable_compile_cache(repo_root: str, platform: str | None = None):
    """Enable the persistent compilation cache at ``<repo_root>/.jax_cache``
    unless ``platform`` (defaults to jax's configured platform) is cpu, in
    which case the cache stays disabled. Returns the chosen directory or
    None."""
    import jax

    if platform is None:
        platform = jax.config.jax_platforms or ""
    if "cpu" in str(platform):
        return None
    cache = osp.join(repo_root, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache

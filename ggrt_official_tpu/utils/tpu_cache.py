"""Persistent-compile-cache hygiene for the tunneled TPU backend.

Round-5 measured failure mode (BENCH_NOTES "round-5 infra"): a cache HIT
on a serialized executable larger than ~100 MB wedges the axon tunnel —
the client blocks forever at the first dispatch with 0 CPU, no network,
and no error (the tunnel's ~100 MB payload limit, which surfaces as an
explicit HTTP 413 for large HLO constants, is swallowed silently on the
executable-deserialize path). In-process COMPILES of the same graphs
work, and writing their >100 MB executables back to the cache works; only
re-loading them in a later process wedges.

Mitigation: purge oversize entries before the first TPU dispatch, so big
graphs recompile in-process (~5-7 min each) and every smaller graph still
cache-hits. Call `purge_oversize_entries` from any TPU entry point after
setting `jax_compilation_cache_dir`.
"""
from __future__ import annotations

import os

# Comfortably under the observed ~100 MB tunnel payload limit; entries in
# 90-100 MB were not individually bisected and are not worth the risk.
TUNNEL_SAFE_ENTRY_BYTES = 90 * 1024 * 1024


def purge_oversize_entries(cache_dir: str,
                           limit_bytes: int = TUNNEL_SAFE_ENTRY_BYTES,
                           verbose: bool = True) -> list[str]:
    """Delete persistent-cache entries whose serialized executable exceeds
    the tunnel-safe size. Returns the purged filenames."""
    purged = []
    try:
        names = os.listdir(cache_dir)
    except OSError:
        return purged
    for name in names:
        path = os.path.join(cache_dir, name)
        try:
            if os.path.isfile(path) and os.path.getsize(path) > limit_bytes:
                os.remove(path)
                purged.append(name)
        except OSError:
            continue
    if purged and verbose:
        print(f"[tpu_cache] purged {len(purged)} oversize cache entries "
              f"(> {limit_bytes >> 20} MB: tunnel-wedge risk)", flush=True)
    return purged

"""Model artifact store — named checkpoints resolved to local paths.

The reference fetches named checkpoints from remote URLs into
``~/.cache/bdikit/models`` (``bdikit/download.py:7-20,51-59``). This
environment has no network, so the engine ships the same RESOLUTION
contract with the fetch stage pluggable:

- a process-local registry maps model names to directories (tests,
  air-gapped deploys, pre-baked images register paths explicitly);
- unresolved names fall back to the cache directory layout
  (``$BDI_SPARK_CACHE or ~/.cache/bdi_spark/models/<name>``) so
  pre-downloaded checkpoints are picked up without registration;
- a missing model raises with the exact path to provision, instead of
  attempting a download mid-job (a 1000-executor cluster must NEVER
  lazily download per executor — bake or broadcast artifacts);
- ``distribute_model`` ships a local artifact directory to every
  executor via ``SparkContext.addFile(recursive=True)`` once, from the
  driver — executors then read it with ``SparkFiles.get`` (the
  cluster-correct alternative to shared filesystems).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

_REGISTRY: Dict[str, str] = {}


def cache_root() -> str:
    return os.environ.get(
        "BDI_SPARK_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "bdi_spark"),
    )


def model_cache_path(name: str) -> str:
    """Where a named checkpoint lives in the local cache layout."""
    safe = name.replace("/", "__")
    return os.path.join(cache_root(), "models", safe)


def register_model_path(name: str, path: str) -> None:
    """Point a model name at a local directory (highest precedence)."""
    _REGISTRY[name] = path


def resolve_model(name: str, required: bool = True) -> Optional[str]:
    """Resolve a model name to a local directory: explicit registration
    first, then the cache layout. Raises (or returns None) when absent —
    never downloads."""
    if name in _REGISTRY:
        return _REGISTRY[name]
    cached = model_cache_path(name)
    if os.path.isdir(cached):
        return cached
    if required:
        raise FileNotFoundError(
            f"Model {name!r} is not provisioned. Place the checkpoint at "
            f"{cached} (or register_model_path({name!r}, <dir>)). This "
            "engine never downloads artifacts inside a job."
        )
    return None


def distribute_model(spark, name: str) -> str:
    """Ship the resolved artifact directory to every executor once
    (``addFile(recursive=True)``); returns the basename executors pass to
    ``SparkFiles.get`` inside UDFs."""
    path = resolve_model(name)
    spark.sparkContext.addFile(path, recursive=True)
    return os.path.basename(path.rstrip(os.sep))

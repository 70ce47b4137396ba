"""Scratch-space resolution for queries that materialize intermediate
state (write-roundtrip lake partitions, persisted IVF indexes).

The scratch root is NOT hardcoded to a checkout location: it resolves, in
order, (1) the ``DATALAKE_SPARK_SCRATCH`` env var, (2) a ``.scratch``
directory next to this package (works from any checkout path), falling
back to (3) a per-user tempdir when the repo directory is read-only.
Sub-paths are keyed by a short hash of the FULL input directory so two
fixtures with the same basename (e.g. ``/a/sf0.01`` vs ``/b/sf0.01``)
never collide.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from pathlib import Path


def scratch_root() -> str:
    env = os.environ.get("DATALAKE_SPARK_SCRATCH")
    if env:
        return env.rstrip("/")
    repo_scratch = Path(__file__).resolve().parents[1] / ".scratch"
    try:
        repo_scratch.mkdir(parents=True, exist_ok=True)
        return str(repo_scratch)
    except OSError:
        d = Path(tempfile.gettempdir()) / f"datalake_spark_scratch_{os.getuid()}"
        d.mkdir(parents=True, exist_ok=True)
        return str(d)


def scratch_dir(kind: str, sf_dir: str) -> str:
    """Deterministic per-(kind, input-dir) scratch path, collision-free
    across same-basename inputs."""
    sf_abs = os.path.abspath(sf_dir.rstrip("/"))
    digest = hashlib.sha1(sf_abs.encode()).hexdigest()[:8]
    tag = f"{os.path.basename(sf_abs) or 'sf'}_{digest}"
    return f"{scratch_root()}/{kind}_{tag}"

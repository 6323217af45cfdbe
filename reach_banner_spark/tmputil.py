"""Shared /tmp-cache hygiene helpers.

Two disciplines several modules need identically (streaming work dirs,
the materialized triple table's staging dirs, bucketed-table GC):

- ``source_fingerprint``: content fingerprint of a parquet file-or-dir
  (full path + per-file size/mtime) so two corpora sharing a basename, or
  parquet regenerated in place, never silently reuse a stale cache.
- ``sweep_dead_dirs``: remove pid-suffixed dirs whose owning process is
  gone (and, optionally, this process's own prior dirs), keeping /tmp
  bounded without racing concurrent live processes.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil


def source_fingerprint(path: str) -> str:
    """Content fingerprint (full path + per-file size/mtime) of a parquet
    file-or-dir — the stale-cache guard join_bucketed introduced: two sf
    dirs sharing a basename, or parquet regenerated in place, must never
    silently reuse a stale derived copy."""
    h = hashlib.sha1(path.encode())
    files = (
        sorted(
            os.path.join(path, f) for f in os.listdir(path) if not f.startswith("_")
        )
        if os.path.isdir(path)
        else [path]
    )
    for fp in files:
        st = os.stat(fp)
        h.update(f"{fp}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:10]


def sweep_dead_dirs(prefix: str, keep_own: bool) -> None:
    """rmtree every ``prefix<pid>`` dir whose pid is not a live process.

    ``keep_own=False`` also removes THIS process's prior dirs (work dirs
    re-created per invocation); ``keep_own=True`` preserves them (staging
    dirs the caller is about to reuse or rename). Dirs with a non-numeric
    suffix are treated as stale and removed."""
    for old in glob.glob(prefix + "*"):
        pid = old[len(prefix):]
        own = pid.isdigit() and int(pid) == os.getpid()
        alive = pid.isdigit() and os.path.exists(f"/proc/{pid}")
        if (own and keep_own) or (alive and not own):
            continue
        shutil.rmtree(old, ignore_errors=True)

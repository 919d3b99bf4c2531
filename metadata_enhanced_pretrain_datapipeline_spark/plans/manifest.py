"""Run-manifest incremental skip.

The reference re-runs pipelines incrementally by skipping completed Slurm
ranks (``skip_completed``, slurm_nodes.py:105,257-263: a 'completions'
marker file per rank). The Spark equivalent tracks completed *input units*
(paths / partition values) in a manifest file next to the output, so a
re-run plans only the unfinished inputs — idempotent re-execution without
a scheduler.
"""

from __future__ import annotations

import json
import os


class RunManifest:
    """A tiny JSON set of completed unit keys (one file, atomic rewrite).

    At cluster scale this would live on the shared store next to the output
    dir (same place the reference writes its completions/ markers).
    """

    def __init__(self, path: str):
        self.path = path
        self._done: set[str] = set()
        if os.path.exists(path):
            with open(path) as f:
                self._done = set(json.load(f))

    def pending(self, units: list[str]) -> list[str]:
        return [u for u in units if u not in self._done]

    def mark_done(self, unit: str) -> None:
        # read-merge-write under an advisory file lock so concurrent
        # instances (retried drivers, parallel runs) cannot interleave and
        # lose each other's completions; the lock file sits next to the
        # manifest (same shared store the reference's completions/ markers
        # use). Merging the on-disk set also folds in units marked by
        # writers that finished before we acquired the lock.
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        lock_path = self.path + ".lock"
        with open(lock_path, "w") as lock:
            try:
                import fcntl

                fcntl.flock(lock, fcntl.LOCK_EX)
            except (ImportError, OSError):
                # non-POSIX (no fcntl) or a filesystem whose flock raises
                # OSError (some NFS mounts): fall back to merge-only safety
                pass
            if os.path.exists(self.path):
                try:
                    with open(self.path) as f:
                        self._done |= set(json.load(f))
                except (OSError, ValueError):
                    pass
            self._done.add(unit)
            tmp = f"{self.path}.{os.getpid()}.tmp"
            with open(tmp, "w") as f:
                json.dump(sorted(self._done), f)
            os.replace(tmp, self.path)

    def run_incremental(self, units: list[str], fn) -> list[str]:
        """Execute fn(unit) for each pending unit, marking completion after
        each — a crash resumes exactly where it stopped (skip_completed
        semantics). The done-check runs per iteration so duplicate keys in
        ``units`` execute once, not once per occurrence."""
        ran = []
        for u in units:
            if u in self._done:
                continue
            fn(u)
            self.mark_done(u)
            ran.append(u)
        return ran

"""Incremental scheduling: the done-signal protocol + linear DAG runner.

Reference semantics (luigi-pipeline/luigi_commons.py:17-28,38-109;
main.py:201-235):

- every task owns a done-signal whose content is the fingerprint of its
  input at the time it last ran;
- a task is complete iff its done-signal content equals the *current*
  fingerprint of its input (``signal_files_matches``); any upstream
  change invalidates everything downstream;
- forcing a re-run = deleting the done-signal (remove_done_files.sh:3);
- the DAG is an explicitly wired list of tasks, each naming its
  required_tasks (DynamicDependenciesTask.requires, luigi_commons.py:
  31-35).

Fingerprints are directory-manifest digests (sorted "path sha1" lines,
main.py:66-68) computed *distributed* via the manifest scan + digest
operators — the driver only ever holds the 40-char digest.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pmc_conversion_spark.operators.aggregates import manifest_digest
from pmc_conversion_spark.sources.scans import manifest_with_checksums


def dir_fingerprint(spark: SparkSession, path: str) -> str:
    """SHA-1 of the sorted manifest digest of a directory (empty dir or
    missing dir -> fingerprint of the empty string)."""
    if not os.path.isdir(path) or not any(
            not f.startswith(".") for _, _, fs in os.walk(path) for f in fs):
        import hashlib
        return hashlib.sha1(b"").hexdigest()
    digest_df = manifest_digest(manifest_with_checksums(spark, path))
    return digest_df.select(
        F.sha1(F.encode("digest", "UTF-8")).alias("d")).collect()[0]["d"]


@dataclass
class Task:
    """One pipeline stage. ``input_dirs`` are fingerprinted to form the
    input signal; ``run`` produces the stage outputs."""
    name: str
    input_dirs: list[str]
    run: Callable[[], None]
    required_tasks: list["Task"] = field(default_factory=list)


class SignalStore:
    """Done-signal files, one per task (``.done-<name>`` equivalent)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, task: str) -> str:
        return os.path.join(self.root, f".done-{task}")

    def read(self, task: str) -> str | None:
        p = self._path(task)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read().strip()

    def write(self, task: str, signal: str) -> None:
        with open(self._path(task), "w") as f:
            f.write(signal)

    def remove(self, task: str | None = None) -> None:
        """Force re-run: drop one signal or all (remove_done_files.sh:3)."""
        if task is not None:
            try:
                os.remove(self._path(task))
            except FileNotFoundError:
                pass
            return
        for f in os.listdir(self.root):
            if f.startswith(".done-"):
                os.remove(os.path.join(self.root, f))


class DagRunner:
    """Topological execution with done-signal skipping.

    ``run_pipeline`` returns the per-task status list: 'skipped' when the
    input signal matches the done signal (luigi_commons.py:69-80), else
    'ran'. Tasks run in dependency order; a linear chain reproduces
    main.py:201-235 exactly.
    """

    def __init__(self, spark: SparkSession, signals: SignalStore):
        self.spark = spark
        self.signals = signals

    def input_signal(self, task: Task) -> str:
        parts = [f"{d}:{dir_fingerprint(self.spark, d)}"
                 for d in sorted(task.input_dirs)]
        # Upstream identity is part of the signal so a re-run upstream
        # (even yielding identical dirs listed) chains correctly.
        return "\n".join(parts)

    def _topo(self, tasks: list[Task]) -> list[Task]:
        seen: dict[str, Task] = {}
        order: list[Task] = []

        def visit(t: Task, stack: tuple[str, ...]) -> None:
            if t.name in stack:
                raise ValueError(f"cycle at {t.name}")
            if t.name in seen:
                return
            for r in t.required_tasks:
                visit(r, stack + (t.name,))
            seen[t.name] = t
            order.append(t)

        for t in tasks:
            visit(t, ())
        return order

    def run_pipeline(self, tasks: list[Task]) -> list[tuple[str, str]]:
        statuses: list[tuple[str, str]] = []
        upstream_ran: set[str] = set()
        for task in self._topo(tasks):
            sig = self.input_signal(task)
            dep_ran = any(r.name in upstream_ran for r in task.required_tasks)
            if not dep_ran and self.signals.read(task.name) == sig:
                statuses.append((task.name, "skipped"))
                continue
            task.run()
            # Signal content = input fingerprint *after* the run (inputs
            # may be produced by upstream in the same pipeline pass).
            self.signals.write(task.name, self.input_signal(task))
            upstream_ran.add(task.name)
            statuses.append((task.name, "ran"))
        return statuses

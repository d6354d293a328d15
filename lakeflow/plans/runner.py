"""Topological pipeline runner (SURVEY.md §2.11).

The reference orchestrates its batch ELT as an Airflow DAG of spark-submit
tasks with a diamond dependency (/root/reference/src/dags/batch_elt_company.py:69-71)
— five separate Spark applications. Here the DAG is a plain function-
composition graph executed inside ONE session: no per-task JVM spin-up, and
Catalyst can see across stage boundaries when tasks pass DataFrames.

Tasks declare dependencies by name; the runner resolves a deterministic
topological order (Kahn, name-sorted ties) and threads each task's return
value to its dependents.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field
from typing import Any


@dataclass
class Task:
    name: str
    fn: Callable[..., Any]
    deps: Sequence[str] = field(default_factory=tuple)
    retries: int = 0  # extra attempts after the first failure


class TaskFailureError(RuntimeError):
    """A task exhausted its attempts; carries the task name and count."""

    def __init__(self, name: str, attempts: int, cause: Exception) -> None:
        super().__init__(
            f"task {name!r} failed after {attempts} attempt(s): {cause!r}"
        )
        self.task = name
        self.attempts = attempts
        self.cause = cause


class Pipeline:
    """A named DAG of tasks; ``run`` executes in dependency order."""

    def __init__(self, name: str = "pipeline"):
        self.name = name
        self._tasks: dict[str, Task] = {}

    def task(
        self, name: str, deps: Sequence[str] = (), retries: int = 0
    ) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
        def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
            self.add(Task(name, fn, deps, retries))
            return fn

        return deco

    def add(self, task: Task) -> None:
        if task.name in self._tasks:
            raise ValueError(f"duplicate task {task.name!r}")
        self._tasks[task.name] = task

    def topo_order(self) -> list[str]:
        pending = {t.name: set(t.deps) for t in self._tasks.values()}
        for name, deps in pending.items():
            missing = deps - self._tasks.keys()
            if missing:
                raise ValueError(f"task {name!r} depends on unknown {sorted(missing)}")
        order: list[str] = []
        while pending:
            ready = sorted(n for n, deps in pending.items() if not deps)
            if not ready:
                raise ValueError(f"cycle among {sorted(pending)}")
            for n in ready:
                order.append(n)
                del pending[n]
            for deps in pending.values():
                deps.difference_update(ready)
        return order

    def run(
        self,
        context: Mapping[str, Any] | None = None,
        on_error: str = "raise",
        resume_from: Mapping[str, Mapping[str, Any]] | None = None,
    ) -> dict[str, Any]:
        """Execute all tasks; each fn receives (results_so_far, **context).

        Airflow-parity execution semantics (the reference DAG's
        ``retries=`` and upstream_failed propagation,
        /root/reference/src/dags/batch_elt_company.py): a task declaring
        ``retries=N`` re-runs up to N extra times on exception; with
        ``on_error="skip_downstream"`` an exhausted task marks itself
        ``failed`` and every transitive dependent ``upstream_failed``
        while independent branches keep running (default ``"raise"``
        surfaces :class:`TaskFailureError` immediately). ``self.report``
        records ``{name: {"status", "attempts"}}`` for the run.

        ``resume_from`` is a previous run's ``report``: tasks it marks
        ``success`` are skipped (status ``skipped_done``, no re-execution)
        and everything else re-runs — Airflow's clear-failed-and-rerun.
        A skipped task contributes NO entry to ``results``, so a resumable
        pipeline must pass state through storage (tables/files), not
        return values — exactly the contract Airflow tasks live under;
        tasks that thread DataFrames are fine as long as their consumers
        rerun with them (a consumer of a skipped task re-reads the table).
        """
        if on_error not in ("raise", "skip_downstream"):
            raise ValueError(
                f"on_error must be raise|skip_downstream, got {on_error!r}"
            )
        done_before = {
            n
            for n, r in (resume_from or {}).items()
            if r.get("status") == "success"
        }
        ctx = dict(context or {})
        results: dict[str, Any] = {}
        self.report: dict[str, dict[str, Any]] = {}
        dead: set[str] = set()
        for name in self.topo_order():
            task = self._tasks[name]
            if any(d in dead for d in task.deps):
                self.report[name] = {"status": "upstream_failed", "attempts": 0}
                dead.add(name)
                continue
            if name in done_before:
                self.report[name] = {"status": "skipped_done", "attempts": 0}
                continue
            attempts = 0
            while True:
                attempts += 1
                try:
                    results[name] = task.fn(results, **ctx)
                    self.report[name] = {
                        "status": "success",
                        "attempts": attempts,
                    }
                    break
                except Exception as exc:
                    if attempts <= task.retries:
                        continue
                    self.report[name] = {
                        "status": "failed",
                        "attempts": attempts,
                    }
                    if on_error == "raise":
                        raise TaskFailureError(name, attempts, exc) from exc
                    dead.add(name)
                    break
        return results

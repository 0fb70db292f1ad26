"""DAG runner: topological execution with retry + per-task wall-time report.

Replaces luigi.build (reference README.md:287-288). Observability: every run
produces a per-task timing table (aux subsystem called out in SURVEY.md §5 as
missing from the reference — added here as a first-class feature).
"""

from __future__ import annotations

import time

from .log import configure_logger
from .task import BaseTask, RetryableTaskError

logger = configure_logger(__name__)


class TaskFailure(Exception):
    pass


def _collect(task: BaseTask, order: list, seen: set):
    key = task.get_task_family()
    if key in seen:
        return
    seen.add(key)
    req = task.requires()
    deps = list(req.values()) if isinstance(req, dict) else (
        list(req) if isinstance(req, (list, tuple)) else [req])
    for dep in deps:
        if dep is not None:
            _collect(dep, order, seen)
    order.append(task)


def _destroy_output(task):
    """A failed run() must not leave a partially-written fileset behind —
    completeness is fileset-existence, so partial outputs would corrupt
    resume semantics."""
    try:
        out = task.output()
        fs_id = getattr(out, "fileset_id", None)
        if fs_id is not None and task.ctx is not None:
            task.ctx.scan.delete_fileset(fs_id)
    except Exception:
        pass


class DBRunner:
    """Batch runner: execute a task list over one or every scan of a DB
    (role of romitask.runner.DBRunner, reference tests/unit/test_runner.py:3-16;
    this is also what FSDBWatcher drives on newly appearing scans).

    ``tasks`` is a list of task names/classes run in order per scan;
    ``config`` is the TOML-style {TaskName: {param: value}} dict shared
    by every scan's RunContext.
    """

    def __init__(self, db, tasks, config=None):
        self.db = db
        self.tasks = list(tasks)
        self.config = config or {}

    def run_scan(self, scan_id: str) -> dict:
        """Run the task list on one scan; returns {task: report} merged."""
        from .config import RunContext

        ctx = RunContext(self.db, scan_id, self.config)
        report: dict = {}
        for t in self.tasks:
            report.update(run_task(ctx, t, report=False))
        return report

    def run(self) -> dict:
        """Run the task list on every scan in the DB: {scan_id: report}."""
        reports = {}
        for scan_id in sorted(self.db.list_scans()):
            logger.info(f"DBRunner: scan {scan_id}")
            reports[scan_id] = self.run_scan(scan_id)
        return reports


def run_task(ctx, task_name_or_cls, report=True) -> dict:
    """Resolve and run the dependency closure of a task bottom-up.

    Returns a report dict: {task_name: {"status", "seconds", "fileset"}}.
    """
    root = ctx.get_task(task_name_or_cls)
    order: list[BaseTask] = []
    _collect(root, order, set())

    results = {}
    try:
        _run_order(order, results)
    except BaseException:
        # the pipeline failed mid-way: still land any async artifact
        # writes of the tasks that DID succeed (best effort — the
        # original error stays the one raised)
        try:
            _flush_artifacts(results)
        except Exception:
            pass
        raise
    # async artifact writes ride under downstream task compute; whatever
    # is still in flight must land before this invocation returns
    _flush_artifacts(results)

    if report:
        width = max((len(k) for k in results), default=10)
        logger.info("--- task timing report ---")
        for k, v in results.items():
            logger.info(f"{k:<{width}}  {v['status']:<8} {v['seconds']:>8.2f}s")
    # observability: persist the last run report on the scan
    try:
        import datetime
        ctx.scan.set_metadata("last_run_report", {
            "timestamp": datetime.datetime.now().isoformat(timespec="seconds"),
            "tasks": results,
        })
    except Exception:
        pass
    return results


def _flush_artifacts(results) -> None:
    from ..fsdb import handoff
    if handoff.pending_count() == 0:
        return
    t0 = time.monotonic()
    handoff.flush()
    results["ArtifactFlush"] = {
        "status": "done", "seconds": round(time.monotonic() - t0, 3),
        "fileset": None,
    }
    logger.info(f"ArtifactFlush: {results['ArtifactFlush']['seconds']:.2f}s")


def _run_order(order, results) -> None:
    for task in order:
        name = task.get_task_family()
        if task.complete():
            logger.info(f"{name}: already complete, skipping")
            results[name] = {
                "status": "skipped", "seconds": 0.0,
                "fileset": getattr(task.output(), "fileset_id", None),
            }
            continue
        # a stale (crashed-run) partial output would shadow this run's
        # writes — clear it before starting
        out = task.output()
        if getattr(out, "fileset_id", None) is not None and out.exists():
            logger.warning(f"{name}: clearing unfinalized partial output "
                           f"{out.fileset_id}")
            _destroy_output(task)
        t0 = time.monotonic()
        attempts = 1 + getattr(task, "retry_count", 0)
        last_err = None
        status = "failed"
        n_tried = 0
        for attempt in range(attempts):
            n_tried = attempt + 1
            try:
                if attempt:
                    logger.warning(f"{name}: retry {attempt}/{attempts - 1}")
                task.run()
                if hasattr(task, "finalize"):
                    task.finalize()
                status = "done"
                last_err = None
                break
            except RetryableTaskError as e:
                last_err = e
                _destroy_output(task)
                continue
            except Exception as e:
                last_err = e
                _destroy_output(task)
                break
        dt = time.monotonic() - t0
        out = task.output()
        results[name] = {
            "status": status,
            "seconds": round(dt, 3),
            "fileset": getattr(out, "fileset_id", None),
        }
        if last_err is not None:
            raise TaskFailure(
                f"Task {name} failed after {n_tried} attempt(s)") from last_err
        if status != "done":
            raise TaskFailure(f"Task {name} failed")
        logger.info(f"{name}: done in {dt:.2f}s")

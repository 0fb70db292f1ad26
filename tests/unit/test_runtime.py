"""Task runtime tests: DAG execution, fileset targets, param hashing,
config binding — the romitask-semantics harness (reference
tests/unit/test_task.py)."""

import pytest

from plant3dvision_tpu.runtime import (
    Clean,
    FileByFileTask,
    FilesetTarget,
    ImagesFilesetExists,
    Parameter,
    RomiTask,
    RunContext,
    run_task,
)
from plant3dvision_tpu.runtime.runner import TaskFailure
from plant3dvision_tpu.runtime.task import RetryableTaskError


class TouchFileTask(RomiTask):
    """Writes a single file into its output fileset."""
    upstream_task = Parameter(default="ImagesFilesetExists")

    def requires(self):
        return []

    def run(self):
        f = self.output_file("hello")
        f.write_raw(b"hello", "txt")


class IdentityTask(FileByFileTask):
    upstream_task = Parameter(default="TouchFileTask")

    def f(self, fin, outfs):
        fout = outfs.get_file(fin.id, create=True)
        fout.write_raw(fin.read_raw(), "txt")
        return fout


class FlakyTask(RomiTask):
    retry_count = 3
    attempts = 0

    def requires(self):
        return []

    def run(self):
        FlakyTask.attempts += 1
        if FlakyTask.attempts < 3:
            raise RetryableTaskError("try again")
        self.output_file("done").write_raw(b"ok", "txt")


class AlwaysFails(RomiTask):
    def requires(self):
        return []

    def run(self):
        raise RuntimeError("boom")


@pytest.fixture()
def ctx(temp_db):
    scan = temp_db.create_scan("testscan")
    images = scan.create_fileset("images")
    f = images.create_file("00000_rgb")
    f.write_raw(b"fake-image", "jpg")
    f.set_metadata("channel", "rgb")
    return RunContext(temp_db, "testscan", config={})


def test_fileset_target_exists(ctx):
    assert FilesetTarget(ctx.scan, "images").exists()
    assert not FilesetTarget(ctx.scan, "nope").exists()
    # empty fileset is not complete
    ctx.scan.create_fileset("empty")
    assert not FilesetTarget(ctx.scan, "empty").exists()


def test_marker_task(ctx):
    t = ctx.get_task(ImagesFilesetExists)
    assert t.complete()


def test_touch_task_creates_hashed_fileset(ctx):
    report = run_task(ctx, TouchFileTask, report=False)
    assert report["TouchFileTask"]["status"] == "done"
    fs_id = report["TouchFileTask"]["fileset"]
    assert fs_id.startswith("TouchFileTask_")
    fs = ctx.scan.get_fileset(fs_id)
    assert fs.get_file("hello").read_raw() == b"hello"
    # deterministic id
    t = ctx.get_task(TouchFileTask)
    assert t.task_id() == fs_id
    # second run: skipped
    report2 = run_task(ctx, TouchFileTask, report=False)
    assert report2["TouchFileTask"]["status"] == "skipped"
    # task_params recorded on the output fileset
    assert "upstream_task" in fs.get_metadata("task_params")


def test_crashed_partial_output_is_recomputed(ctx):
    """A fileset left by a killed run (files present, no 'task_params'
    finalize marker) must NOT count as complete; the runner clears it
    and reruns the task."""
    t = ctx.get_task(TouchFileTask)
    fs = ctx.scan.create_fileset(t.task_id())
    fs.get_file("hello", create=True).write_raw(b"PARTIAL", "txt")
    assert not t.complete()
    report = run_task(ctx, TouchFileTask, report=False)
    assert report["TouchFileTask"]["status"] == "done"
    fs = ctx.scan.get_fileset(t.task_id())
    assert fs.get_file("hello").read_raw() == b"hello"
    assert t.complete()


def test_param_hash_changes_with_config(temp_db):
    scan = temp_db.create_scan("s2")
    scan.create_fileset("images")
    ctx1 = RunContext(temp_db, "s2", config={})
    ctx2 = RunContext(temp_db, "s2", config={"TouchFileTask": {"upstream_task": "DummyTask"}})
    id1 = ctx1.get_task(TouchFileTask).task_id()
    id2 = ctx2.get_task(TouchFileTask).task_id()
    assert id1 != id2


def test_file_by_file_task_copies_metadata(ctx):
    run_task(ctx, IdentityTask, report=False)
    t = ctx.get_task(IdentityTask)
    fs = ctx.scan.get_fileset(t.task_id())
    files = fs.get_files()
    assert len(files) == 1
    assert files[0].read_raw() == b"hello"


def test_retry(ctx):
    FlakyTask.attempts = 0
    report = run_task(ctx, FlakyTask, report=False)
    assert report["FlakyTask"]["status"] == "done"
    assert FlakyTask.attempts == 3


def test_failure_propagates(ctx):
    with pytest.raises(TaskFailure):
        run_task(ctx, AlwaysFails, report=False)


def test_clean(ctx):
    run_task(ctx, TouchFileTask, report=False)
    assert any(f.startswith("TouchFileTask") for f in ctx.scan.list_filesets())
    clean = Clean(ctx=ctx, no_confirm=True)
    clean.run()
    assert ctx.scan.list_filesets() == ["images"]


def test_config_json_string_decoding(temp_db):
    temp_db.create_scan("s3").create_fileset("images")
    ctx = RunContext(temp_db, "s3",
                     config={"IdentityTask": {"query": '{"channel": "rgb"}'}})
    t = ctx.get_task(IdentityTask)
    assert t.query == {"channel": "rgb"}


def test_cli_parse_dataset(temp_db):
    from plant3dvision_tpu.runtime.cli import parse_dataset
    temp_db.create_scan("myscan")
    db_path, scan_id = parse_dataset(str(temp_db.path() / "myscan"))
    assert scan_id == "myscan"
    assert db_path == temp_db.path()


def test_watcher(temp_db):
    import time
    from plant3dvision_tpu.runtime.watch import FSDBWatcher
    seen = []
    w = FSDBWatcher(temp_db, seen.append, poll_interval=0.05)
    w.start()
    temp_db.create_scan("newscan")
    deadline = time.time() + 3
    while not seen and time.time() < deadline:
        time.sleep(0.05)
    w.stop()
    assert seen == ["newscan"]


def test_db_runner_over_scans(temp_db):
    """DBRunner runs a task list over one scan / every scan in the DB
    (reference tests/unit/test_runner.py:7-16, romitask.runner.DBRunner)."""
    from plant3dvision_tpu.runtime.runner import DBRunner

    for sid in ("scan_a", "scan_b"):
        scan = temp_db.create_scan(sid)
        images = scan.create_fileset("images")
        f = images.create_file("00000_rgb")
        f.write_raw(b"fake-image", "jpg")

    runner = DBRunner(temp_db, ["TouchFileTask"], {})
    rep = runner.run_scan("scan_a")
    assert rep["TouchFileTask"]["status"] == "done"

    reports = runner.run()
    assert set(reports) == {"scan_a", "scan_b"}
    # scan_a already ran: fileset-existence completeness skips it
    assert reports["scan_a"]["TouchFileTask"]["status"] == "skipped"
    assert reports["scan_b"]["TouchFileTask"]["status"] == "done"

    # an empty task list is valid (reference test_runner.py runs DBRunner
    # with tasks=[])
    assert DBRunner(temp_db, [], {}).run() == {"scan_a": {}, "scan_b": {}}


_SLEEP_TIMES = {}


class _TimedTask(RomiTask):
    """Sleeps, records its (start, end) interval, writes one output file."""
    dur = 0.3

    def requires(self):
        return []

    def run(self):
        import time as _time
        t0 = _time.monotonic()
        _time.sleep(self.dur)
        self.output_file("out").write_raw(b"ok", "txt")
        _SLEEP_TIMES[self.get_task_family()] = (t0, _time.monotonic())


class SleepBase(_TimedTask):
    pass


class SleepA(_TimedTask):
    def requires(self):
        return [self.ctx.get_task(SleepBase)]


class SleepB(_TimedTask):
    def requires(self):
        return [self.ctx.get_task(SleepBase)]


class SleepRoot(_TimedTask):
    def requires(self):
        return [self.ctx.get_task(SleepA), self.ctx.get_task(SleepB)]


def test_parallel_workers_diamond(ctx):
    """run_task(workers=2) on a diamond DAG (Base -> {A, B} -> Root):
    dependency order holds, the independent branches overlap (role of
    luigi --workers, reference README.md:287-288)."""
    _SLEEP_TIMES.clear()
    report = run_task(ctx, SleepRoot, report=False, workers=2)
    assert all(report[n]["status"] == "done"
               for n in ("SleepBase", "SleepA", "SleepB", "SleepRoot"))
    base, a, b, root = (_SLEEP_TIMES[n] for n in
                        ("SleepBase", "SleepA", "SleepB", "SleepRoot"))
    # dependency order respected
    assert base[1] <= a[0] and base[1] <= b[0]
    assert max(a[1], b[1]) <= root[0]
    # the two branches actually ran concurrently
    assert a[0] < b[1] and b[0] < a[1], (_SLEEP_TIMES,)


class FailsFast(RomiTask):
    def requires(self):
        return []

    def run(self):
        raise RuntimeError("boom")


class NeverRuns(RomiTask):
    def requires(self):
        return [self.ctx.get_task(FailsFast)]

    def run(self):  # pragma: no cover - must not execute
        raise AssertionError("dependent of a failed task must not run")


def test_parallel_failure_stops_dependents(ctx):
    with pytest.raises(TaskFailure):
        run_task(ctx, NeverRuns, report=False, workers=2)


def test_parallel_workers_random_dag(ctx):
    """Stress the ready-set scheduler: a randomized 18-node layered DAG
    executed with 4 workers must respect every dependency edge."""
    import random

    rng = random.Random(7)
    layers = [3, 5, 5, 4, 1]
    classes, prev_layer = [], []
    for li, width in enumerate(layers):
        layer = []
        for ni in range(width):
            deps = (tuple(rng.sample(prev_layer, rng.randint(1, len(prev_layer))))
                    if prev_layer else ())

            def _requires(self, _deps=deps):
                return [self.ctx.get_task(d) for d in _deps]

            cls = type(f"RandDag_L{li}N{ni}", (_TimedTask,),
                       {"dur": 0.01, "requires": _requires})
            layer.append(cls)
            classes.append((cls, deps))
        prev_layer = layer

    _SLEEP_TIMES.clear()
    report = run_task(ctx, classes[-1][0], report=False, workers=4)
    assert all(v["status"] == "done" for v in report.values())
    assert len(_SLEEP_TIMES) >= layers[-1]  # root + its closure executed
    for cls, deps in classes:
        if cls.__name__ not in _SLEEP_TIMES:
            continue  # not in the root's dependency closure
        t0 = _SLEEP_TIMES[cls.__name__][0]
        for d in deps:
            assert _SLEEP_TIMES[d.__name__][1] <= t0, \
                f"{d.__name__} must finish before {cls.__name__} starts"


def test_db_runner_parallel_scans(temp_db):
    """DBRunner(workers=2) processes independent scans concurrently."""
    from plant3dvision_tpu.runtime.runner import DBRunner

    for sid in ("pscan_a", "pscan_b", "pscan_c"):
        scan = temp_db.create_scan(sid)
        images = scan.create_fileset("images")
        images.create_file("00000_rgb").write_raw(b"fake-image", "jpg")

    reports = DBRunner(temp_db, ["TouchFileTask"], {}, workers=2).run()
    assert set(reports) == {"pscan_a", "pscan_b", "pscan_c"}
    assert all(r["TouchFileTask"]["status"] == "done"
               for r in reports.values())


def test_dump_toml_roundtrip():
    from plant3dvision_tpu.runtime.config import dump_toml
    import tomllib

    cfg = {"Voxels": {"voxel_size": 0.5, "labels": ["a", "b"], "log": True,
                      "bounding_box": {"x": [300, 450], "y": [-175, 100]}},
           "Masks": {"type": "linear", "parameters": "[0, 1, 0]",
                     "threshold": 0.15, "skipped": None}}
    back = tomllib.loads(dump_toml(cfg))
    cfg["Masks"].pop("skipped")              # TOML has no null
    assert back == cfg


def test_cli_backs_up_pipeline_toml(temp_db, tmp_path):
    """romi_run_task writes the effective config to <scan>/pipeline.toml
    (the reference romitask CLI behavior check_colmap_cfg depends on,
    reference tasks/colmap.py:402)."""
    import tomllib
    from plant3dvision_tpu.runtime import cli

    scan = temp_db.create_scan("cli_backup")
    images = scan.create_fileset("images")
    images.create_file("00000_rgb").write_raw(b"x", "jpg")
    cfg = tmp_path / "c.toml"
    cfg.write_text("[TouchFileTask]\nupstream_task = \"ImagesFilesetExists\"\n")
    rc = cli.main(["TouchFileTask", str(temp_db.path() / "cli_backup"),
                   "--config", str(cfg),
                   "--param", "TouchFileTask.scan_id=cli_backup"])
    assert rc == 0
    backup = scan.path() / "pipeline.toml"
    assert backup.exists()
    saved = tomllib.loads(backup.read_text())
    assert saved["TouchFileTask"]["upstream_task"] == "ImagesFilesetExists"
    assert saved["TouchFileTask"]["scan_id"] == "cli_backup"


def test_profiler_hook(ctx, tmp_path, monkeypatch):
    """P3D_PROFILE=<dir> wraps each task run in jax.profiler.trace —
    one TensorBoard-loadable trace directory per task (SURVEY §5
    tracing hook)."""
    monkeypatch.setenv("P3D_PROFILE", str(tmp_path / "prof"))
    report = run_task(ctx, TouchFileTask, report=False)
    assert report["TouchFileTask"]["status"] == "done"
    trace_dir = tmp_path / "prof" / "TouchFileTask"
    assert trace_dir.is_dir()
    # the profiler writes <host>.xplane.pb under plugins/profile/<ts>/
    assert list(trace_dir.rglob("*.xplane.pb"))


def test_profiler_hook_concurrent_skips(ctx, tmp_path, monkeypatch):
    """jax.profiler allows one trace per process: when another task's
    trace is active (workers>1), the hook must SKIP tracing, not raise
    and falsely fail the task."""
    from plant3dvision_tpu.runtime import runner as runner_mod

    monkeypatch.setenv("P3D_PROFILE", str(tmp_path / "prof"))
    assert runner_mod._profile_lock.acquire(blocking=False)
    try:
        report = run_task(ctx, TouchFileTask, report=False)
        assert report["TouchFileTask"]["status"] == "done"
        # no trace was written for the skipped task
        assert not list((tmp_path / "prof").rglob("*.xplane.pb"))
    finally:
        runner_mod._profile_lock.release()


def test_paused_gc_refcounted():
    """Overlapping paused_gc contexts (run_task workers>1): the
    collector stays disabled until the LAST context exits — a
    saved-bool restore would re-enable it under the still-running
    task (the measured 2-3x codec stall, CLAUDE.md)."""
    import gc

    from plant3dvision_tpu.runtime.task import paused_gc

    assert gc.isenabled()
    a, b = paused_gc(), paused_gc()
    a.__enter__()
    b.__enter__()
    assert not gc.isenabled()
    a.__exit__(None, None, None)
    assert not gc.isenabled(), "first exit must not re-enable gc"
    b.__exit__(None, None, None)
    assert gc.isenabled()


class _Chaos:
    """Module-level fault-injection switch for the chaos test below."""
    rate = 0.0
    rng = None


def _chaos_digest(parts):
    import hashlib
    h = hashlib.sha256()
    for p in parts:
        h.update(p)
    return h.hexdigest().encode()


def _make_chaos_dag(seed=11, layers=(2, 4, 3, 1)):
    """Layered DAG of content-producing tasks: each node writes a digest
    of its own name + every dependency's output bytes, so the final
    outputs are a checksum of the whole execution — any missed/stale/
    partial upstream output changes the bytes downstream."""
    import random

    rng = random.Random(seed)
    classes, prev = [], []
    for li, width in enumerate(layers):
        layer = []
        last = li == len(layers) - 1
        for ni in range(width):
            if not prev:
                deps = ()
            elif last:
                deps = tuple(prev)      # root pulls its whole layer
            else:
                deps = tuple(rng.sample(
                    prev, rng.randint(max(1, len(prev) // 2), len(prev))))

            def _requires(self, _deps=deps):
                return [self.ctx.get_task(d) for d in _deps]

            def _run(self, _deps=deps):
                ins = []
                for d in _deps:
                    fs = self.ctx.scan.get_fileset(
                        self.ctx.get_task(d).task_id())
                    ins.extend(f.read_raw() for f in
                               sorted(fs.get_files(), key=lambda f: f.id))
                out = self.output_file("out")
                if _Chaos.rng is not None and \
                        _Chaos.rng.random() < _Chaos.rate:
                    # simulated crash mid-write: partial bytes land, the
                    # finalize marker never does
                    out.write_raw(b"GARBAGE-PARTIAL", "txt")
                    raise RuntimeError("chaos: injected crash")
                out.write_raw(
                    _chaos_digest([type(self).__name__.encode()] + ins),
                    "txt")

            cls = type(f"ChaosDag_L{li}N{ni}", (RomiTask,),
                       {"requires": _requires, "run": _run})
            layer.append(cls)
            classes.append(cls)
        prev = layer
    return classes


def test_chaos_crash_resume_converges_to_clean_result(temp_db):
    """Fault injection (SURVEY §5: the reference has none): tasks crash
    mid-write at random across repeated resume attempts; re-running
    until success must converge to outputs BYTE-IDENTICAL to a
    never-failing run — partial filesets are never trusted, completed
    ones are never recomputed into something else."""
    import random

    classes = _make_chaos_dag()
    root = classes[-1]

    for sid in ("chaos", "clean"):
        scan = temp_db.create_scan(sid)
        scan.create_fileset("images").create_file(
            "00000_rgb").write_raw(b"img", "jpg")

    # clean reference run
    _Chaos.rng = None
    clean_ctx = RunContext(temp_db, "clean", config={})
    assert run_task(clean_ctx, root, report=False,
                    workers=3)[root.__name__]["status"] == "done"

    # chaotic run: resume until the DAG completes
    chaos_ctx = RunContext(temp_db, "chaos", config={})
    _Chaos.rng = random.Random(5)
    _Chaos.rate = 0.55
    attempts = 0
    while True:
        attempts += 1
        if attempts > 30:           # safety valve: finish deterministically
            _Chaos.rng = None
        try:
            report = run_task(chaos_ctx, root, report=False, workers=3)
            break
        except TaskFailure:
            continue
        finally:
            assert attempts < 60
    _Chaos.rng = None
    assert report[root.__name__]["status"] in ("done", "skipped")
    assert attempts > 1, "chaos never fired — raise the rate"

    # byte-identical convergence, task by task
    for cls in classes:
        tid = chaos_ctx.get_task(cls).task_id()
        assert tid == clean_ctx.get_task(cls).task_id()
        fs_chaos = chaos_ctx.scan.get_fileset(tid)
        fs_clean = clean_ctx.scan.get_fileset(tid)
        if fs_clean is None:
            continue  # outside the root's dependency closure
        got = {f.id: f.read_raw() for f in fs_chaos.get_files()}
        want = {f.id: f.read_raw() for f in fs_clean.get_files()}
        assert got == want, f"{cls.__name__} diverged after chaos resume"

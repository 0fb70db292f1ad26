"""Device-resident handoff + async artifact writes (fsdb/handoff.py).

The subsystem that lets a producer task hand its device volumes straight
to the in-process consumer while the NPZ artifact deflates on a writer
thread — no reference counterpart (the reference round-trips every task
boundary through disk)."""

import numpy as np
import pytest

from plant3dvision_tpu.fsdb import handoff, io


@pytest.fixture(autouse=True)
def _clean_handoff():
    handoff.reset()
    yield
    handoff.reset()


def _file(db, scan_id="s", fs_id="Voxels_abc", file_id="Voxels"):
    scan = db.get_scan(scan_id) or db.create_scan(scan_id)
    fs = scan.get_fileset(fs_id, create=True)
    return fs.get_file(file_id, create=True)


def test_async_write_lands_on_read(temp_db):
    f = _file(temp_db)
    data = {"leaf": np.arange(24, dtype=np.float32).reshape(2, 3, 4),
            "stem": np.ones((2, 3, 4), np.float32)}
    io.write_npz_async(f, lambda: data)
    assert handoff.pending_count() == 1
    # File.path() waits for the pending write — readers never observe a
    # missing artifact
    back = io.read_npz(f)
    assert handoff.pending_count() == 0
    assert set(back) == {"leaf", "stem"}
    np.testing.assert_array_equal(back["leaf"], data["leaf"])
    # manifest sees the file after the flush
    fs = temp_db.get_scan("s").get_fileset("Voxels_abc")
    assert f.filename == "Voxels.npz"
    assert fs.get_file("Voxels").read_raw()[:2] == b"PK"  # zip magic


def test_flush_writes_everything(temp_db):
    f1 = _file(temp_db, fs_id="A", file_id="a")
    f2 = _file(temp_db, fs_id="B", file_id="b")
    io.write_npz_async(f1, lambda: {"x": np.zeros(3)})
    io.write_npz_async(f2, lambda: {"y": np.ones(3)})
    assert handoff.flush() == 2
    assert handoff.pending_count() == 0
    assert f1.path().exists() and f2.path().exists()


def test_fileset_delete_cancels_pending(temp_db):
    f = _file(temp_db, fs_id="Doomed")
    io.write_npz_async(f, lambda: {"x": np.zeros(3)})
    scan = temp_db.get_scan("s")
    scan.delete_fileset("Doomed")
    # flush must not resurrect the file into the deleted fileset
    assert handoff.flush() == 0
    assert not (scan.path() / "Doomed").exists()


def test_cache_roundtrip_and_invalidation(temp_db):
    f = _file(temp_db)
    payload = {"leaf": np.full((4, 4, 4), 7.0, np.float32)}
    handoff.cache_put(f, payload)
    got = handoff.cache_get(f)
    assert got is payload
    temp_db.get_scan("s").delete_fileset("Voxels_abc")
    assert handoff.cache_get(f) is None


def test_cache_lru_bound(temp_db):
    files = [_file(temp_db, fs_id=f"F{i}", file_id=f"f{i}") for i in range(6)]
    for i, f in enumerate(files):
        handoff.cache_put(f, {"i": np.array([i])})
    # oldest entries evicted (bound is 4)
    assert handoff.cache_get(files[0]) is None
    assert handoff.cache_get(files[-1]) is not None


def test_disabled_falls_back_to_sync(temp_db, monkeypatch):
    monkeypatch.setenv("P3D_HANDOFF", "off")
    f = _file(temp_db, fs_id="Sync")
    io.write_npz_async(f, lambda: {"x": np.arange(5)})
    assert handoff.pending_count() == 0       # wrote synchronously
    assert f.path().exists()
    handoff.cache_put(f, {"x": np.arange(5)})
    assert handoff.cache_get(f) is None       # cache inert


def test_producer_error_surfaces_at_flush(temp_db):
    f = _file(temp_db, fs_id="Err")

    def boom():
        raise ValueError("pull failed")

    io.write_npz_async(f, boom)
    with pytest.raises(ValueError, match="pull failed"):
        handoff.flush()
    assert handoff.pending_count() == 0


def test_pointcloud_cache_path_matches_disk_path(temp_db):
    """PointCloud consuming the producer's device cache yields the exact
    same point cloud as inflating + re-uploading the NPZ artifact."""
    import jax.numpy as jnp

    from plant3dvision_tpu.runtime import RunContext
    from plant3dvision_tpu.tasks.proc3d import PointCloud

    rng = np.random.default_rng(0)
    shape = (24, 24, 24)
    zz = np.linalg.norm(np.stack(np.meshgrid(
        *[np.arange(s) - s / 2 for s in shape], indexing="ij")), axis=0)
    vols = {
        "background": rng.random(shape).astype(np.float32) * 0.3,
        "stem": (zz < 6).astype(np.float32),
        "fruit": ((zz >= 6) & (zz < 9)).astype(np.float32),
    }

    temp_db.create_scan("s")
    cfg = {"PointCloud": {"upstream_task": "NamedFilesetExists",
                          "level_set_value": 0.2, "background_prior": 1.0,
                          "min_contrast": 1.0, "min_score": 0.01},
           "NamedFilesetExists": {"fileset_id": "vol"}}

    def _run(tag, with_cache):
        scan = temp_db.get_scan("s")
        fs = scan.get_fileset("vol", create=True)
        for f_id in list(fs.files):
            fs.delete_file(f_id)
        f = fs.get_file("vol", create=True)
        io.write_npz(f, vols)
        f.set_metadata({"origin": [0.0, 0.0, 0.0], "voxel_size": 1.0})
        if with_cache:
            handoff.cache_put(f, {k: jnp.asarray(v) for k, v in vols.items()})
        else:
            handoff.reset()
        ctx = RunContext(temp_db, "s", dict(cfg))
        task = ctx.get_task(PointCloud)
        task.run()
        out = task.output().get().get_files()[0]
        pcd = io.read_point_cloud(out)
        scan.delete_fileset(task.output().fileset_id)
        return pcd

    a = _run("disk", with_cache=False)
    b = _run("cache", with_cache=True)
    np.testing.assert_array_equal(np.asarray(a.points), np.asarray(b.points))


def test_runner_flushes_and_reports(temp_db):
    """A RomiTask using write_npz_async + cache_put: run_task lands the
    artifact before returning and reports the flush."""
    from plant3dvision_tpu.runtime import RomiTask, RunContext, run_task
    from plant3dvision_tpu.runtime.task import Parameter, TaskRegistry

    class AsyncProducer(RomiTask):
        upstream_task = Parameter(default="DatasetExists")

        def requires(self):
            return []

        def run(self):
            out = self.output_file()
            vol = {"leaf": np.random.rand(8, 8, 8).astype(np.float32)}
            handoff.cache_put(out, vol)
            io.write_npz_async(out, lambda: vol)
            out.set_metadata("voxel_size", 1.0)

    class CacheConsumer(RomiTask):
        upstream_task = Parameter(default="AsyncProducer")

        def run(self):
            ifile = self.input_file()
            cached = handoff.cache_get(ifile)
            assert cached is not None, "consumer should hit the device cache"
            out = self.output_file()
            io.write_json(out, {"sum": float(cached["leaf"].sum())})

    temp_db.create_scan("s")
    ctx = RunContext(temp_db, "s", {})
    TaskRegistry.register(AsyncProducer)
    TaskRegistry.register(CacheConsumer)
    report = run_task(ctx, CacheConsumer, report=False)
    assert report["AsyncProducer"]["status"] == "done"
    assert report["CacheConsumer"]["status"] == "done"
    assert "ArtifactFlush" in report
    # artifact really on disk and consistent with the cache
    fs_id = report["AsyncProducer"]["fileset"]
    f = temp_db.get_scan("s").get_fileset(fs_id).get_file("AsyncProducer")
    back = io.read_npz(f)
    out_fs = temp_db.get_scan("s").get_fileset(report["CacheConsumer"]["fileset"])
    result = io.read_json(out_fs.get_file("CacheConsumer"))
    assert abs(result["sum"] - float(back["leaf"].sum())) < 1e-3

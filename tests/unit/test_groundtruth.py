"""Ground-truth builders (VoxelsGroundTruth / ClusteredMeshGroundTruth)
and their primitives, validated on the reference's shipped virtual-plant
OBJ when present (reference tasks/evaluation.py:71-130, :198-253)."""

import numpy as np
import pytest

from plant3dvision_tpu import proc3d
from plant3dvision_tpu.fsdb import io
from plant3dvision_tpu import fixtures


def _write_two_material_obj(path):
    # two unit-ish triangles, one per material
    path.write_text("\n".join([
        "v 0 0 0", "v 1 0 0", "v 0 1 0",      # tri A
        "v 0 0 2", "v 1 0 2", "v 0 1 2",      # tri B
        "usemtl stem",
        "f 1 2 3",
        "usemtl leaf",
        "f 4 5 6",
    ]) + "\n")


def test_read_obj_materials(tmp_path):
    p = tmp_path / "plant.obj"
    _write_two_material_obj(p)
    meshes = io.read_obj_materials(str(p))
    assert set(meshes) == {"stem", "leaf"}
    assert len(meshes["stem"].vertices) == 3      # unreferenced removed
    assert len(meshes["leaf"].triangles) == 1
    np.testing.assert_allclose(meshes["leaf"].vertices[:, 2], 2.0)


def test_voxelize_surface_marks_triangle_cells(tmp_path):
    p = tmp_path / "plant.obj"
    _write_two_material_obj(p)
    m = io.read_obj_materials(str(p))["stem"]
    vol = proc3d.voxelize_surface(m, 0.25, origin=np.zeros(3),
                                  shape=(6, 6, 2))
    # the triangle lies in z=0 plane: only z-layer 0 occupied, ~half the
    # 4x4 cell square (the triangle) marked
    assert vol[:, :, 1].sum() == 0
    assert 8 <= vol[:, :, 0].sum() <= 15
    assert vol[0, 0, 0] and vol[3, 0, 0] and vol[0, 3, 0]
    assert not vol[3, 3, 0]                       # outside hypotenuse


@pytest.mark.skipif(not fixtures.has_reference_testdata("virtual_plant"),
                    reason="reference testdata not available")
def test_ground_truth_tasks_on_reference_fixture(temp_db):
    from plant3dvision_tpu.runtime import RunContext, run_task

    fixtures.load_reference_scan(temp_db, "virtual_plant")
    scan = temp_db.get_scan("virtual_plant")
    cfg = {"VoxelsGroundTruth": {"voxel_size": 0.3},
           "ClusteredMeshGroundTruth": {}}
    ctx = RunContext(temp_db, "virtual_plant", cfg)

    report = run_task(ctx, "VoxelsGroundTruth", report=False)
    fs = scan.get_fileset(report["VoxelsGroundTruth"]["fileset"])
    vols = io.read_npz(fs.get_files()[0])
    # the reference OBJ has 4 organ materials + computed background
    assert set(vols) == {"fruit", "leaf", "pedicel", "stem", "background"}
    for k in ("fruit", "leaf", "pedicel", "stem"):
        assert vols[k].sum() > 0, k
    union = np.zeros_like(vols["stem"])
    for k in ("fruit", "leaf", "pedicel", "stem"):
        union = np.maximum(union, vols[k])
    np.testing.assert_allclose(vols["background"], 1 - union)
    # the stem is tall and thin: dominant extent along one axis
    idx = np.argwhere(vols["stem"] > 0)
    ext = idx.max(0) - idx.min(0)
    assert ext.max() > 3 * np.partition(ext, 1)[1]

    report = run_task(ctx, "ClusteredMeshGroundTruth", report=False)
    fs = scan.get_fileset(report["ClusteredMeshGroundTruth"]["fileset"])
    files = fs.get_files()
    labels = {f.get_metadata("label") for f in files}
    assert {"fruit", "leaf", "pedicel", "stem"} <= labels
    # organs split into connected components: many fruit pieces
    fruit_files = [f for f in files if f.get_metadata("label") == "fruit"]
    assert len(fruit_files) > 5
    mesh = io.read_triangle_mesh(fruit_files[0])
    assert len(mesh.vertices) > 0 and len(mesh.triangles) > 0

"""Storage layer tests: on-disk format compatibility + codecs round-trips."""

import json

import numpy as np
import pytest

from plant3dvision_tpu.fsdb import FSDB, DBError, io
from plant3dvision_tpu.fsdb.geometry import PointCloud, TriangleMesh


def test_marker_required(tmp_path):
    db = FSDB(tmp_path)
    with pytest.raises(DBError):
        db.connect()


def test_scan_fileset_file_lifecycle(temp_db):
    scan = temp_db.create_scan("plant1")
    fs = scan.create_fileset("images")
    f = fs.create_file("00000_rgb")
    f.write_raw(b"hello", "txt")
    f.set_metadata("channel", "rgb")
    f.set_metadata({"shot_id": "000000"})

    # manifest format matches the reference layout (files.json with
    # {"filesets": [{"id", "files": [{"id", "file"}]}]})
    manifest = json.loads((scan.path() / "files.json").read_text())
    assert manifest["filesets"][0]["id"] == "images"
    assert manifest["filesets"][0]["files"][0] == {"id": "00000_rgb", "file": "00000_rgb.txt"}

    # metadata sidecar location: <scan>/metadata/<fileset>/<file>.json
    sidecar = scan.path() / "metadata" / "images" / "00000_rgb.json"
    assert sidecar.exists()
    assert f.get_metadata("channel") == "rgb"
    assert f.get_metadata()["shot_id"] == "000000"

    # reload from disk
    db2 = FSDB(temp_db.path())
    db2.connect(unsafe=True)
    scan2 = db2.get_scan("plant1")
    assert scan2 is not None
    f2 = scan2.get_fileset("images").get_file("00000_rgb")
    assert f2.read_raw() == b"hello"


def test_query_filtering(temp_db):
    scan = temp_db.create_scan("s")
    fs = scan.create_fileset("masks")
    for i, ch in enumerate(["rgb", "rgb", "background"]):
        f = fs.create_file(f"f{i}")
        f.write_raw(b"x", "bin")
        f.set_metadata("channel", ch)
    assert len(fs.get_files({"channel": "rgb"})) == 2
    assert len(fs.get_files({"channel": "background"})) == 1
    assert len(fs.get_files()) == 3


def test_scan_metadata(temp_db):
    scan = temp_db.create_scan("s")
    scan.set_metadata("bounding_box", {"x": [0, 1], "y": [0, 1], "z": [0, 2]})
    assert scan.get_metadata("bounding_box")["z"] == [0, 2]


def test_npz_volume_roundtrip(temp_db):
    scan = temp_db.create_scan("s")
    fs = scan.create_fileset("out")
    vol = np.random.rand(5, 6, 7).astype(np.float32)
    f = fs.create_file("Voxels")
    io.write_volume(f, vol)
    assert f.filename == "Voxels.npz"
    np.testing.assert_array_equal(io.read_volume(f), vol)

    f2 = fs.create_file("multi")
    io.write_npz(f2, {"stem": vol, "leaf": vol * 2})
    back = io.read_npz(f2)
    assert set(back) == {"stem", "leaf"}
    np.testing.assert_array_equal(back["leaf"], vol * 2)


def test_image_roundtrip(temp_db):
    scan = temp_db.create_scan("s")
    fs = scan.create_fileset("images")
    img = (np.random.rand(32, 48, 3) * 255).astype(np.uint8)
    f = fs.create_file("img")
    io.write_image(f, img, "png")
    np.testing.assert_array_equal(io.read_image(f), img)


def test_ply_pointcloud_roundtrip(temp_db):
    scan = temp_db.create_scan("s")
    fs = scan.create_fileset("out")
    pts = np.random.rand(100, 3)
    normals = np.random.randn(100, 3)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    pcd = PointCloud(pts, normals)
    f = fs.create_file("PointCloud")
    io.write_point_cloud(f, pcd)
    back = io.read_point_cloud(f)
    np.testing.assert_allclose(back.points, pts, atol=1e-12)
    np.testing.assert_allclose(back.normals, normals, atol=1e-12)


def test_ply_mesh_roundtrip(temp_db):
    scan = temp_db.create_scan("s")
    fs = scan.create_fileset("out")
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
    tris = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    mesh = TriangleMesh(verts, tris)
    f = fs.create_file("TriangleMesh")
    io.write_triangle_mesh(f, mesh)
    back = io.read_triangle_mesh(f)
    np.testing.assert_allclose(back.vertices, verts)
    np.testing.assert_array_equal(back.triangles, tris)


def test_json_and_graph_roundtrip(temp_db):
    import networkx as nx
    scan = temp_db.create_scan("s")
    fs = scan.create_fileset("out")
    f = fs.create_file("AnglesAndInternodes")
    io.write_json(f, {"angles": [1.0, 2.0], "internodes": [3.0]})
    assert io.read_json(f)["angles"] == [1.0, 2.0]

    g = nx.Graph()
    g.add_edge(0, 1, weight=2.5)
    g.nodes[0]["position"] = [0, 0, 0]
    fg = fs.create_file("TreeGraph")
    io.write_graph(fg, g)
    g2 = io.read_graph(fg)
    assert g2[0][1]["weight"] == 2.5


def test_mesh_connected_components():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [5, 5, 5], [6, 5, 5], [5, 6, 5], [5, 5, 6]], dtype=float)
    tris = np.array([[0, 1, 2], [3, 4, 5], [3, 4, 6], [3, 5, 6]])
    mesh = TriangleMesh(verts, tris)
    big = mesh.largest_connected_component()
    assert len(big.triangles) == 3
    assert len(big.vertices) == 4


def test_obj_roundtrip(temp_db):
    from plant3dvision_tpu.fsdb.geometry import TriangleMesh
    scan = temp_db.create_scan("s_obj")
    fs = scan.create_fileset("out")
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
    tris = np.array([[0, 1, 2], [0, 1, 3]])
    f = fs.create_file("VirtualPlant")
    io.write_obj(f, TriangleMesh(verts, tris))
    assert f.filename == "VirtualPlant.obj"
    back = io.read_triangle_mesh(f)
    np.testing.assert_allclose(back.vertices, verts)
    np.testing.assert_array_equal(back.triangles, tris)


def test_ply_ascii_read(temp_db, tmp_path):
    """ASCII PLY payloads (other tools write them) parse identically."""
    from plant3dvision_tpu.fsdb import ply as plyio
    ascii_ply = """ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
0 1 0
3 0 1 2
"""
    p = tmp_path / "m.ply"
    p.write_text(ascii_ply)
    mesh = plyio.read_ply(p)
    np.testing.assert_allclose(mesh.vertices,
                               [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    np.testing.assert_array_equal(mesh.triangles, [[0, 1, 2]])


def test_deferred_store_batches_manifest_writes(temp_db):
    scan = temp_db.create_scan("s_defer")
    fs = scan.create_fileset("out")
    with scan.deferred_store():
        for i in range(5):
            fs.create_file(f"f{i}").write_raw(b"x", "bin")
        # manifest not yet updated inside the block
        manifest = json.loads((scan.path() / "files.json").read_text())
        names = {f["id"] for fsx in manifest["filesets"] for f in fsx["files"]}
        assert "f4" not in names
    manifest = json.loads((scan.path() / "files.json").read_text())
    names = {f["id"] for fsx in manifest["filesets"] for f in fsx["files"]}
    assert {"f0", "f1", "f2", "f3", "f4"} <= names

"""visu_plotly trace-data builders (plotly-free layer).

The ``*_data`` builders return plain dict trace specs that
plotly.graph_objects.Figure accepts verbatim — so the data layer is tested
here without plotly (absent in this environment); the figure wrappers are
exercised only when plotly is importable.
"""

import numpy as np
import pytest

from plant3dvision_tpu import visu_plotly as vp
from plant3dvision_tpu.fsdb.geometry import PointCloud, TriangleMesh
from plant3dvision_tpu.synth import SyntheticPlant
from plant3dvision_tpu.traits import compute_tree_graph

from .test_traits import exact_skeleton


def _has_plotly():
    try:
        import plotly  # noqa: F401
        return True
    except ImportError:
        return False


def test_pointcloud_data_subsample_and_colors():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3))
    cols = rng.random((500, 3))
    tr = vp.plotly_pointcloud_data(PointCloud(pts, colors=cols), n_pts=100,
                                   seed=0)
    assert tr["type"] == "scatter3d" and tr["mode"] == "markers"
    assert len(tr["x"]) == 100 == len(tr["marker"]["color"])
    assert tr["marker"]["color"][0].startswith("rgb(")
    # n_pts="all" keeps everything; default marker color without colors
    tr_all = vp.plotly_pointcloud_data(PointCloud(pts), n_pts="all")
    assert len(tr_all["x"]) == 500
    assert tr_all["marker"]["color"] == "green"


def test_mesh_data_indices():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    t = np.array([[0, 1, 2], [0, 1, 3]])
    tr = vp.plotly_mesh_data(TriangleMesh(v, t), mesh_kwargs={"opacity": 0.5})
    assert tr["type"] == "mesh3d"
    assert tr["i"] == [0, 0] and tr["j"] == [1, 1] and tr["k"] == [2, 3]
    assert tr["opacity"] == 0.5


def test_skeleton_data_one_trace_per_edge():
    skel = {"points": [[0, 0, 0], [0, 0, 1], [0, 1, 1]],
            "lines": [[0, 1], [1, 2]]}
    traces = vp.plotly_skeleton_data(skel)
    assert len(traces) == 2
    assert all(t["type"] == "scatter3d" and t["mode"] == "lines"
               for t in traces)
    assert traces[1]["x"] == [0.0, 0.0] and traces[1]["y"] == [0.0, 1.0]


def test_treegraph_data_names_and_structure():
    plant = SyntheticPlant(n_fruits=6)
    pts, lines = exact_skeleton(plant)
    T = compute_tree_graph(pts, lines, stem_axis=2, stem_axis_inverted=True)
    traces = vp.plotly_treegraph_data(T)
    names = [t["name"] for t in traces]
    assert "root" in names and "main stem" in names
    fruit_names = [n for n in names if n.startswith("fruit ")]
    assert len(fruit_names) == 6
    stem = traces[names.index("main stem")]
    assert len(stem["x"]) > 10
    assert any("type: main stem" in h for h in stem["hovertemplate"])


def test_direction_data():
    origins = np.zeros((3, 3))
    vectors = np.eye(3)
    traces = vp.plotly_direction_data(vectors, origins, label="fruit")
    assert [t["name"] for t in traces] == ["fruit 0", "fruit 1", "fruit 2"]
    assert traces[1]["y"] == [0.0, 1.0]


def test_sequence_traces():
    traces = vp._sequence_xy_traces({"angles": [137.0, 140.0],
                                     "internodes": [5.0, 6.0]})
    assert set(traces) == {"angles", "internodes"}
    assert traces["angles"]["x"] == [0, 1]
    assert traces["angles"]["y"] == [137.0, 140.0]


@pytest.mark.skipif(not _has_plotly(), reason="plotly not installed")
def test_figures_with_plotly(tmp_path):
    rng = np.random.default_rng(0)
    pcd = PointCloud(rng.normal(size=(50, 3)))
    fig = vp.plotly_pointcloud(pcd, n_pts=20, title="t")
    assert fig.layout.title.text == "t"
    skel = {"points": [[0, 0, 0], [0, 0, 1]], "lines": [[0, 1]]}
    assert len(vp.plotly_skeleton(skel).data) == 1
    seq = vp.plotly_vert_sequences({"angles": [130.0, 140.0]},
                                   y_axis_label="organ")
    assert len(seq.data) >= 1


def test_figure_builders_raise_without_plotly():
    if _has_plotly():
        pytest.skip("plotly installed")
    with pytest.raises(ImportError, match="plotly"):
        vp.plotly_pointcloud(PointCloud(np.zeros((4, 3))))

"""VERDICT r4 #6: can the IMLS mesh become connected enough that
CurveSkeleton method="mcf" needs no component bridging on virtual_plant?

Runs the virtual fixture's committed geom config up to TriangleMesh,
then sweeps mesh knobs (IMLS sigma, closing iterations, field blend)
and reports component counts + per-variant mcf skeleton quality
(angles / DTW ncost vs the fixture ground truth) against the committed
Xu route. CPU-heavy (~minutes per variant) — run alone on this 1-core
box.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

REPO = Path(__file__).resolve().parent


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from plant3dvision_tpu import fixtures
    from plant3dvision_tpu.fsdb import io
    from plant3dvision_tpu.fsdb.testing import TemporaryDB
    from plant3dvision_tpu.runtime import RunContext, run_task
    from plant3dvision_tpu.runtime.config import load_toml
    from tests.integration.test_reference_data import _fileset_of

    with TemporaryDB() as db:
        fixtures.load_reference_scan(db, "virtual_plant")
        cfg0 = load_toml(REPO / "configs" / "geom_pipe_virtual.toml")

        # baseline: committed Xu route numbers
        ctx = RunContext(db, "virtual_plant", cfg0)
        report = run_task(ctx, "AnglesAndInternodesEvaluation", report=False)
        ev = json.loads(ctx.scan.get_fileset(
            _fileset_of(ctx.scan, report, "AnglesAndInternodesEvaluation"))
            .get_file("AnglesAndInternodesEvaluation").read_raw())
        print(f"Xu committed: ncost {ev['normalized_cost']:.3f} "
              f"mean angle err {ev['mean_angle_error']:.1f}")

        import networkx as nx

        def mesh_components(mesh):
            g = nx.Graph()
            g.add_nodes_from(range(len(mesh.vertices)))
            t = np.asarray(mesh.triangles)
            g.add_edges_from(np.concatenate([t[:, :2], t[:, 1:],
                                             t[:, ::2]]))
            return nx.number_connected_components(g)

        # sweep: sigma (IMLS splat width), closing iterations
        from plant3dvision_tpu import proc3d
        pcd_file = ctx.scan.get_fileset(
            _fileset_of(ctx.scan, report, "PointCloud")).get_files()[0]
        pcd = io.read_point_cloud(pcd_file)
        vfile = ctx.scan.get_fileset(
            _fileset_of(ctx.scan, report, "Voxels")).get_files()[0]
        vs = float(vfile.get_metadata("voxel_size"))
        print(f"pcd {len(pcd)} pts, committed mesh voxel_size {vs}")

        for sigma in (0.6, 1.0, 1.5, 2.0):
            mesh = proc3d.pcd2mesh(pcd, voxel_size=vs, sigma=sigma)
            n = mesh_components(mesh)
            big = mesh.largest_connected_component()
            print(f"sigma={sigma}: components {n}, verts "
                  f"{len(mesh.vertices)} (largest {len(big.vertices)})")


if __name__ == "__main__":
    if "--volume-mc" not in sys.argv:
        main()


def variant_volume_mc():
    """A/B: mesh the CARVED volume directly (volume_mc; connected by
    construction, inflation ~half a voxel = 0.05 mm at this fixture)
    and run the mcf skeleton on it WITHOUT component bridging."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import networkx as nx

    from plant3dvision_tpu import fixtures
    from plant3dvision_tpu.fsdb.testing import TemporaryDB
    from plant3dvision_tpu.runtime import RunContext, run_task
    from plant3dvision_tpu.runtime.config import load_toml
    from tests.integration.test_reference_data import _fileset_of

    with TemporaryDB() as db:
        fixtures.load_reference_scan(db, "virtual_plant")
        cfg = load_toml(REPO / "configs" / "geom_pipe_virtual.toml")
        sk0 = cfg["CurveSkeleton"]
        cfg["TriangleMesh"] = dict(cfg.get("TriangleMesh", {}),
                                   upstream_task="PointCloud",
                                   library="volume_mc",
                                   filtering="")
        cfg["CurveSkeleton"] = {"upstream_task": "TriangleMesh",
                                "method": "mcf",
                                "bin_size": sk0.get("bin_size", 0.6),
                                "min_branch": 4.0,
                                "stem_axis_inverted": sk0.get(
                                    "stem_axis_inverted", False)}
        ctx = RunContext(db, "virtual_plant", cfg)
        report = run_task(ctx, "TriangleMesh", report=False)
        from plant3dvision_tpu.fsdb import io as fio
        mesh = fio.read_triangle_mesh(ctx.scan.get_fileset(
            _fileset_of(ctx.scan, report, "TriangleMesh")).get_files()[0])
        g = nx.Graph()
        g.add_nodes_from(range(len(mesh.vertices)))
        t = np.asarray(mesh.triangles)
        g.add_edges_from(np.concatenate([t[:, :2], t[:, 1:], t[:, ::2]]))
        ncomp = nx.number_connected_components(g)
        print(f"volume_mc mesh: {len(mesh.vertices)} verts, "
              f"{ncomp} components")
        report = run_task(ctx, "AnglesAndInternodesEvaluation",
                          report=False)
        ev = json.loads(ctx.scan.get_fileset(
            _fileset_of(ctx.scan, report, "AnglesAndInternodesEvaluation"))
            .get_file("AnglesAndInternodesEvaluation").read_raw())
        out = json.loads(ctx.scan.get_fileset(
            _fileset_of(ctx.scan, report, "AnglesAndInternodes"))
            .get_file("AnglesAndInternodes").read_raw())
        print(f"mcf-on-volume_mc: {len(out['angles'])} angles, "
              f"ncost {ev['normalized_cost']:.3f}, "
              f"mean err {ev['mean_angle_error']:.1f} "
              f"(Xu committed: 0.137 / 21.9)")


if __name__ == "__main__" and "--volume-mc" in sys.argv:
    variant_volume_mc()

"""FusedCarving must reproduce the Masks -> Voxels volume exactly."""

import numpy as np
import pytest

from plant3dvision_tpu.fsdb import io
from plant3dvision_tpu.fsdb.testing import TemporaryDB
from plant3dvision_tpu.runtime import RunContext, run_task
from plant3dvision_tpu.synth import SyntheticPlant, generate_scan

CFG_COMPAT = {
    "Masks": {"upstream_task": "ImagesFilesetExists", "type": "linear",
              "parameters": [1.0, 0.0, 0.0], "threshold": 0.3,
              "dilation": 0, "binarize": True},
    "Voxels": {"upstream_mask": "Masks", "upstream_colmap": "DummyTask",
               "camera_metadata": "camera", "voxel_size": 1.0,
               "type": "carving"},
}
CFG_FUSED = {
    "FusedCarving": {"upstream_task": "ImagesFilesetExists",
                     "camera_metadata": "camera", "voxel_size": 1.0,
                     "type": "linear", "parameters": [1.0, 0.0, 0.0],
                     "threshold": 0.3, "dilation": 0},
}


def test_fused_matches_task_chain():
    with TemporaryDB() as db:
        plant = SyntheticPlant(n_fruits=8, stem_radius=2.5, fruit_radius=1.8,
                               fruit_length=25.0, internode=7.0)
        generate_scan(db, "s", n_views=20, width=256, height=256, f=340.0,
                      plant=plant)

        ctx1 = RunContext(db, "s", CFG_COMPAT)
        run_task(ctx1, "Voxels", report=False)
        vfile = ctx1.scan.get_fileset(
            ctx1.get_task("Voxels").task_id()).get_files()[0]
        vol_chain = io.read_volume(vfile)

        ctx2 = RunContext(db, "s", CFG_FUSED)
        run_task(ctx2, "FusedCarving", report=False)
        ffile = ctx2.scan.get_fileset(
            ctx2.get_task("FusedCarving").task_id()).get_files()[0]
        vol_fused = io.read_volume(ffile)

        np.testing.assert_array_equal(vol_chain, vol_fused)
        assert (vol_fused == 1).sum() > 100
        # metadata parity so downstream tasks are interchangeable
        assert ffile.get_metadata("voxel_size") == vfile.get_metadata("voxel_size")
        assert ffile.get_metadata("origin") == vfile.get_metadata("origin")

        # decode||carve overlap: 3 uneven groups (7+7+6 views, padded to
        # 7 with valid=False) must merge to the identical label volume
        cfg_ovl = {"FusedCarving": dict(CFG_FUSED["FusedCarving"],
                                        overlap_groups=3)}
        ctx3 = RunContext(db, "s", cfg_ovl)
        # overlap_groups is non-significant (same task id) — force re-run
        ctx3.scan.delete_fileset(ctx3.get_task("FusedCarving").task_id())
        run_task(ctx3, "FusedCarving", report=False)
        ofile = ctx3.scan.get_fileset(
            ctx3.get_task("FusedCarving").task_id()).get_files()[0]
        np.testing.assert_array_equal(vol_chain, io.read_volume(ofile))

        # "sharded" engine: the multi-chip lane (view-sharded hierarchical
        # carve, pmax joins per level) through the PRODUCT task, over the
        # 8-device virtual mesh — must also be bit-identical
        cfg_sh = {"FusedCarving": dict(CFG_FUSED["FusedCarving"],
                                       engine="sharded")}
        ctx4 = RunContext(db, "s", cfg_sh)
        ctx4.scan.delete_fileset(ctx4.get_task("FusedCarving").task_id())
        run_task(ctx4, "FusedCarving", report=False)
        sfile = ctx4.scan.get_fileset(
            ctx4.get_task("FusedCarving").task_id()).get_files()[0]
        np.testing.assert_array_equal(vol_chain, io.read_volume(sfile))

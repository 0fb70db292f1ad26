"""Canonical output file ids (role of reference plant3dvision/filenames.py)."""

COLMAP_SPARSE_ID = "sparse"
COLMAP_POINTS_ID = "points3d"
COLMAP_IMAGES_ID = "images"
COLMAP_CAMERAS_ID = "cameras"
COLMAP_DENSE_ID = "dense"

ANGLES_ID = "AnglesAndInternodes"
SKELETON_ID = "CurveSkeleton"
TREE_ID = "TreeGraph"
PCD_ID = "PointCloud"
MESH_ID = "TriangleMesh"
VOXELS_ID = "Voxels"

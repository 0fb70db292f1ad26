"""Pipeline tasks (L4). Importing this package registers every task with the
runtime's TaskRegistry — the CLI relies on that."""

# Base/marker/utility tasks come with the runtime:
from ..runtime.task import (  # noqa: F401
    Clean,
    DatasetExists,
    DummyTask,
    FilesetExists,
    ImagesFilesetExists,
    ModelFilesetExists,
    VirtualPlantObj,
)
from .proc2d import Undistorted, Masks  # noqa: F401
from .cl import Voxels  # noqa: F401
from .proc3d import PointCloud, TriangleMesh, CurveSkeleton, RefineSkeleton  # noqa: F401
from .arabidopsis import TreeGraph, AnglesAndInternodes  # noqa: F401

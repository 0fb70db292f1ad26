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
from .proc2d import Undistorted, Masks, Segmentation2D  # noqa: F401
from .cl import Voxels, VoxelsWithPrior  # noqa: F401
from .visualization import Visualization  # noqa: F401
from .fused import FusedCarving  # noqa: F401
from .fused_ml import FusedSegmentationCarving  # noqa: F401
from .proc3d import (  # noqa: F401
    PointCloud,
    TriangleMesh,
    CurveSkeleton,
    RefineSkeleton,
    SegmentedPointCloud,
    ClusteredMesh,
    OrganSegmentation,
)
from .arabidopsis import TreeGraph, AnglesAndInternodes  # noqa: F401
from .colmap import Colmap, TurntableCalibration  # noqa: F401
from ..runtime.task import (  # noqa: F401
    NamedFilesetExists,
    Segmentation2DGroundTruthFilesetExists,
)
from .calibration import (  # noqa: F401
    CreateCharucoBoard,
    DetectCharuco,
    IntrinsicCalibration,
    ExtrinsicCalibration,
    IntrinsicCalibrationExists,
    ExtrinsicCalibrationExists,
)
from .evaluation import (  # noqa: F401
    AnglesAndInternodesEvaluation,
    ClusteredMeshGroundTruth,
    CylinderRadiusEstimation,
    CylinderRadiusGroundTruth,
    PointCloudEvaluation,
    PointCloudGroundTruth,
    Segmentation2DEvaluation,
    SegmentedPointCloudEvaluation,
    VoxelsEvaluation,
    VoxelsGroundTruth,
)

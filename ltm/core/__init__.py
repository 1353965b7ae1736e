from ltm.core import se3  # noqa: F401
from ltm.core.pointcloud import PointCloud  # noqa: F401
from ltm.core.config import (  # noqa: F401
    ICPConfig,
    LTSlamConfig,
    RemovertConfig,
    ScanContextConfig,
    SolverConfig,
)

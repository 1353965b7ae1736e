from ltm.slam.pipeline import LTSlam, LTSlamResult  # noqa: F401
from ltm.slam.session import SlamSession  # noqa: F401

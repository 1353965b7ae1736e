from ltm.removert.pipeline import Removerter, RemovertResult  # noqa: F401
from ltm.removert.session import RemovertInput, RemovertSession  # noqa: F401

from ltm.utils.logging import get_logger, stage_timer  # noqa: F401

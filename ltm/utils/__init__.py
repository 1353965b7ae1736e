from ltm.utils.logging import (  # noqa: F401
    count_slots,
    current_stage,
    get_logger,
    reset_slot_counts,
    slot_counts,
    stage_timer,
)

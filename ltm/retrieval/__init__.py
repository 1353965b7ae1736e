from ltm.retrieval.scancontext import (  # noqa: F401
    detect_loops_between_sessions,
    ring_keys,
    sc_distance_matrix,
    sector_keys,
)

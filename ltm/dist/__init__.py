from ltm.dist.mesh import KF_AXIS, make_mesh, pad_to_multiple  # noqa: F401
from ltm.dist.init import initialize_multihost, is_multihost  # noqa: F401
from ltm.dist.sharding import (  # noqa: F401
    icp_batch_sharded,
    knn_avg_sqdist_sharded,
    sc_distance_sharded,
    sweep_discrepancy_map_sharded,
    sweep_discrepancy_sharded,
)
from ltm.dist.solver import pad_graph_for_mesh, solve_sharded  # noqa: F401
from ltm.dist.removert import (  # noqa: F401
    block_projected_scan_images_sharded,
    block_sweep_discrepancy_sharded,
    block_sweep_discrepancy_vs_images_sharded,
    block_sweep_visibility_sharded,
    chunk_knn_sqdists_sharded,
    projected_scan_images_sharded,
    sweep_discrepancy_vs_images_sharded,
    sweep_visibility_sharded,
)

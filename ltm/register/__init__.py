from ltm.register.icp import ICPResult, fitness_score, icp_batch, icp_point_to_point  # noqa: F401

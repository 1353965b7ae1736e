from ltm.graph.factors import GraphData, build_graph_data  # noqa: F401
from ltm.graph.solver import marginal_covariance, solve, SolveInfo  # noqa: F401

from ltm.kernels import knn, polar_bin, projection, voxel  # noqa: F401

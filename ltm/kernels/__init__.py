from ltm.kernels import blocks, knn, pallas_knn, polar_bin, projection, voxel  # noqa: F401

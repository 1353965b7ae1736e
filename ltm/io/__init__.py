from ltm.io.g2o import G2oGraph, read_g2o, write_g2o  # noqa: F401
from ltm.io.pcd import read_pcd, write_pcd, read_kitti_bin, write_kitti_bin  # noqa: F401
from ltm.io.poses import read_kitti_poses, write_kitti_poses  # noqa: F401
from ltm.io.scd import read_scd, write_scd  # noqa: F401
from ltm.io.sessions import SessionData, load_session_dir, write_session_dir  # noqa: F401

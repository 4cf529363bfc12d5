from orb_slam2_tpu.solvers import twoview as twoview
from orb_slam2_tpu.solvers import pose_opt as pose_opt
from orb_slam2_tpu.solvers import triangulate as triangulate

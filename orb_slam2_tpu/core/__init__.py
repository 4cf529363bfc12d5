from orb_slam2_tpu.core import lie as lie
from orb_slam2_tpu.core import camera as camera

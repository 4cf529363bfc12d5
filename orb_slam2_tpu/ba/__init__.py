from orb_slam2_tpu.ba import schur as schur
from orb_slam2_tpu.ba import local as local

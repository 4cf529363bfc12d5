from orb_slam2_tpu.distributed.ba import distributed_ba_solve, make_obs_mesh

from orb_slam2_tpu.frontend.extractor import Features, build_extractor

from orb_slam2_tpu.map.state import MapState, empty_map

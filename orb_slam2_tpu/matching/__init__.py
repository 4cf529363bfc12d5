from orb_slam2_tpu.matching.hamming import hamming_matrix, hamming_rows
from orb_slam2_tpu.matching import search as search

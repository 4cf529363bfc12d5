from orb_slam2_tpu.place.vocab import Vocabulary, train_vocabulary

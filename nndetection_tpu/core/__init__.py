from nndetection_tpu.core import boxes

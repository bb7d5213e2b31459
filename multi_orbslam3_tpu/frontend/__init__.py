"""ORB front end: pyramid, FAST, orientation, BRIEF-256, Hamming matching.

TPU-first redesign of the reference's ORBextractor.cc / ORBmatcher.cc:
dense per-pixel kernels over fixed-shape images instead of scalar loops,
grid-bucketed top-K instead of the quadtree, and descriptor matching as
XOR+popcount reductions shaped for the VPU/MXU.
"""

from multi_orbslam3_tpu.frontend.extractor import extract_features, FrameFeatures  # noqa: F401
from multi_orbslam3_tpu.frontend import matcher  # noqa: F401

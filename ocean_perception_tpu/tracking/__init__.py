"""Sparse feature front-end (reference: src/vehicle/feature_tracking).

- ``detector``: Shi-Tomasi/Harris corner scoring + grid-distributed top-K
  (the ANMS equivalent) with masking around already-tracked points.
- ``lk``: pyramidal Lucas-Kanade optical flow, vmapped over keypoints, with
  bidirectional consistency checking.
- ``stripe_match``: per-keypoint stereo template matching along the epipolar
  stripe (SQDIFF_NORMED), batched as convolutions.
- ``tracks`` / ``stereo_tracker``: the fixed-capacity track table and the
  TrackAndTriangulate state machine as a pure function over it.

Everything is static-shape: K keypoint slots with validity masks replace the
reference's dynamic containers (SURVEY.md §7 hard parts).
"""

from .detector import DetectorParams, detect_features  # noqa: F401
from .lk import LKParams, pyramidal_lk, track_points  # noqa: F401
from .stripe_match import StripeMatcherParams, match_rectified  # noqa: F401
from .tracks import TrackTable, LandmarkObservation  # noqa: F401
from .stereo_tracker import StereoTrackerParams, StereoTrackerState, track_and_triangulate  # noqa: F401
from .apriltags import TagFamily, TagDetection, detect_tags, render_tag, tag_pose  # noqa: F401

from . import linalg, transform, ransac, homography, essential, calib, lm  # noqa: F401

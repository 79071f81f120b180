from . import (linalg, transform, ransac, homography, essential,
               calib, lm, statsfit)  # noqa: F401

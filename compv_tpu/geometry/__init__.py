from . import linalg, transform, ransac, homography  # noqa: F401

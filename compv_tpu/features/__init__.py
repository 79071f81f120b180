from . import fast, brief, orb, edges, canny, hog, hough_sht, ccl  # noqa: F401

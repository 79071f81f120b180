from . import fast, brief, orb, edges, canny, hog, hough_sht, hough_kht, ccl  # noqa: F401

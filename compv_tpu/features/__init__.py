from . import (fast, brief, orb, edges, canny, hog, hough_sht,
               hough_kht, ccl, mser)  # noqa: F401

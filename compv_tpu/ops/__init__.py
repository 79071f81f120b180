from . import (color, convolve, histogram, mathutils, morphology,
               remap, resize, threshold, bits)  # noqa: F401

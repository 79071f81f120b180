from . import color, convolve, histogram, mathutils, morphology, remap, resize, threshold  # noqa: F401

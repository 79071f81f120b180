"""Host-side visualization (results inspection).

The reference's presentation stack (drawing/ + gl/, ~10k LoC: GL windows,
shader blitters, freetype text, matching-layer side-by-side rendering —
compv_window.h:75-147, drawMatches) is interactive-UI plumbing, not compute;
SURVEY §7 keeps it host-side and minimal. These helpers rasterize results
(points, lines, matches, boxes) straight into numpy RGB images, savable via
io.image and viewable anywhere; matplotlib is optional sugar.
"""
from .draw import (draw_points, draw_lines, draw_matches, draw_boxes,
                   draw_text, draw_trajectory, to_rgb)  # noqa: F401
from .live import LiveViewer, MJPEGServer  # noqa: F401

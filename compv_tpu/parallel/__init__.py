from . import mesh, dist_ba, dist_match, dist_image  # noqa: F401

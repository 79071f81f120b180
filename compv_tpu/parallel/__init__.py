from . import mesh, dist_ba, dist_match, dist_image, dist_frontend  # noqa: F401

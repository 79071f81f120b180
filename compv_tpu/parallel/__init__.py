from . import mesh, dist_ba, dist_match  # noqa: F401

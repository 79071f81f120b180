from . import bruteforce, flann  # noqa: F401

from . import bruteforce  # noqa: F401

from . import camera, ba, posegraph  # noqa: F401

from . import fast, brief, orb  # noqa: F401

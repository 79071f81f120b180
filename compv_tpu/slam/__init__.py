from . import camera, ba, posegraph, pnp, vo  # noqa: F401

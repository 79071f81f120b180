from .types import Image, PixelFormat, Points, Descriptors, Matches, concat_points  # noqa: F401
from .config import (  # noqa: F401
    FastConfig, FastType, OrbConfig, CannyConfig, MatchConfig, RansacConfig,
    HoughConfig, HogConfig, BAConfig, Interp, BorderMode,
)
from .registry import register, create, available  # noqa: F401

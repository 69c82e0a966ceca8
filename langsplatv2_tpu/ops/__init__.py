from .rasterize import (  # noqa: F401
    RasterizeSettings,
    rasterize,
)

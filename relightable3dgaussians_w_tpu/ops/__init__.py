from .rasterize import (  # noqa: F401
    RasterizerConfig,
    CameraMatrices,
    rasterize,
    rasterize_aux,
)

from .masks import mask_nms, masks_update  # noqa: F401
from .pipeline import create, PreprocessPipeline  # noqa: F401

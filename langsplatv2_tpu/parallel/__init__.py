from .sharding import (  # noqa: F401
    make_device_mesh,
    rasterize_sharded,
    make_sharded_feature_train_step,
)

from .sharding import (  # noqa: F401
    make_device_mesh,
    rasterize_sharded,
    make_sharded_feature_train_step,
    make_sharded_rgb_train_step,
)
from .gauss_sharded import rasterize_gauss_sharded  # noqa: F401
from .distributed import (  # noqa: F401
    initialize_distributed,
    save_checkpoint_multihost,
    sync_hosts,
)

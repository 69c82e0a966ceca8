from . import sh, camera_math, transforms, losses, schedules, sparse_codes  # noqa: F401

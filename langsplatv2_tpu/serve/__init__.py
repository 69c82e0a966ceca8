from .backend import BackendRenderer  # noqa: F401

from .openclip import OpenCLIPNetwork  # noqa: F401

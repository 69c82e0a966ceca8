from .config import ModelParams, PipelineParams, OptimizationParams  # noqa: F401

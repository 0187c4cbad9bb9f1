from .cascade import CascadePipeline

__all__ = ["CascadePipeline"]

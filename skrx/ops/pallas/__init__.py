from .topk_blocks import blockwise_topk

__all__ = ["blockwise_topk"]

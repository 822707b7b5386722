from .attention import multi_head_attention
from .segment import masked_mean, masked_max, masked_sum

__all__ = ["multi_head_attention", "masked_mean", "masked_max", "masked_sum"]

from .mvf import dw3, hard_sigmoid, hard_swish, mvf_conv_sum

__all__ = ['dw3', 'hard_sigmoid', 'hard_swish', 'mvf_conv_sum']

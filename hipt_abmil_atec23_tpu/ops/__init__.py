"""Numerical kernels: masked MIL pooling, flash attention, image ops, bootstrap."""

from hipt_abmil_atec23_tpu.ops.masking import (
    masked_softmax,
    masked_top_k,
    masked_bottom_k,
    pad_bag,
    NEG_INF,
)

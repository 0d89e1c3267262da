"""Native host-side kernels (C++ via ctypes).

Build-on-demand shared library with the reference's native capabilities
(skrec/utils/py/cython/): thread-pooled ranking evaluator, batched rejection
negative sampler, row-wise top-k, ABI guard. See csrc/skrx_native.cc.
"""
from .lib import (available, eval_score_matrix_native,
                  batch_sample_negatives_native, top_k_native, sort_native,
                  arg_sort_native)

__all__ = ["available", "eval_score_matrix_native",
           "batch_sample_negatives_native", "top_k_native", "sort_native",
           "arg_sort_native"]

"""Run-level configuration.

Capability parity with reference skrec/run_config.py:7-43, extended with
TPU-native run options (mesh shape, dtype policy) that the reference — a
single-GPU library — does not have.
"""
from typing import Optional, Tuple, Union

from .utils.config import Config

__all__ = ["RunConfig"]

_VALID_COLUMNS = ("UI", "UIR", "UIT", "UIRT")
_VALID_METRICS = ("Precision", "Recall", "MAP", "NDCG", "MRR")


class RunConfig(Config):
    recommender: str = "BPRMF"
    data_dir: str = ""
    file_column: str = "UIRT"
    sep: str = "\t"
    hyperopt: bool = False
    # Kept for CLI compatibility with the reference (gpu_id selects the CUDA
    # device there); on TPU the device set is controlled by the runtime.
    gpu_id: Union[int, str] = 0
    metric: Tuple[str, ...] = ("Precision", "Recall", "MAP", "NDCG")
    top_k: Tuple[int, ...] = (10, 20, 30, 40, 50)
    # int (reference default 64) or "auto": pick the largest power-of-two
    # batch whose (B, num_items) score block stays <= ~256 MB, clamped to
    # [64, 4096]. Metrics are batch-size invariant; "auto" only changes
    # throughput (eval saturates >= B=1024 at N=40k — BASELINE.md).
    test_batch_size: Union[int, str] = 64
    # Host threads for the input pipeline (the reference uses this for its
    # C++ ranking thread pool; evaluation here runs on device).
    test_thread: int = 4
    seed: int = 2021

    # --- TPU-native extensions (no reference counterpart) ---
    # Mesh axis sizes (data, model). None => single device.
    mesh_shape: Optional[Tuple[int, int]] = None
    # Compute dtype for dense towers: "float32" | "bfloat16". Routed into the
    # model config when the model declares a ``compute_dtype`` field
    # (SASRec/BERT4Rec/MultVAE: transformer/MLP matmuls in bf16 with f32
    # master weights); models without a bf16 path warn-and-ignore — their
    # math stays f32 for metric parity with the reference.
    compute_dtype: str = "float32"
    # Checkpoint/resume: save params+opt_state every N epochs to
    # checkpoint_dir; resume=True restores the latest checkpoint at fit().
    checkpoint_dir: str = ""
    checkpoint_every: int = 0
    resume: bool = False
    # Write a jax.profiler trace of one training epoch + one evaluation to
    # this directory (view with TensorBoard / xprof). Empty disables.
    profile_dir: str = ""
    # Evaluation strategy: "auto" picks tensor-parallel top-k when the mesh
    # has a model axis > 1, fused (single score+select Pallas kernel; dot-
    # scoring models on single-device TPU) or chunked (never materialize
    # (B, N)) when num_items >= eval_chunk_threshold, full otherwise.
    # "full" / "chunked" / "fused" / "topk" force a strategy. All produce
    # identical metrics.
    eval_mode: str = "auto"
    eval_chunk_size: int = 65536
    eval_chunk_threshold: int = 131072

    def _validate(self):
        assert isinstance(self.recommender, str) and self.recommender
        assert isinstance(self.data_dir, str)
        assert self.file_column in _VALID_COLUMNS, \
            f"file_column must be one of {_VALID_COLUMNS}"
        if isinstance(self.metric, str):
            self.metric = (self.metric,)
        self.metric = tuple(self.metric)
        for m in self.metric:
            assert m in _VALID_METRICS, f"unknown metric {m!r}"
        if isinstance(self.top_k, int):
            self.top_k = (self.top_k,)
        self.top_k = tuple(int(k) for k in self.top_k)
        assert all(k > 0 for k in self.top_k)
        if isinstance(self.test_batch_size, str):
            assert self.test_batch_size == "auto", \
                "test_batch_size must be a positive int or 'auto'"
        else:
            assert self.test_batch_size > 0
        assert self.test_thread > 0
        assert isinstance(self.seed, int)
        assert self.compute_dtype in ("float32", "bfloat16")
        assert self.eval_mode in ("auto", "full", "chunked", "fused", "topk")
        assert self.eval_chunk_size > 0 and self.eval_chunk_threshold > 0

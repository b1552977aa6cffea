from .infer_task import InferTask, TaskConfig, bucket_batch_size, BUCKET_SIZES
from .device import default_backend, compute_dtype

__all__ = [
    "InferTask",
    "TaskConfig",
    "bucket_batch_size",
    "BUCKET_SIZES",
    "default_backend",
    "compute_dtype",
]

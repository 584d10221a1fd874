from real3dportrait_tpu.data.collate import batch_by_size, collate_nd, make_mask
from real3dportrait_tpu.data.datasets import (
    Audio2MotionDataset,
    Motion2VideoDataset,
    SyncNetDataset,
)
from real3dportrait_tpu.data.indexed_dataset import IndexedDataset, IndexedDatasetBuilder

__all__ = [
    "batch_by_size",
    "collate_nd",
    "make_mask",
    "Audio2MotionDataset",
    "Motion2VideoDataset",
    "SyncNetDataset",
    "IndexedDataset",
    "IndexedDatasetBuilder",
]

from .hf_vision_data import (
    DataLoader,
    FileVisionDataset,
    HFVisionDataset,
    SyntheticAudioDataset,
    SyntheticVisionDataset,
    build_dataloader,
    get_reverse_transform,
    get_transform,
    preprocess_batch,
)
from .native import fast_stack, native_available
from .prefetch import ThreadedPrefetcher

from . import pipelines  # noqa: F401  (register PIPELINES)
from .datasets import (BaseMotionDataset, ConcatDataset, FinedanceMotionDataset,
                       RepeatDataset, SpeechMotionDataset, TextMixMotionDataset,
                       TextMotionDataset, beat2_pose_to_smplx322, build_mixed_dataset,
                       finedance_to_smplx322)
from .loader import DataLoader, RoundUpSampler, build_dataloader, collate

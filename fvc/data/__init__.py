from fvc.data.datasets import (
    VideoDataset, FrameDataset, MultiViewVideoDataset, SyntheticVideoDataset,
    read_yuv, read_image,
)

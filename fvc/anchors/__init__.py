from fvc.anchors.x26x import (
    compress_whole_video, bpg_compress_frame, pack_views,
    ffmpeg_available, bpg_available,
)

"""Host-side IO: image files, video/frame streams, checkpoints.

Reference coverage: CompVImageDecoder (base/image/compv_image_decoder.cxx,
libjpeg), CompVFileUtils (raw reads), the FFmpeg video reader
(core/compv_core_video_reader_ffmpeg.cxx:68-221; the writer there is an
empty stub), and the ML save/load persistence — upgraded to full pipeline
checkpointing (SURVEY §5: "TPU build needs real checkpointing").
"""
from . import image, video, checkpoint, camera  # noqa: F401

from drt_tpu.data.views import CaptureData, ViewBatch  # noqa: F401
from drt_tpu.data.masks import process_mask  # noqa: F401
from drt_tpu.data.synthetic import synthesize_capture  # noqa: F401
from drt_tpu.data.captured import load_h5_capture  # noqa: F401

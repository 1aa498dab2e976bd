from drt_tpu.intersect.api import get_intersect_fn, Hits  # noqa: F401
from drt_tpu.intersect.brute import intersect_brute  # noqa: F401

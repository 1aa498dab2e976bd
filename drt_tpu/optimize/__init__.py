from drt_tpu.optimize.losses import LossWeights, ray_loss, silhouette_loss, smooth_loss, total_loss  # noqa: F401
from drt_tpu.optimize.schedules import interp_linear, interp_reciprocal  # noqa: F401
from drt_tpu.optimize.loop import optimize, make_train_step  # noqa: F401

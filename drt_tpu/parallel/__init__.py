from drt_tpu.parallel.sharding import (  # noqa: F401
    make_ray_mesh, shard_views, replicate, make_sharded_train_step,
    pad_views_to_multiple,
)

"""Multi-host initialization (SURVEY.md §2.3 comm-backend plan).

The reference is single-process/single-GPU; scaling across hosts here uses
jax.distributed + GSPMD over a global ray mesh. On a TPU pod slice, call
`init_multihost()` once at program start on every host (controller discovery
is automatic on TPU VMs); every host then sees the global device list and
`make_ray_mesh(jax.devices())` spans the slice — ray tiles ride ICI within
a host's chips and DCN across hosts, while the only cross-host collective is
the V x 3 vertex-gradient all-reduce that GSPMD inserts (overlapped with the
backward pass by XLA's latency-hiding scheduler).
"""

from __future__ import annotations

from typing import Optional


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed. On TPU VMs all arguments are discovered
    from the environment; set them explicitly for CPU/GPU clusters."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def shard_rays_for_host(n_rays: int) -> slice:
    """The contiguous ray range this host should load (per-host data
    loading: each host materializes only its shard of the per-pixel
    arrays before device_put with the global sharding).

    Requires n_rays to divide evenly over the processes — the same
    requirement NamedSharding's even-shard placement and shard_map impose
    downstream. Pad the batch first (parallel.sharding.pad_views_to_multiple)
    rather than loading uneven host shards that placement would reject."""
    import jax

    n_proc = jax.process_count()
    if n_rays % n_proc:
        raise ValueError(
            f"n_rays={n_rays} does not divide over {n_proc} processes; "
            "pad the ray batch to a multiple first "
            "(drt_tpu.parallel.pad_views_to_multiple)")
    per = n_rays // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)

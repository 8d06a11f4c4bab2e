from trackdlo_tpu.parallel.sharding import (
    build_batched_step_fn,
    build_parallel_step_fn,
    make_tracking_mesh,
    replicate_state,
)

__all__ = [
    "make_tracking_mesh",
    "build_batched_step_fn",
    "build_parallel_step_fn",
    "replicate_state",
]

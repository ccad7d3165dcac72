"""Multi-chip parallelism: mesh construction + sharded demod scoring."""

from .sharding import (  # noqa: F401
    make_mesh,
    sharded_score_fn,
    sharded_decode_step,
)

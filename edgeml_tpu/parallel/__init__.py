from .mesh import (
    make_mesh,
    shard_along,
    replicate,
    initialize_distributed,
    is_primary,
)
from .meters import SmoothedValue, MetricLogger

__all__ = [
    "make_mesh",
    "shard_along",
    "replicate",
    "initialize_distributed",
    "is_primary",
    "SmoothedValue",
    "MetricLogger",
]

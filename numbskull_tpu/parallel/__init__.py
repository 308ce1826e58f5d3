"""Multi-device parallelism: chain replication and graph sharding."""

from numbskull_tpu.parallel.mesh import make_mesh  # noqa: F401
from numbskull_tpu.parallel.partition import (  # noqa: F401
    balanced_partition, choose_partition, connected_components, edge_cut,
    make_part_plans, partition_cost,
)


def __getattr__(name):
    # lazy: sharded/bsp import jax-heavy modules
    if name in ("ShardedGibbsEngine", "ShardedState"):
        from numbskull_tpu.parallel import sharded
        return getattr(sharded, name)
    if name in ("BSPEngine", "BSPItemGridInference"):
        from numbskull_tpu.parallel import bsp
        return getattr(bsp, name)
    raise AttributeError(name)

"""newton_krylov_ooc_tpu.parallel: device meshes, shardings, multi-host
bootstrap, and distributed solves"""

from .distributed import (  # noqa: F401
    auto_mesh_shape,
    bootstrap,
    device_memory_bytes,
    sharded_block_banded_solve,
)
from .mesh import (  # noqa: F401
    make_mesh,
    module_sharding,
    replicated,
    space_sharding_2d,
    state_sharding,
)
from .sharded_transport3d import (  # noqa: F401
    ShardedTransport3dKernel,
    build_sharded_transport3d_year,
)
from .sharded_year import (  # noqa: F401
    ShardedForcedFamilyKernel,
    ShardedIageKernel,
    ShardedPhosphorusKernel,
    ShardedYearData,
    build_sharded_year,
    build_sharded_year_pallas,
)

from luminoth_tpu.parallel.distributed import (  # noqa: F401
    initialize_from_env,
    worker_env,
)
from luminoth_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    is_chief,
    make_mesh,
    replicate_sharding,
    shard_batch,
)

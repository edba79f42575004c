from onset_fingerprinting_tpu.parallel.distributed import (
    global_mesh,
    init_distributed,
    pod_env_detected,
)
from onset_fingerprinting_tpu.parallel.mesh import (
    default_mesh,
    make_mesh,
)
from onset_fingerprinting_tpu.parallel.sharding import (
    detect_events_time_sharded,
    detect_fingerprint_sharded,
    detect_offline_sharded,
    detect_offline_time_sharded,
    make_detect_fingerprint_sharded,
    make_detect_locate_sharded,
    shard_batch,
)

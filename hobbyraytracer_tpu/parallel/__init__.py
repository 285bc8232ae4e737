from .shard import (  # noqa: F401
    make_mesh, render_sharded, replicate_scene, shard_rays,
    sharded_fit_step, init_multihost,
)

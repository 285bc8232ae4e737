from . import mathx, quat, rng, types  # noqa: F401

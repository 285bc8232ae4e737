from .schema import load_scene_desc  # noqa: F401
from .build import build_scene  # noqa: F401

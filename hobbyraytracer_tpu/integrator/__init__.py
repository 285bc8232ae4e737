from .path import MAX_DEPTH, render_image, trace  # noqa: F401

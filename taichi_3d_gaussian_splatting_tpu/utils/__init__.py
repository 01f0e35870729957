from .visualization import easy_cmap, make_image_grid  # noqa: F401

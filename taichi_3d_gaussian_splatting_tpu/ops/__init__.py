from . import transforms, sh, gaussian, projection, tiling  # noqa: F401

from .scene import GaussianPointCloudScene, SceneConfig  # noqa: F401

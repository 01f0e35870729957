from .dataset import ImagePoseDataset, PrefetchLoader  # noqa: F401

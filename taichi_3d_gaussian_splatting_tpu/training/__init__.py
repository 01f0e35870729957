from .loss import LossFunction, LossFunctionConfig  # noqa: F401

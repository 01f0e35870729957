from .sharding import (make_mesh, make_data_parallel_train_step,  # noqa: F401
                       replicate_scene)

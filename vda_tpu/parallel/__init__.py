from vda_tpu.parallel.mesh import make_mesh, param_shardings, data_sharding  # noqa: F401
from vda_tpu.parallel.train import TrainState, make_train_step  # noqa: F401

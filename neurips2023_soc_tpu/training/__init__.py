from .optim import build_optimizer, multistep_schedule
from .train_step import TrainState, create_train_state, make_forward_fn, make_train_step
from .checkpoint import CheckpointManager, load_pretrained_into_params

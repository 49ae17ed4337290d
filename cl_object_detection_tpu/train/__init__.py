from .optim import make_optimizer, param_labels, set_learning_rate, set_beta1
from .state import TrainState

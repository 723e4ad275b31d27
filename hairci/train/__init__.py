from hairci.train.state import TrainState, ema_update
from hairci.train.optim import make_optimizer, decay_mask

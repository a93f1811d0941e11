from cvd_tpu.train.losses import masked_mse_loss, epi_distance_loss
from cvd_tpu.train.state import TrainState, create_train_state, trainable_mask

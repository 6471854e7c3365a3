from gluon_e2e_asr_tpu.training.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
    make_optimizer,
)
from gluon_e2e_asr_tpu.training.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    latest_checkpoint,
)
from gluon_e2e_asr_tpu.training.trainer import Trainer

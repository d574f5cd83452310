from raw2logit_tpu.training.core import (TrainConfig, TrainState,
                                         create_train_state, make_eval_step,
                                         make_staged_train_step,
                                         make_train_step)

__all__ = ["TrainConfig", "TrainState", "create_train_state",
           "make_train_step", "make_staged_train_step", "make_eval_step"]

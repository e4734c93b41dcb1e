from .learners import (Learner, SourceLearner, SourceFreeLearner,
                       SourceTargetLearner, FullySupervisedLearner,
                       TestLearner, PROTOCOLS, build_learner)
from .optim import build_optimizer, torch_sgd, torch_warmup_poly_schedule
from .state import (TrainState, save_checkpoint, restore_state,
                    load_module_params, state_from_variables)
from .steps import make_train_step, make_eval_step, make_forward

from .train import TRAINERS, Trainer, MultiDatasetTrainer, build_trainer
from .train_step import TrainState, create_train_state, make_train_step
from .infer import FeatureExtractor
from .hooks.default import HOOKS, HookBase, build_hooks
from . import eval  # noqa: F401
from .hooks import misc as _hooks_misc  # noqa: F401
from .hooks import evaluator as _hooks_eval  # noqa: F401
from .test import TESTERS, build_tester
from . import pretrain as _pretrain  # noqa: F401 (registers SSL trainer)

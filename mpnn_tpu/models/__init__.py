from .net import Net, Ctx, Rec, n_leaves
from .sr import SRNet
from .actor import ActorNet
from .critic import CriticNet
from .routing import propagate, switch_probs
from .optim import talr_scale_grads, momentum_init, momentum_update
from .steps import Schedules, make_train_step, make_eval_split_fn, \
    init_training
from .stats import state_stats, tot_n_ops

__all__ = [
    "Net", "Ctx", "Rec", "n_leaves", "SRNet", "ActorNet", "CriticNet",
    "propagate", "switch_probs", "talr_scale_grads", "momentum_init",
    "momentum_update", "Schedules", "make_train_step", "make_eval_split_fn",
    "init_training", "state_stats", "tot_n_ops",
]

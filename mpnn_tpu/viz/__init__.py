from . import loading, acc_eff, nld, routing

__all__ = ["loading", "acc_eff", "nld", "routing"]

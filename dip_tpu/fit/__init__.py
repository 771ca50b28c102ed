from dip_tpu.fit.engine import Engine, FitConfig, FitState, fit, init_fit

__all__ = ["Engine", "FitConfig", "FitState", "fit", "init_fit"]

from .logging import MetricsLogger, Timer, profile_epoch

__all__ = ["MetricsLogger", "Timer", "profile_epoch"]

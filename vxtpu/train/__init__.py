from vxtpu.train.loss import mse, psnr
from vxtpu.train.loop import TrainConfig, fit_soft

__all__ = ["mse", "psnr", "TrainConfig", "fit_soft"]

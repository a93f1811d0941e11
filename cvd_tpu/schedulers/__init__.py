from cvd_tpu.schedulers.ddim import DDIMScheduler, DDIMState

"""Flax model zoo. Submodules are imported directly to keep import cost low:

    from cvd_tpu.models.unet import UNet3DConditionModel
    from cvd_tpu.models import layers
"""

from cvd_tpu.io.torch_io import load_torch_state
from cvd_tpu.io.key_mapping import torch_key_to_flax_path, merge_torch_state
from cvd_tpu.io.checkpoints import (
    load_sd_pipeline_weights,
    load_motion_module_weights,
    load_epi_module_weights,
    load_pose_adaptor_weights,
)
from cvd_tpu.io.lora import fuse_lora_into_unet_state

from cvd_tpu.models.unet import UNet3DConditionModel, UNetConfig
from cvd_tpu.models.pose_encoder import CameraPoseEncoder
from cvd_tpu.models.vae import AutoencoderKL, VAEConfig
from cvd_tpu.models.clip_text import CLIPTextEncoder, CLIPTextConfig

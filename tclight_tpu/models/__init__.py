from tclight_tpu.models.unet import UNetConfig, UNet2DCondition, ToMeSpec
from tclight_tpu.models.vae import VAEConfig, Encoder, Decoder, AutoencoderKL
from tclight_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel

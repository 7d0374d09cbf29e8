from villandiffusion_tpu.models.unet2d import UNet2D, UNet2DConfig  # noqa: F401

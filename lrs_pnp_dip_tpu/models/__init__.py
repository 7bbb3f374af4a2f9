"""DIP network zoo and the string-keyed model factory.

Mirrors reference ``models/__init__.py:8-32`` (``get_net``) with the same
dispatch keys plus this framework's additions.
"""

from __future__ import annotations

from .common import (
    BatchNorm2d,
    Conv2d,
    GenNoise,
    MeanOnlyBatchNorm,
    activation,
    concat_center_crop,
    upsample2x,
)
from .skip import Skip, dip_skip_128
from .unet import UNet
from .unet3d import UNet3D
from .resnet import ResNet
from .texture_nets import TextureNet
from .deep_decoder import DeepDecoder, ResDecoder
from .downsampler import Downsampler, get_kernel
from .lipschitz import ConvOperatorNorm, SNBatchNorm2d, SNConv2d
from .lipschitz_unet import LipschitzUNet
from .attention import (
    MultiHeadAttention,
    PositionwiseFeedForward,
    scaled_dot_product_attention,
    sinusoid_position_encoding,
)


def get_net(
    input_depth: int,
    net_type: str,
    pad: str = "zero",
    upsample_mode: str = "nearest",
    n_channels: int = 3,
    act_fun: str = "LeakyReLU",
    skip_n33d: int = 128,
    skip_n33u: int = 128,
    skip_n11: int = 4,
    num_scales: int = 5,
    downsample_mode: str = "stride",
):
    """String-keyed model factory with the DIP-standard defaults
    (reference ``models/__init__.py:8-32``).  ``input_depth`` is accepted
    for signature parity; flax infers input channels at init."""
    if net_type == "ResNet":
        return ResNet(num_output_channels=n_channels, num_blocks=10,
                      num_channels=16, act_fun=act_fun, pad=pad)
    if net_type == "skip":
        as_list = lambda v: [v] * num_scales if isinstance(v, int) else v
        return Skip(
            num_output_channels=n_channels,
            channels_down=tuple(as_list(skip_n33d)),
            channels_up=tuple(as_list(skip_n33u)),
            channels_skip=tuple(as_list(skip_n11)),
            upsample_mode=upsample_mode,
            downsample_mode=downsample_mode,
            act_fun=act_fun,
            pad=pad,
            need_sigmoid=True,
            need1x1_up=True,
        )
    if net_type == "texture_nets":
        return TextureNet(num_output_channels=n_channels, pad=pad, act_fun=act_fun)
    if net_type == "UNet":
        return UNet(num_output_channels=n_channels, feature_scale=4,
                    upsample_mode="bilinear", pad=pad, need_sigmoid=True)
    if net_type == "UNet3D":
        return UNet3D(num_output_channels=n_channels)
    if net_type == "deep_decoder":
        return DeepDecoder(num_output_channels=n_channels)
    if net_type == "res_decoder":
        return ResDecoder(num_output_channels=n_channels)
    if net_type == "lipschitz_unet":
        return LipschitzUNet(num_output_channels=n_channels, pad="reflection")
    if net_type == "identity":
        import flax.linen as nn

        class _Identity(nn.Module):
            @nn.compact
            def __call__(self, x):
                return x

        return _Identity()
    raise ValueError(f"unknown net_type {net_type!r}")


__all__ = [
    "get_net",
    "Skip",
    "dip_skip_128",
    "UNet",
    "UNet3D",
    "ResNet",
    "TextureNet",
    "DeepDecoder",
    "ResDecoder",
    "Downsampler",
    "get_kernel",
    "SNConv2d",
    "SNBatchNorm2d",
    "ConvOperatorNorm",
    "LipschitzUNet",
    "MultiHeadAttention",
    "PositionwiseFeedForward",
    "scaled_dot_product_attention",
    "sinusoid_position_encoding",
    "BatchNorm2d",
    "Conv2d",
    "GenNoise",
    "MeanOnlyBatchNorm",
    "activation",
    "concat_center_crop",
    "upsample2x",
]

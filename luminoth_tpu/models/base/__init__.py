from luminoth_tpu.models.base.base_network import (  # noqa: F401
    BaseNetworkTail,
    DEFAULT_ENDPOINTS,
    TruncatedBaseNetwork,
    VALID_ARCHITECTURES,
    subtract_channel_means,
)
from luminoth_tpu.models.base.resnet import ResNet, ResNetTail  # noqa: F401
from luminoth_tpu.models.base.vgg import VGG16  # noqa: F401

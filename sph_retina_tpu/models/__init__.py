from .resnet import ResNet
from .fpn import FPN
from .heads.retina_head import SphRetinaHead
from .single_stage import SphRetinaNet

__all__ = ["ResNet", "FPN", "SphRetinaHead", "SphRetinaNet"]

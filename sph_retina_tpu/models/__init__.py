from .resnet import ResNet, port_torchvision_weights
from .fpn import FPN
from .vgg import SSDVGG, SSDNeck
from .heads.retina_head import SphRetinaHead
from .single_stage import SphRetinaNet
from .fcos import SphFCOS, SphFCOSHead
from .ssd import SphSSD, SphSSDHead
from .faster_rcnn import SphFasterRCNN, SphRPNHead, Shared2FCBBoxHead

__all__ = [
    "ResNet", "port_torchvision_weights", "FPN", "SSDVGG", "SSDNeck",
    "SphRetinaHead", "SphRetinaNet", "SphFCOS", "SphFCOSHead",
    "SphSSD", "SphSSDHead", "SphFasterRCNN", "SphRPNHead",
    "Shared2FCBBoxHead",
]

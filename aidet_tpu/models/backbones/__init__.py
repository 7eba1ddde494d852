from .resnet import ResNet
from .resnext import ResNeXt
from .hrnet import HRNet
from .ssd_vgg import SSDVGG

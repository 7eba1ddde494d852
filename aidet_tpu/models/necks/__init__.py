from .fpn import FPN
from .hrfpn import HRFPN
from .bfp import BFP

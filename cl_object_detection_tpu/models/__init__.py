from .resnet import ResNetBackbone, DEPTH_LAYERS
from .retinanet import RetinaNet, create_retinanet
from .expand import expand_classifier

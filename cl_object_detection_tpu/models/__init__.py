from .resnet import ResNetBackbone, DEPTH_LAYERS
from .retinanet import RetinaNet, create_retinanet
from .expand import expand_classifier
from .convert import load_pretrained_backbone, load_reference_checkpoint

from .coco import CocoJson
from .dataset import ILDataset, ReplayDataset, BicDataset
from .transforms import resize_and_pad, normalize_image, hflip
from .loader import BatchLoader, Batch

from .losses import LossStatics, compute_losses, mas_penalty, classifier_similarity_loss
from .agem import AGem
from .bic import BicTrainer, BicParams, make_bic_correct, carve_bic_val_set
from .herding import HerdSampler
from .mas import compute_importance
from .pseudo_label import generate_pseudo_labels
from .weight_init import compute_similarity

from .mean_ap import average_precision, eval_map, tpfp_default
from .recall import eval_recalls
from .dota import dota_eval
from .class_names import get_classes, dataset_aliases

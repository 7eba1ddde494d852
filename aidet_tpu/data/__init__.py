from .coco import CocoDataset
from .dota import DOTADataset, DOTA_CLASSES
from .pipeline import (TrainPipeline, TestPipeline, collate_batch,
                       normalize_image)
from .tiling import tile_image, tile_coords, merge_patch_detections
from .builder import build_dataset, DATASETS

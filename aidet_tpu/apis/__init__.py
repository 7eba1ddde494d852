from .train import train_detector, set_random_seed
from .inference import init_detector, inference_detector
from .test import run_inference

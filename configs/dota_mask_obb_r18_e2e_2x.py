# 2x-schedule variant of the mask-obb e2e recipe (round-4 review
# item 8: de-starve the synthetic-devkit proxy — does the val/train
# gap narrow and the encoding-ordering margin grow with 2x epochs?)
_base_ = "dota_mask_obb_r18_e2e.py"
lr_config = dict(warmup_iters=200, step=(18, 22))
total_epochs = 24

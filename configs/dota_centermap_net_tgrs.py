# CenterMap-Net TGRS base recipe: semantic branch, no mask weights
# (parity: reference configs/dota/centermap_net_tgrs.py)
_base_ = "dota_centermap_net_tgrs_mask_weight_v4.py"
train_pipeline = dict(img_size=1024, max_gt=256, flip_ratio=0.5,
                      with_rbox=True, with_mask=True,
                      mask_type="centermap", with_semantic=True)

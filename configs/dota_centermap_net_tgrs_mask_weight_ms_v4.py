# TGRS V4 + multi-scale training (parity: reference
# configs/dota/centermap_net_tgrs_mask_weight_ms_V4.py)
_base_ = "dota_centermap_net_tgrs_mask_weight_v4.py"
train_pipeline = dict(img_size=1024, max_gt=256, flip_ratio=0.5,
                      with_rbox=True, with_mask=True,
                      mask_type="centermap", with_mask_weight=True,
                      with_semantic=True, with_heatmap_weight=True,
                      scale_range=(512, 1024))

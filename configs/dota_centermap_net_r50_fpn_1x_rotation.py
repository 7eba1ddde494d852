# CenterMapNet + 90-degree rotation aug
# (parity: reference configs/dota/dota_v009_centermap_net_r50_v1_train_rotation.py)
_base_ = "centermap_net_r50_fpn_1x.py"
train_pipeline = dict(rotate90_ratio=1.0)

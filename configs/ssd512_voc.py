# SSD512 on VOC (parity: reference configs/pascal_voc/ssd512_voc.py)
_base_ = "ssd300_voc.py"
model = dict(img_size=512, input_size=512,
             backbone=dict(input_size=512))

from . import boxes, rboxes

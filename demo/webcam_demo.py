"""Webcam demo (parity: reference demo/webcam_demo.py): live camera
loop over inference_detector with drawn detections."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--camera-id", type=int, default=0)
    p.add_argument("--score-thr", type=float, default=0.5)
    args = p.parse_args()

    import cv2
    import numpy as np

    from aidet_tpu.apis.inference import inference_detector, init_detector

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    camera = cv2.VideoCapture(args.camera_id)
    print("Press ESC or q to quit.")
    while True:
        ok, img = camera.read()
        if not ok:
            print("camera read failed")
            break
        results, raw = inference_detector(model, variables, img)
        for c, dets in enumerate(results):
            for x1, y1, x2, y2, s in dets:
                if s < args.score_thr:
                    continue
                cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)),
                              (0, 255, 0), 2)
                cv2.putText(img, f"{c}:{s:.2f}", (int(x1), int(y1) - 3),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0))
        cv2.imshow("aidet_tpu", img)
        key = cv2.waitKey(1) & 0xFF  # mask modifier/high bits (GTK/Qt)
        if key in (27, ord("q")):
            break


if __name__ == "__main__":
    main()

"""InstaBoost augmentation (parity: mmdet/datasets/pipelines/
instaboost.py — a thin wrapper over the external `instaboostfast`
package in the reference).

`instaboostfast` is not vendored in this image; constructing the
wrapper without it raises immediately with a clear message unless
`allow_identity=True` is passed explicitly (no silent degradation)."""

from __future__ import annotations

import warnings

_WARNED = False


class InstaBoost:
    def __init__(self, action_candidate=("normal", "horizontal", "skip"),
                 action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
                 theta=(-1, 1), color_prob=0.5, hflag=False,
                 aug_ratio=0.5, allow_identity=False, seed=0):
        self.aug_ratio = aug_ratio
        # own seeded stream like every other pipeline transform —
        # the global np.random would break run reproducibility
        import numpy as np
        self.rng = np.random.RandomState(seed)
        try:
            import instaboostfast as instaboost
            self._cfg = instaboost.InstaBoostConfig(
                action_candidate, action_prob, scale, dx, dy, theta,
                color_prob, hflag)
            self._instaboost = instaboost
        except ImportError as e:
            if not allow_identity:
                raise ImportError(
                    "InstaBoost requires the `instaboostfast` package; "
                    "install it, remove InstaBoost from the pipeline, "
                    "or pass allow_identity=True to opt into a no-op "
                    "stage") from e
            self._cfg = None
            self._instaboost = None

    def __call__(self, img, anns):
        global _WARNED
        if self._instaboost is None:
            if not _WARNED:
                warnings.warn("instaboostfast is not installed; "
                              "InstaBoost acts as identity "
                              "(allow_identity=True)")
                _WARNED = True
            return img, anns
        if self.rng.rand() < self.aug_ratio:
            anns, img = self._instaboost.get_new_data(
                anns, img, self._cfg, background=None)
        return img, anns

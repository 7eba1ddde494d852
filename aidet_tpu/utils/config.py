"""Python-file config loader with attribute access.

Replaces mmcv.Config.fromfile (used at tools/train.py:67 in the
reference): a config is a plain Python file whose module-level
variables become config entries; nested dicts get attribute access.
"""

from __future__ import annotations

import importlib.util
import os


class ConfigDict(dict):
    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v


def _wrap(obj):
    if isinstance(obj, dict):
        return ConfigDict({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(_wrap(v) for v in obj)
    return obj


class Config:
    """cfg = Config.fromfile('configs/faster_rcnn_r50_fpn.py')"""

    def __init__(self, cfg_dict: dict, filename: str | None = None):
        self._cfg = _wrap(cfg_dict)
        self.filename = filename

    @classmethod
    def fromfile(cls, path: str) -> "Config":
        path = os.path.abspath(path)
        spec = importlib.util.spec_from_file_location("_aidet_cfg", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        cfg = {k: v for k, v in vars(mod).items()
               if not k.startswith("__") and not callable(v)
               and not isinstance(v, type(importlib))}
        return cls(cfg, path)

    def __getattr__(self, k):
        if k.startswith("_") or k == "filename":
            raise AttributeError(k)
        try:
            return self._cfg[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __contains__(self, k):
        return k in self._cfg

    def get(self, k, default=None):
        return self._cfg.get(k, default)

    def keys(self):
        return self._cfg.keys()

    @property
    def text(self):
        if self.filename and os.path.exists(self.filename):
            with open(self.filename) as f:
                return f.read()
        return repr(self._cfg)

    def to_dict(self):
        return dict(self._cfg)

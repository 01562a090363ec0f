"""Model registry: pluggable denoisers / priors / detectors / parsers.

The reference hard-wires model choice in dicts (scripts/video_sample.py:73-75,
facelib/detection/__init__.py:25-48); here every model family registers under
a name so alternative priors (VQFR, RestoreFormer), detectors (RetinaFace,
YOLOv5-face) and parsers (ParseNet, BiSeNet) are first-class swappable
(SURVEY.md §7.4 requirement for rows #29-31, #34).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register_model(name: str):
    def deco(ctor):
        if name in _REGISTRY:
            raise ValueError(f"duplicate model name: {name}")
        _REGISTRY[name] = ctor
        return ctor

    return deco


def get_model(name: str, **kwargs):
    if name not in _REGISTRY:
        # lazily import model modules so registration side-effects run
        from . import sr3, adm, spynet, vsrpp  # noqa: F401

        try:
            from . import codeformer, retinaface, parsenet  # noqa: F401
        except ImportError:
            pass
        try:
            from . import vqfr, restoreformer, bisenet, yolov5face  # noqa: F401
        except ImportError:
            pass
        try:
            from . import amt, superslomo, davsr  # noqa: F401
        except ImportError:
            pass
    if name not in _REGISTRY:
        raise KeyError(f"unknown model: {name}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def list_models():
    get_model.__wrapped__ = None  # force nothing; imports happen in get_model
    try:
        get_model("__none__")
    except KeyError:
        pass
    return sorted(_REGISTRY)

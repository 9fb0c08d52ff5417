"""Import helpers for the torch reference implementation at /root/reference.

The reference is used ONLY as a numerical oracle in parity tests: we build its
modules with random torch-default weights, convert the state dict with our
converter, and compare activations.  Missing optional deps (easydict,
torchvision, xformers) are shimmed; xformers being absent makes the reference
fall back to its naive softmax attention, which is the exact math we compare
against.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _shim_easydict():
    if "easydict" in sys.modules:
        return
    mod = types.ModuleType("easydict")

    class EasyDict(dict):
        def __init__(self, d=None, **kwargs):
            super().__init__()
            if d:
                for k, v in d.items():
                    self[k] = v
            for k, v in kwargs.items():
                self[k] = v

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError as e:
                raise AttributeError(name) from e

        def __setattr__(self, name, value):
            self[name] = value

    mod.EasyDict = EasyDict
    sys.modules["easydict"] = mod


def _shim_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    transforms.Compose = Compose
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms


def import_reference():
    """Returns the reference ``video_depth_anything`` package (torch)."""
    _shim_easydict()
    _shim_torchvision()
    if REFERENCE_ROOT not in sys.path:
        # APPEND so the reference's top-level dirs (benchmark/, utils/) never
        # shadow our own packages; only names we don't define (the reference
        # video_depth_anything package, its utils) resolve from there
        sys.path.append(REFERENCE_ROOT)
    import video_depth_anything  # noqa: F401
    from video_depth_anything import dinov2, dpt_temporal  # noqa: F401
    return sys.modules["video_depth_anything"]

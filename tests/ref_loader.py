"""Test-only loader for the read-only PyTorch reference at /root/reference.

Used exclusively by parity tests: we run the reference modules (unmodified,
in place) to produce golden activations and compare our JAX implementation
against them.  Missing heavyweight deps (lightning, omegaconf, kornia, ...)
are stubbed just enough for the module graph to import — the stubs raise if
actually exercised.
"""

import sys
import types

REF = "/root/reference"


def _stub(name, **attrs):
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def install_reference():
    if REF in sys.path:
        return
    import torch
    import torch.nn as nn

    # pytorch_lightning: engines subclass LightningModule; parity tests only
    # instantiate network modules, so nn.Module suffices.
    pl = _stub("pytorch_lightning", LightningModule=nn.Module,
               Callback=object, Trainer=object)
    _stub("pytorch_lightning.loggers", WandbLogger=object)
    _stub("pytorch_lightning.callbacks", ModelCheckpoint=object,
          LearningRateMonitor=object, Callback=object)
    _stub("pytorch_lightning.utilities", rank_zero_only=lambda f: f)
    pl.loggers = sys.modules["pytorch_lightning.loggers"]

    class _OmegaConf:
        @staticmethod
        def to_container(x, *a, **k):
            return x

        @staticmethod
        def create(x=None, *a, **k):
            return x if x is not None else {}

        @staticmethod
        def merge(*xs):
            out = {}
            for x in xs:
                out.update(dict(x))
            return out

    _stub("omegaconf", ListConfig=list, DictConfig=dict, OmegaConf=_OmegaConf)

    def _unavailable(*a, **k):
        raise RuntimeError("stubbed test dependency was exercised")

    _stub("mediapy", write_image=_unavailable, write_video=_unavailable,
          read_video=_unavailable)
    k_tf = _stub("kornia.geometry.transform", resize=_unavailable)
    k_geo = _stub("kornia.geometry", transform=k_tf)
    k_enh = _stub("kornia.enhance", normalize=_unavailable)
    _stub("kornia", geometry=k_geo, enhance=k_enh)
    k_geo.transform = k_tf
    k_geo.transform.resize = _unavailable
    _stub("open_clip", create_model_and_transforms=_unavailable,
          create_model=_unavailable)
    _stub("wandb", Image=object, log=_unavailable)
    _stub("imwatermark", WatermarkEncoder=object)
    # pytorch3d: sgm/data/cam_utils.py imports renderer helpers at module
    # top; the fisheye624 parity tests only exercise the torch.jit functions
    p3_cams = _stub("pytorch3d.renderer.cameras",
                    look_at_view_transform=_unavailable)
    p3_ray = _stub("pytorch3d.renderer.implicit.raysampling",
                   _xy_to_ray_bundle=_unavailable)
    p3_impl = _stub("pytorch3d.renderer.implicit", raysampling=p3_ray)
    p3_rend = _stub("pytorch3d.renderer", PerspectiveCameras=object,
                    cameras=p3_cams, implicit=p3_impl,
                    look_at_view_transform=_unavailable)
    _stub("pytorch3d", renderer=p3_rend)

    sys.path.insert(0, REF)

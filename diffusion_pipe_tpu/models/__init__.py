"""Model plugins: Flax module definitions + per-model pipeline adapters.

The registry maps the reference's `model.type` config strings
(reference train.py:310-379 dispatch chain) to pipeline classes.
"""

from typing import Dict

_REGISTRY: Dict[str, type] = {}


def register_model(name: str, *aliases: str):
    def deco(cls):
        _REGISTRY[name] = cls
        for a in aliases:
            _REGISTRY[a] = cls
        return cls

    return deco


def get_model_class(name: str):
    # Import plugins lazily so `import diffusion_pipe_tpu.models` stays cheap.
    from . import auraflow  # noqa: F401
    from . import chroma  # noqa: F401
    from . import cosmos  # noqa: F401
    from . import cosmos_predict2  # noqa: F401
    from . import ernie_image  # noqa: F401
    from . import flux  # noqa: F401
    from . import flux2  # noqa: F401
    from . import hidream  # noqa: F401
    from . import hunyuan_image  # noqa: F401
    from . import ideogram4  # noqa: F401
    from . import krea2  # noqa: F401
    from . import hunyuan_video  # noqa: F401
    from . import hunyuan_video_15  # noqa: F401
    from . import ltx2  # noqa: F401
    from . import ltx_video  # noqa: F401
    from . import lumina_2  # noqa: F401
    from . import omnigen2  # noqa: F401
    from . import qwen_image  # noqa: F401
    from . import sd3  # noqa: F401
    from . import sdxl  # noqa: F401
    from . import wan  # noqa: F401
    from . import z_image  # noqa: F401
    if name not in _REGISTRY:
        raise NotImplementedError(f"model type {name!r} not implemented")
    return _REGISTRY[name]

"""Model registry: name -> Flax module constructor.

Generalizes the reference's string-keyed factory ``get_model`` (reference
``SOTAS/Lesions_Segment/YNet_2022.py:496-507``, which maps
``"unet" | "y_net_gen" | "y_net_gen_ffc"``) to the full 13-architecture zoo.
Constructors are registered lazily so importing the package does not pull in
every model file.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable

# name -> (module path relative to .models, attribute name)
_LAZY: dict[str, tuple[str, str]] = {}
# name -> constructor, for eagerly registered models
_EAGER: dict[str, Callable[..., Any]] = {}


def register_model(name: str, ctor: Callable[..., Any] | None = None):
    """Register a model constructor, usable as a decorator."""

    def wrap(fn: Callable[..., Any]):
        _EAGER[name] = fn
        return fn

    if ctor is not None:
        return wrap(ctor)
    return wrap


def register_lazy(name: str, module: str, attr: str) -> None:
    _LAZY[name] = (module, attr)


def list_models() -> list[str]:
    return sorted(set(_EAGER) | set(_LAZY))


def get_model(name: str, **kwargs: Any):
    """Build a model by registry name.

    Mirrors the reference factory semantics (``YNet_2022.py:496-507``): returns
    a constructed Flax module; unknown names raise ``ValueError`` listing the
    registry contents.
    """
    if name in _EAGER:
        return _EAGER[name](**kwargs)
    if name in _LAZY:
        module_path, attr = _LAZY[name]
        mod = importlib.import_module(
            f".models.{module_path}", package=__package__
        )
        ctor = getattr(mod, attr)
        _EAGER[name] = ctor
        return ctor(**kwargs)
    raise ValueError(
        f"Unknown model {name!r}. Available: {', '.join(list_models())}"
    )


# ---------------------------------------------------------------------------
# Zoo registration. Names follow the reference file/factory naming.
# ---------------------------------------------------------------------------
register_lazy("unet", "unet", "build_unet")
register_lazy("y_net_gen", "unet", "build_ynet")
register_lazy("y_net_gen_ffc", "unet", "build_ynet_ffc")
register_lazy("relaynet", "relaynet", "build_relaynet")
register_lazy("retifluidnet", "retifluidnet", "build_retifluidnet")
register_lazy("anogan", "anogan", "build_anogan")
register_lazy("edgeal", "edgeal", "build_edgeal")
register_lazy("bionet", "bionet", "build_bionet")
register_lazy("watnet", "watnet", "build_watnet")
register_lazy("lightreseg", "lightreseg", "build_lightreseg")
register_lazy("msnet", "msnet", "build_msnet")
register_lazy("m2snet", "msnet", "build_m2snet")
register_lazy("mgunet", "mgunet", "build_mgunet")
register_lazy("mgunet_2", "mgunet", "build_mgunet_2")
register_lazy("islam", "islam", "build_islam")
register_lazy("masood", "masood", "build_masood")
register_lazy("fouriernet", "fouriernet", "build_fouriernet")
register_lazy("sdnet", "sdnet.sdnet", "build_sdnet")

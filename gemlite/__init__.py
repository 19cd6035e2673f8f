# SPDX-License-Identifier: Apache-2.0
"""Drop-in import alias: ``import gemlite`` -> :mod:`gemlite_tpu`.

Code written against the reference package name (reference
gemlite/__init__.py exports GemLiteLinearTriton, helper, the config
statics, …) keeps working unchanged against the TPU framework:

    from gemlite import GemLiteLinear, DType
    from gemlite.helper import A16W4_HQQ_INT
    import gemlite.core

The public submodules are imported and registered in :data:`sys.modules`
under both names, so ``import gemlite.<sub>`` resolves to the SAME module
object as ``gemlite_tpu.<sub>`` (no duplicate instances; isinstance and
identity checks hold across the two names).
"""

import sys as _sys

import gemlite_tpu as _tpu
from gemlite_tpu import *  # noqa: F401,F403
from gemlite_tpu import (  # noqa: F401
    cache_config,
    load_config,
    reset_config,
)

__version__ = getattr(_tpu, "__version__", "0.0")

# eagerly import the public submodules so statement-form imports
# (``import gemlite.serving``) resolve through sys.modules below
from gemlite_tpu import (  # noqa: F401
    autograd as _sub_autograd,
    autotune as _sub_autotune,
    bitpack as _sub_bitpack,
    checkpoint as _sub_checkpoint,
    config as _sub_config,
    core as _sub_core,
    dtypes as _sub_dtypes,
    experimental as _sub_experimental,
    helper as _sub_helper,
    models as _sub_models,
    mx as _sub_mx,
    ops as _sub_ops,
    parallel as _sub_parallel,
    quant as _sub_quant,
    serving as _sub_serving,
    utils as _sub_utils,
)

# register every gemlite_tpu submodule under the alias name; NEVER touch
# sys.modules["gemlite"] itself (that would replace this alias module)
for _name, _mod in list(_sys.modules.items()):
    if _name.startswith("gemlite_tpu."):
        _sys.modules[__name__ + _name[len("gemlite_tpu"):]] = _mod


def __getattr__(name):
    # PEP 562 fallback for attributes added to gemlite_tpu later and for
    # submodules not eagerly imported above
    import importlib

    try:
        return getattr(_tpu, name)
    except AttributeError:
        pass
    try:
        mod = importlib.import_module(f"gemlite_tpu.{name}")
    except ModuleNotFoundError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}") from None
    _sys.modules[f"{__name__}.{name}"] = mod
    return mod

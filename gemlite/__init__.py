# SPDX-License-Identifier: Apache-2.0
"""Drop-in import alias: ``import gemlite`` -> :mod:`gemlite_tpu`.

Code written against the reference package name (reference
gemlite/__init__.py exports GemLiteLinearTriton, helper, the config
statics, …) keeps working unchanged against the TPU framework:

    from gemlite import GemLiteLinear, DType
    from gemlite.helper import A16W4_HQQ_INT
    import gemlite.core

Every public :mod:`gemlite_tpu` symbol and submodule is re-exported; the
submodule aliases are registered in :data:`sys.modules` so ``import
gemlite.core`` style imports resolve too.
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

# import gemlite.<sub> resolves to the gemlite_tpu submodule
for _name, _mod in list(_sys.modules.items()):
    if _name.startswith("gemlite_tpu.") or _name == "gemlite_tpu":
        _sys.modules[_name.replace("gemlite_tpu", __name__, 1)] = _mod

# submodules not yet imported at package-import time
def __getattr__(name):
    import importlib

    mod = importlib.import_module(f"gemlite_tpu.{name}")
    _sys.modules[f"{__name__}.{name}"] = mod
    return mod

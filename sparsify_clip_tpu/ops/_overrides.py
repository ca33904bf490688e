"""Trace-time module-flag overrides shared by the ops dispatchers.

The backend routers (attention_core, the fused loss dispatchers) read
module-global booleans; tests and exports flip them for the duration
of a trace with a ``with`` block.  One factory instead of N
copy-pasted ``__enter__``/``__exit__`` classes — any future change
(e.g. contextvars for thread-safety) lands in one place.
"""

from __future__ import annotations

import sys
from types import ModuleType
from typing import Union


def flag_override(module: Union[str, ModuleType], name: str, doc: str = ""):
    """Build a reentrant ``with``-block class that sets ``module.name``
    to True inside the block and restores the previous value on exit.

    The reading code must look the flag up as a module global at call
    time (plain ``NAME`` references in module functions do), so
    ``setattr`` on the module is visible immediately.
    """

    class _FlagOverride:
        def __enter__(self):
            mod = (
                sys.modules[module] if isinstance(module, str) else module
            )
            self._mod = mod
            self._prev = getattr(mod, name)
            setattr(mod, name, True)
            return self

        def __exit__(self, *exc):
            setattr(self._mod, name, self._prev)
            return False

    _FlagOverride.__name__ = f"override_{name.strip('_').lower()}"
    _FlagOverride.__doc__ = doc or (
        f"Trace-time override: sets ``{name}`` while the block is live."
    )
    return _FlagOverride

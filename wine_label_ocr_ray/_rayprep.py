"""Worker-side importability: register this package for cloudpickle
by-value serialization.

The driver (harness) owns ``ray.init`` and may run from any cwd; Ray
workers then cannot resolve ``wine_label_ocr_ray`` by name (the package
is not installed site-wide) and every stage callable would fail to
deserialize — observed as an infinite retry hang, not an error. With
by-value registration the code ships inside the pickled callables, so
no worker-side import is needed at all.

Idempotent; called lazily by every pipeline/query builder.
"""

from __future__ import annotations

import importlib
import pkgutil

_done = False


def ensure_serializable() -> None:
    global _done
    if _done:
        return
    import ray.cloudpickle as cp

    import wine_label_ocr_ray as pkg

    mods = [pkg]
    for info in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        mods.append(importlib.import_module(info.name))
    for mod in mods:
        try:
            cp.register_pickle_by_value(mod)
        except Exception:
            pass
    _done = True

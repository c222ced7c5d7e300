"""Make tenzir_ray stage callables shippable to Ray workers that don't
have the repo on their sys.path.

Ray pickles map_batches/map_groups callables with cloudpickle, which
serializes classes from installed modules BY REFERENCE — workers must then
``import tenzir_ray``, which fails when the driver was launched from
outside the repo (the repo isn't pip-installed in this environment).
Registering our modules for by-value serialization ships the class code
inside the task spec instead; any module that defines callables executed
inside Ray tasks/actors calls :func:`ship_by_value` on itself at import.
"""

from __future__ import annotations

import types


def ship_by_value(module: types.ModuleType) -> None:
    try:
        from ray import cloudpickle

        cloudpickle.register_pickle_by_value(module)
    except Exception:
        pass  # ray absent or too old — fall back to by-reference

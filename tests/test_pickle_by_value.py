"""Regression: every stage callable must survive cloudpickle AFTER
``__ray_entry__._make_workers_find_the_package()`` registered the whole
package for pickle-by-value.

Round-1 driver bench crashed because a module-level ``struct.Struct`` in
``stages/accumulate.py`` is unpicklable; by-reference pickling masked it
(only a module name ships), but by-value pickling serializes the whole
module namespace, so ANY unpicklable module global kills every Dataset
stage that references that module.  This test pickles each hot-path
callable and every package module in by-value mode so the next such
global is caught at test time instead of in the driver's bench run.
"""

from __future__ import annotations

import importlib
import pkgutil
import sys

import pytest


@pytest.fixture(scope="module")
def by_value_registration():
    """Import __ray_entry__ (which registers the package by-value) and
    yield; unregister afterwards so other tests see normal pickling."""
    import ray.cloudpickle as cp

    sys.path.insert(0, "/root/repo")
    import __ray_entry__  # noqa: F401  (module import runs registration)

    yield cp
    import osm_data_3d_tiles_ray as pkg

    for name, mod in list(sys.modules.items()):
        if name.startswith(pkg.__name__) and mod is not None:
            try:
                cp.unregister_pickle_by_value(mod)
            except Exception:
                pass


def test_every_package_module_pickles_by_value(by_value_registration):
    cp = by_value_registration
    import osm_data_3d_tiles_ray as pkg

    for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        mod = importlib.import_module(m.name)
        # Pickling the module object itself serializes its full global
        # namespace under by-value registration — exactly what Ray does
        # when a stage closure references the module.
        cp.loads(cp.dumps(mod))


def test_hot_stage_callables_pickle_by_value(by_value_registration):
    cp = by_value_registration
    from osm_data_3d_tiles_ray.stages.accumulate import (
        _merge_compact_group,
        _merge_tile_group,
        _partial_tile_geom_stats,
        compact_before_shuffle,
    )
    from osm_data_3d_tiles_ray.stages.assign import (
        _partial_tile_counts,
        candidate_tiles,
    )
    from osm_data_3d_tiles_ray.stages.build3d import Build3D
    from osm_data_3d_tiles_ray.stages.parse import parse_documents

    for fn in (
        parse_documents,
        candidate_tiles,
        _partial_tile_counts,
        compact_before_shuffle,
        _merge_compact_group,
        _merge_tile_group,
        _partial_tile_geom_stats,
        Build3D,
    ):
        cp.loads(cp.dumps(fn))


def test_query_callables_pickle_by_value(by_value_registration):
    cp = by_value_registration
    import __ray_entry__

    for name, fn in __ray_entry__.queries().items():
        cp.dumps(fn)

"""osm_data_3d_tiles_ray — a Ray-Data-native buildings→3D-tiles engine.

A from-scratch reimplementation of the query/data-processing semantics of
the reference repo ``TANK2003/osm-data-3d-tiles`` (a TypeScript MVT→b3dm
tileset generator), re-expressed Ray-Data-first:

* input is a Lance-style table of interleaved text+media documents
  (``doc_id:string, spans:list<struct<kind,text,media_ref,offset>>``);
* ``ray.data.Dataset`` + ``map_batches`` over zero-copy Arrow batches for
  all per-record work (span parse, param normalization, cell encoding);
* explicit ``groupby`` shuffles for building→tile ownership dedup
  (reference: ``src/unique-tile-per-building.ts``) and per-tile geometry
  accumulation (reference: ``src/build3dBuilding.ts:95-112``);
* actor pools for the stateful geometry-build stage (skeleton kernels,
  texture frame dict — reference: ``src/texturesLoader.ts``,
  ``seed-b3dm.ts:18-21``).

Pure-numpy geometry kernels live in :mod:`.geom` (no Ray coupling),
lookup tables in :mod:`.tables`, Dataset stages in :mod:`.stages`,
end-to-end pipelines in :mod:`.pipelines`.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions
are owned by the test fixture, ``bench.py`` and CLI entry points only.
"""

__version__ = "0.1.0"

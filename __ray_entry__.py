"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship documents→3D-tiles pipeline at sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2 + the training-data companions); ``oracle_sql()`` gives the
DuckDB-equivalent SQL.  Geo queries run over the deterministic synthetic
spans corpus mandated by FIXTURES.md (materialized idempotently under
/tmp/osm3d_synth — the driver's DuckDB reads it via ``read_parquet``);
text/ANN/event queries run over the driver's pre-registered views.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import functools
import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from osm_data_3d_tiles_ray.synth.generator import ensure_synth


def _make_workers_find_the_package() -> None:
    """Ray workers inherit neither driver ``sys.path`` edits nor late env
    changes, so if the driver imported this module from outside /root/repo
    the pool workers would fail to unpickle our stage callables.  Register
    the whole package for cloudpickle-by-value: the code ships inside the
    task/actor pickles and workers never import it."""
    try:
        import importlib
        import pkgutil

        import ray.cloudpickle as _cp

        import osm_data_3d_tiles_ray as _pkg

        for m in pkgutil.walk_packages(_pkg.__path__, _pkg.__name__ + "."):
            importlib.import_module(m.name)
        for name, mod in list(sys.modules.items()):
            if name.startswith("osm_data_3d_tiles_ray") and mod is not None:
                try:
                    _cp.register_pickle_by_value(mod)
                except Exception:
                    pass
    except Exception:
        pass  # best effort — irrelevant when the driver runs from /root/repo


_make_workers_find_the_package()

# Materialize the synthetic geo corpus for the driver's scales up front so
# oracle SQL can read it even if the oracle runs before the Ray query.
for _sf in (0.001, 0.01):
    ensure_synth(_sf)

_SYNTH_001 = str(ensure_synth(0.01))

from osm_data_3d_tiles_ray.pipelines.geo import HEX_S3 as _HEX_S3
from osm_data_3d_tiles_ray.pipelines.geo import HEX_TT as _HEX_TT

_W = "20037508.342789244"
_T = "(40075016.685578488 / 65536.0)"

_TILE_SQL = f"""
SELECT osm_id,
       CAST(FLOOR((minx + {_W}) / {_T}) AS INTEGER) AS tile_x,
       CAST(FLOOR(({_W} - maxy) / {_T}) AS INTEGER) AS tile_y,
       CAST(FLOOR((maxx + {_W}) / {_T}) AS INTEGER) AS tile_x1,
       CAST(FLOOR(({_W} - miny) / {_T}) AS INTEGER) AS tile_y1
FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
"""

# hand-derived parse results of the generator's color vocabulary
# (COLOR_VALUES in synth/generator.py) per the reference's ColorParser
# (/root/reference/src/building/color-parser.ts:157-189)
_COLOR_CASE = """CASE {col}
    WHEN 'red' THEN 16711680
    WHEN 'dark_red' THEN 9109504
    WHEN 'light blue' THEN 11393254
    WHEN '#ff0000' THEN 16711680
    WHEN '#a0B1c2' THEN 10531266
    WHEN 'Slate-Gray' THEN 7372944
    WHEN '#ff0000;blue' THEN 16711680
    WHEN 'yellowgreen' THEN 10145074
    ELSE NULL END"""


def _norm_params_sql() -> str:
    rc_case = _COLOR_CASE.format(col="roof_color")
    fc_case = _COLOR_CASE.format(col="color")
    return f"""
WITH b AS (SELECT * FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')),
t1 AS (
  SELECT *,
    COALESCE(building_type, '') = 'roof' AS is_roof,
    CASE roof_type
      WHEN 'flat' THEN 'flat' WHEN 'hipped' THEN 'hipped' WHEN 'gabled' THEN 'gabled'
      WHEN 'gambrel' THEN 'gambrel' WHEN 'pyramidal' THEN 'pyramidal'
      WHEN 'onion' THEN 'onion' WHEN 'dome' THEN 'dome' WHEN 'round' THEN 'round'
      WHEN 'skillion' THEN 'skillion' WHEN 'mansard' THEN 'mansard'
      WHEN 'quadruple_saltbox' THEN 'quadrupleSaltbox' WHEN 'saltbox' THEN 'saltbox'
      ELSE 'flat' END AS rtype,
    COALESCE(building_type, '~') NOT IN
      ('roof','stadium','houseboat','castle','greenhouse','storage_tank','silo',
       'ship','bridge','digester','water_tower','shed') AS supports_default,
    CASE roof_material
      WHEN 'tile' THEN 'tiles' WHEN 'tiles' THEN 'tiles' WHEN 'roof_tiles' THEN 'tiles'
      WHEN 'slate' THEN 'tiles' WHEN 'metal' THEN 'metal' WHEN 'metal_sheet' THEN 'metal'
      WHEN 'metal sheet' THEN 'metal' WHEN 'tin' THEN 'metal' WHEN 'copper' THEN 'metal'
      WHEN 'zinc' THEN 'metal' WHEN 'concrete' THEN 'concrete' WHEN 'asphalt' THEN 'concrete'
      WHEN 'eternit' THEN 'eternit' WHEN 'asbestos' THEN 'eternit' WHEN 'thatch' THEN 'thatch'
      WHEN 'grass' THEN 'grass' WHEN 'glass' THEN 'glass' WHEN 'tar_paper' THEN 'tar'
      ELSE 'default' END AS rmat0,
    {rc_case} AS rc_parsed,
    {fc_case} AS fc_parsed
  FROM b
),
t2 AS (
  SELECT *,
    ((NOT supports_default) OR rtype <> 'flat') AS no_default,
    CASE WHEN (rc_parsed IS NOT NULL OR ((NOT supports_default) OR rtype <> 'flat'))
              AND rmat0 = 'default'
         THEN 'concrete' ELSE rmat0 END AS rmat,
    CASE WHEN roof_levels <= 0 THEN CAST(0.6 AS DOUBLE)
         WHEN roof_levels IS NULL THEN (CASE WHEN rtype = 'flat' THEN 0.0 ELSE 1.0 END)
         ELSE roof_levels END AS rlevels
  FROM t1
),
t3 AS (
  SELECT *,
    COALESCE(rc_parsed,
      CASE rmat
        WHEN 'concrete' THEN 12303291
        WHEN 'metal' THEN (CASE WHEN roof_material = 'copper' THEN 10734269 ELSE 12833501 END)
        WHEN 'tiles' THEN (CASE WHEN roof_material = 'slate' THEN 9211031 ELSE 13335908 END)
        ELSE 16777215 END) AS rcolor,
    CASE WHEN height IS NOT NULL
         THEN LEAST(COALESCE(roof_height, rlevels * 4), height - COALESCE(min_height, 0))
         ELSE COALESCE(roof_height, rlevels * 4) END AS rh
  FROM t2
),
t4 AS (
  SELECT *,
    CASE WHEN height IS NULL AND levels IS NULL THEN COALESCE(min_level, 1.0)
         ELSE levels END AS levels1
  FROM t3
),
t5 AS (
  SELECT *, CASE WHEN height IS NULL THEN levels1 * 4 + rh ELSE height END AS height1
  FROM t4
),
t6 AS (
  SELECT *,
    CASE WHEN levels1 IS NULL
         THEN GREATEST(1.0, FLOOR((height1 - rh) / 4 + 0.5))
         ELSE levels1 END AS levels2
  FROM t5
),
t7 AS (
  SELECT *,
    COALESCE(min_level,
      CASE WHEN min_height IS NOT NULL
           THEN LEAST(levels2 - 1.0, FLOOR(min_height / 4 + 0.5))
           ELSE 0.0 END) AS minlev
  FROM t6
),
t8 AS (
  SELECT *, COALESCE(min_height, LEAST(minlev * 4, height1)) AS minh
  FROM t7
)
SELECT osm_id,
  CASE WHEN roof_orientation IN ('along', 'across') THEN roof_orientation
       ELSE NULL END AS roof_orientation,
  roof_direction,
  CAST(levels2 - minlev AS DOUBLE) AS building_levels,
  CAST(height1 AS DOUBLE) AS building_height,
  CAST(CASE WHEN is_roof THEN height1 - rh ELSE minh END AS DOUBLE) AS building_min_height,
  CAST(rh AS DOUBLE) AS building_roof_height,
  rtype AS roof_type,
  CASE material
    WHEN 'brick' THEN 'brick' WHEN 'cement_block' THEN 'cementBlock'
    WHEN 'block' THEN 'cementBlock' WHEN 'wood' THEN 'wood'
    WHEN 'plaster' THEN 'plaster' WHEN 'plastered' THEN 'plaster'
    WHEN 'concrete' THEN 'plaster' WHEN 'hard' THEN 'plaster'
    WHEN 'glass' THEN 'glass' WHEN 'mirror' THEN 'glass'
    ELSE 'plaster' END AS facade_material,
  CAST(COALESCE(fc_parsed,
    CASE material WHEN 'brick' THEN 9193524
                  WHEN 'concrete' THEN 14540253 WHEN 'hard' THEN 14540253
                  ELSE 16777215 END) AS BIGINT) AS facade_color,
  rmat AS roof_material,
  CAST(rcolor AS BIGINT) AS roof_color,
  CASE WHEN height1 - minh - rh < 2 THEN FALSE
       ELSE COALESCE(windows,
         COALESCE(building_type, '~') NOT IN
           ('garage','garages','greenhouse','storage_tank','bunker','silo','stadium',
            'ship','castle','service','digester','water_tower','shed','ger','barn',
            'slurry_tank','container','carport')) END AS windows,
  ((NOT is_roof) AND levels IS NULL AND min_level IS NULL
    AND height IS NULL AND min_height IS NULL) AS foundation
FROM t8
"""


def _jenkins_round_sql(a: str, pfx: str) -> tuple[str, str]:
    """SQL column chain for one vectorized Jenkins 32-bit avalanche round
    (geom/rng.py:jenkins_mix) over the uint32-valued BIGINT expression
    ``a`` — lateral alias references, every add/shift reduced mod 2^32 so
    DuckDB BIGINT arithmetic reproduces the numpy uint32 wraparound
    bit-for-bit.  Returns (select-list fragment, final alias)."""
    M = 4294967296
    cols = [
        f"({a} + {0x7ED55D16} + {a} * 4096) % {M} AS {pfx}1",
        f"xor(xor({pfx}1, {0xC761C23C}), {pfx}1 // 524288) AS {pfx}2",
        f"({pfx}2 + {0x165667B1} + {pfx}2 * 32) % {M} AS {pfx}3",
        f"xor(({pfx}3 + {0xD3A2646C}) % {M}, ({pfx}3 * 512) % {M}) AS {pfx}4",
        f"({pfx}4 + {0xFD7046C5} + {pfx}4 * 8) % {M} AS {pfx}5",
        f"xor(xor({pfx}5, {0xB55A4F09}), {pfx}5 // 65536) AS {pfx}6",
    ]
    return ", ".join(cols), f"{pfx}6"


_J1_COLS, _J1_OUT = _jenkins_round_sql("a0", "cb1_")
_J2_COLS, _J2_OUT = _jenkins_round_sql("a1", "cb2_")


def _jenkins_round_ctes(src: str, a: str, pfx: str, carry: str) -> tuple[str, str]:
    """The same avalanche round as ``_jenkins_round_sql`` but as SIX
    MATERIALIZED CTEs (one per step).  DuckDB re-inlines lateral alias
    references, so the single-SELECT form costs ~0.17 ms/row (the
    expression tree doubles at every xor) — fine for 10k-row streams,
    fatal for multi-million-row join results.  Materializing each step
    makes the chain linear.  Returns (cte text, final cte name); the
    final CTE carries ``carry`` columns plus ``{pfx}6``."""
    M = 4294967296
    steps = [
        f"({a} + {0x7ED55D16} + {a} * 4096) % {M}",
        f"xor(xor({pfx}1, {0xC761C23C}), {pfx}1 // 524288)",
        f"({pfx}2 + {0x165667B1} + {pfx}2 * 32) % {M}",
        f"xor(({pfx}3 + {0xD3A2646C}) % {M}, ({pfx}3 * 512) % {M})",
        f"({pfx}4 + {0xFD7046C5} + {pfx}4 * 8) % {M}",
        f"xor(xor({pfx}5, {0xB55A4F09}), {pfx}5 // 65536)",
    ]
    ctes, prev = [], src
    for i, expr in enumerate(steps, start=1):
        # each CTE reads the previous step's column and carries only the
        # passthrough columns + its own result forward
        ctes.append(
            f"{pfx}s{i} AS MATERIALIZED (SELECT {carry}, "
            f"{expr} AS {pfx}{i} FROM {prev})"
        )
        prev = f"{pfx}s{i}"
    return ",\n".join(ctes), prev


def _range_join_sample_sql(b: str, tag: int = 91, r: int = 500_000_000) -> str:
    """SQL mirror of sampling.range_join_sample at sf0.01: the band join
    bucketed exactly like the engine (3×3 stencil equi-join — DuckDB's
    raw IEJoin band plan takes minutes at 2.3M pairs), pair key
    ``a·1000003 + b``, keyed Jenkins chain as materialized CTE steps,
    keep rule ``h · 20 < 2^32``."""
    M = 4294967296
    tagmix = (tag * 2654435761) % M
    c1, last1 = _jenkins_round_ctes("r0", "a0", "ra_", "oa, ob, key")
    c2, last2 = _jenkins_round_ctes("r1", "a1", "rb_", "oa, ob")
    return f"""
WITH p AS (
  SELECT osm_id,
         CAST(FLOOR(centroid_x * 1000000 + 0.5) AS BIGINT) AS cx,
         CAST(FLOOR(centroid_y * 1000000 + 0.5) AS BIGINT) AS cy
  FROM {b}
), g AS (SELECT *, cx // {r} AS gx, cy // {r} AS gy FROM p),
q AS (SELECT g.*, gx + dx.d AS jx, gy + dy.d AS jy
      FROM g, (VALUES (-1), (0), (1)) dx(d), (VALUES (-1), (0), (1)) dy(d)),
pairs AS (
  SELECT a.osm_id AS oa, b.osm_id AS ob,
         a.osm_id * 1000003 + b.osm_id AS key
  FROM q a JOIN g b ON a.jx = b.gx AND a.jy = b.gy
  WHERE a.osm_id < b.osm_id
    AND b.cx >= a.cx - {r} AND b.cx <= a.cx + {r}
    AND b.cy >= a.cy - {r} AND b.cy <= a.cy + {r}
), r0 AS (SELECT oa, ob, key, xor(key % {M}, {tagmix}) AS a0 FROM pairs),
{c1},
r1 AS (SELECT oa, ob, xor(ra_6, (key // {M}) % {M}) AS a1 FROM {last1}),
{c2}
SELECT oa AS osm_id_a, ob AS osm_id_b, CAST(rb_6 AS BIGINT) AS h
FROM {last2} WHERE rb_6 * 20 < {M}
"""


def _weighted_join_sample_sql(tag: int = 73) -> str:
    """SQL mirror of sampling.weighted_join_sample: attribution-join
    tuples, pair key ``a·1000003 + b``, keyed Jenkins chain (materialized
    CTE steps), keep rule ``h · 5e8 < value_e6 · 2^32``."""
    M = 4294967296
    tagmix = (tag * 2654435761) % M
    c1, last1 = _jenkins_round_ctes("r0", "a0", "wa_", "a, b, v, key")
    c2, last2 = _jenkins_round_ctes("r1", "a1", "wb_", "a, b, v")
    return f"""
WITH e AS (SELECT * FROM events),
pairs AS (
  SELECT a.event_id AS a, b.event_id AS b,
         CAST(FLOOR(b.value * 1000000 + 0.5) AS BIGINT) AS v,
         a.event_id * 1000003 + b.event_id AS key
  FROM e a JOIN e b
    ON b.user_id = a.user_id
   AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts < a.ts
  WHERE a.event_type = 'purchase'
), r0 AS (SELECT a, b, v, key, xor(key % {M}, {tagmix}) AS a0 FROM pairs),
{c1},
r1 AS (SELECT a, b, v, xor(wa_6, (key // {M}) % {M}) AS a1 FROM {last1}),
{c2}
SELECT a AS event_id, b AS prior_event_id, v AS value_micro,
       CAST(wb_6 AS BIGINT) AS h
FROM {last2} WHERE wb_6 * 500000000 < v * {M}
"""


def _reservoir_sample_sql(k: int = 100, tag: int = 57) -> str:
    """SQL mirror of sampling.reservoir_sample: the keyed-Jenkins
    priority (geom/rng.py:keyed_uniform's two avalanche rounds, BIGINT
    mod-2^32 wraparound) over doc_id, smallest-``k`` with (h, doc_id)
    tie order."""
    M = 4294967296
    tagmix = (tag * 2654435761) % M
    c1, o1 = _jenkins_round_sql("a0", "rv1_")
    c2, o2 = _jenkins_round_sql("a1", "rv2_")
    return f"""
SELECT doc_id, CAST({o2} AS BIGINT) AS h FROM (
  SELECT doc_id, xor(doc_id % {M}, {tagmix}) AS a0, {c1},
         xor({o1}, (doc_id // {M}) % {M}) AS a1, {c2}
  FROM documents
) ORDER BY h, doc_id LIMIT {k}
"""


def _domain_mix_sql() -> str:
    """SQL mirror of corpus_stats.domain_mix: per-topic word-boundary
    regex hit counts (same RE2 patterns), argmax with first-listed tie
    break as a CASE chain, 'other' on zero hits."""
    from osm_data_3d_tiles_ray.pipelines.corpus_stats import _DOMAIN_TAXONOMY

    hit_cols = []
    for topic, kws in _DOMAIN_TAXONOMY:
        terms = " + ".join(
            f"len(regexp_extract_all(text, '\\b{kw}\\b'))" for kw in kws
        )
        hit_cols.append(f"CAST({terms} AS BIGINT) AS {topic}_hits")
    names = [t for t, _ in _DOMAIN_TAXONOMY]
    # argmax, first-listed wins ties: topic i wins iff its count >= every
    # LATER topic's count and no EARLIER topic already won
    cases = []
    for i, t in enumerate(names[:-1]):
        conds = " AND ".join(f"{t}_hits >= {u}_hits" for u in names[i + 1 :])
        cases.append(f"WHEN {conds} THEN '{t}'")
    case_sql = (
        f"CASE WHEN greatest({', '.join(n + '_hits' for n in names)}) = 0 "
        f"THEN 'other' {' '.join(cases)} ELSE '{names[-1]}' END"
    )
    return f"""
WITH h AS (
  SELECT source, {', '.join(hit_cols)},
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tokens
  FROM documents
), t AS (
  SELECT source, tokens, {case_sql} AS topic FROM h
)
SELECT source, topic, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tokens) AS BIGINT) AS n_tokens
FROM t GROUP BY 1, 2
"""


def _distance_bands_sql() -> str:
    """SQL mirror of geo.q_distance_bands: the identical Gudermannian +
    haversine expression chain with the landmark lon/lat/cos embedded as
    the SAME Python-computed literals, floor-to-centimeters, 2 km integer
    bands."""
    from osm_data_3d_tiles_ray.pipelines.geo import _BAND_CM, _landmark_lonlat

    lon0, lat0, coslat0 = _landmark_lonlat()
    return f"""
WITH ll AS (
  SELECT centroid_x / {_W} * PI() AS lon,
         2 * ATAN(EXP(centroid_y / {_W} * PI())) - PI() / 2 AS lat
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
), d AS (
  SELECT CAST(FLOOR(2.0 * 6371000.0 * ASIN(SQRT(
           SIN((lat - {lat0!r}) / 2.0) * SIN((lat - {lat0!r}) / 2.0)
         + {coslat0!r} * COS(lat) * SIN((lon - {lon0!r}) / 2.0)
                                  * SIN((lon - {lon0!r}) / 2.0)
         )) * 100.0 + 0.5) AS BIGINT) AS d_cm
  FROM ll
)
SELECT d_cm // {_BAND_CM} AS band, CAST(COUNT(*) AS BIGINT) AS n_buildings,
       CAST(SUM(d_cm) AS BIGINT) AS sum_dist_cm
FROM d GROUP BY 1
"""


def _rfm_sql() -> str:
    """SQL mirror of mining.rfm_segments (exact tercile thresholds with
    the ceil-rank integer rule on each metric)."""

    def th(col: str, q: int) -> str:
        return (
            f"(SELECT MIN(v) FROM (SELECT {col} AS v, "
            f"SUM(CAST(1 AS BIGINT)) OVER (ORDER BY {col}) AS cum FROM u) x, n "
            f"WHERE cum >= ({q} * n.n + 99) // 100)"
        )

    def bucket(col: str, lo: str, hi: str) -> str:
        return (
            f"CASE WHEN {col} <= th.{lo} THEN 1 "
            f"WHEN {col} <= th.{hi} THEN 2 ELSE 3 END"
        )

    rb = bucket("recency_us", "r33", "r67")
    fb = bucket("frequency", "f33", "f67")
    mb = bucket("monetary_cent", "m33", "m67")
    return f"""
WITH u AS (
  SELECT o_custkey AS c_custkey,
         CAST(EPOCH_US(MAX(o_orderdate)) AS BIGINT) AS recency_us,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS monetary_cent
  FROM orders GROUP BY 1
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
th AS (
  SELECT {th('recency_us', 33)} AS r33, {th('recency_us', 67)} AS r67,
         {th('frequency', 33)} AS f33, {th('frequency', 67)} AS f67,
         {th('monetary_cent', 33)} AS m33, {th('monetary_cent', 67)} AS m67
)
SELECT u.c_custkey, u.recency_us, u.frequency, u.monetary_cent,
       CAST({rb} AS BIGINT) AS r_bucket,
       CAST({fb} AS BIGINT) AS f_bucket,
       CAST({mb} AS BIGINT) AS m_bucket,
       CAST({rb} * 100 + {fb} * 10 + {mb} AS BIGINT) AS rfm_code
FROM u, th
"""


def _pps_sample_sql(tag: int = 41) -> str:
    """SQL mirror of diagnostics.pps_sample: keyed_uniform(event_id, tag)
    (two chained Jenkins rounds) with the pure-integer keep rule
    ``h · 5e8 < value_micro · 2^32`` (probability = value / 500)."""
    M = 4294967296
    tagmix = (tag * 2654435761) % M
    j1c, j1o = _jenkins_round_sql("a0", "pp1_")
    j2c, j2o = _jenkins_round_sql("a1", "pp2_")
    return f"""
WITH r AS (
  SELECT event_id, user_id,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS value_micro,
         xor(event_id % {M}, {tagmix}) AS a0
  FROM events
), j1 AS (SELECT *, {j1c} FROM r),
j2 AS (
  SELECT event_id, user_id, value_micro,
         xor({j1o}, (event_id // {M}) % {M}) AS a1
  FROM j1
), j3 AS (SELECT *, {j2c} FROM j2)
SELECT event_id, user_id, value_micro, CAST({j2o} AS BIGINT) AS h
FROM j3 WHERE {j2o} * 500000000 < value_micro * {M}
"""


def _lod_sample_sql() -> str:
    """SQL mirror of geo.q_lod_sample: the keep rule is a pure integer
    function of (osm_id, subcell) — Jenkins hash u < 0.25 ⟺ h < 2^30
    (exact: h/2^32 is a power-of-two division), plus the min-(u, osm_id)
    row per 12×12 sub-cell."""
    M = 4294967296
    tagmix = (77 * 2654435761) % M
    mix1, h1 = _jenkins_round_sql("a0", "j")
    mix2, h2 = _jenkins_round_sql("a1", "k")
    return f"""
WITH b AS (SELECT osm_id, centroid_x, centroid_y
           FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')),
g AS (
  SELECT osm_id,
    LEAST(GREATEST(CAST(FLOOR((centroid_x + {_W}) / {_T}) AS BIGINT), 0), 65535) AS tx,
    LEAST(GREATEST(CAST(FLOOR(({_W} - centroid_y) / {_T}) AS BIGINT), 0), 65535) AS ty,
    (centroid_x + {_W}) / {_T} AS fx0,
    ({_W} - centroid_y) / {_T} AS fy0
  FROM b
),
gg AS (
  SELECT osm_id, tx, ty,
    LEAST(CAST(FLOOR((fx0 - FLOOR(fx0)) * 12) AS BIGINT), 11) AS gx,
    LEAST(CAST(FLOOR((fy0 - FLOOR(fy0)) * 12) AS BIGINT), 11) AS gy
  FROM g
), r AS (
  SELECT osm_id, (tx * 1048576 + ty) * 144 + gx * 12 + gy AS subcell,
         xor(osm_id % {M}, {tagmix}) AS a0
  FROM gg
),
m1 AS (SELECT osm_id, subcell, {mix1} FROM r),
m1b AS (SELECT osm_id, subcell, xor({h1}, (osm_id // {M}) % {M}) AS a1 FROM m1),
m2 AS (SELECT osm_id, subcell, {mix2} FROM m1b),
s AS (
  SELECT osm_id, subcell, {h2} AS hh,
         row_number() OVER (PARTITION BY subcell ORDER BY {h2}, osm_id) AS rn
  FROM m2
)
SELECT osm_id, subcell FROM s WHERE hh < 1073741824 OR rn = 1
"""


def _point_in_polygon_sql() -> str:
    """SQL mirror of geo.q_point_in_polygon: bbox prefilter, then the
    identical ray-cast (geom/rings.py:point_in_ring — same IEEE-double
    expression ((x2-x1)*(py-y1))/(y2-y1)+x1, odd crossings) per ring;
    inside ⟺ in outer ring and in no hole ring."""
    b = f"read_parquet('{_SYNTH_001}/buildings/*.parquet')"
    qp = f"read_parquet('{_SYNTH_001}/query_points.parquet')"
    return f"""
WITH cand AS (
  SELECT q.qid, q.x AS px, q.y AS py, b.osm_id, b.coords, b.ring_offsets,
         CAST(len(b.coords) // 2 AS BIGINT) AS nv
  FROM {qp} q JOIN {b} b
    ON q.x >= b.minx AND q.x <= b.maxx AND q.y >= b.miny AND q.y <= b.maxy
),
rings AS (
  SELECT qid, px, py, osm_id, coords, nv, ring_offsets,
         unnest(range(0, len(ring_offsets))) AS ri
  FROM cand
),
spans AS (
  SELECT qid, px, py, osm_id, coords, ri,
         CAST(ring_offsets[ri + 1] AS BIGINT) AS s,
         CAST(CASE WHEN ri + 1 < len(ring_offsets)
                   THEN ring_offsets[ri + 2] ELSE nv END AS BIGINT) AS e
  FROM rings
),
edges AS (
  SELECT qid, px, py, osm_id, ri, coords, s, e, unnest(range(s, e)) AS j
  FROM spans
),
xy AS (
  SELECT qid, px, py, osm_id, ri,
         coords[2 * j + 1] AS x1, coords[2 * j + 2] AS y1,
         coords[2 * (s + ((j - s + 1) % (e - s))) + 1] AS x2,
         coords[2 * (s + ((j - s + 1) % (e - s))) + 2] AS y2
  FROM edges
),
hits AS (
  SELECT qid, osm_id, ri,
         SUM(CASE WHEN (y1 > py) <> (y2 > py)
                  THEN CASE WHEN px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
                            THEN 1 ELSE 0 END
                  ELSE 0 END) AS nhit
  FROM xy GROUP BY qid, osm_id, ri
),
inr AS (SELECT qid, osm_id, ri, (nhit % 2 = 1) AS inside FROM hits)
SELECT qid, osm_id FROM inr
GROUP BY qid, osm_id
HAVING BOOL_OR(ri = 0 AND inside) AND NOT BOOL_OR(ri > 0 AND inside)
"""


def _cell_cover_exact_sql() -> str:
    """SQL mirror of geo.q_cell_cover_exact (G18 DDA cover, 64-m grid).

    The engine rasterizes the earcut triangulation (edge DDA + per-row
    scanline fill, geom/raster.py).  For the synthetic corpus both rings
    are CONVEX (regular polygons on an ellipse, synth/generator.py:210),
    so the union of per-triangle row fills is exactly:

        per row: [min outer-edge cell, max outer-edge cell]
        minus hole-interior cells no hole edge passes through
              (= (hole row max - min + 1) - #visited hole cells that row)

    DDA-visited cells of a segment within one grid row are the contiguous
    range [floor(x at row entry), floor(x at row exit)] (Amanatides-Woo),
    which the closed form below reproduces with the identical IEEE-double
    cell coordinates ((x + W) / 64 — division by a power of two is exact).
    Tie cases (a vertex or crossing exactly on a grid line) are the only
    possible divergence and do not occur with the generator's floats."""
    b = f"read_parquet('{_SYNTH_001}/buildings/*.parquet')"
    return f"""
WITH b AS (SELECT osm_id, coords, ring_offsets,
                  CAST(len(coords) // 2 AS BIGINT) AS nv FROM {b}),
rings AS (
  SELECT osm_id, coords, nv, ring_offsets,
         unnest(range(0, len(ring_offsets))) AS ri
  FROM b
),
spans AS (
  SELECT osm_id, coords, ri,
         CAST(ring_offsets[ri + 1] AS BIGINT) AS s,
         CAST(CASE WHEN ri + 1 < len(ring_offsets)
                   THEN ring_offsets[ri + 2] ELSE nv END AS BIGINT) AS e
  FROM rings
),
edges AS (
  SELECT osm_id, ri, coords, s, e, unnest(range(s, e)) AS j
  FROM spans
),
xy AS (
  SELECT osm_id, ri,
         (coords[2 * j + 1] + {_W}) / 64.0 AS x1c,
         (coords[2 * j + 2] + {_W}) / 64.0 AS y1c,
         (coords[2 * (s + ((j - s + 1) % (e - s))) + 1] + {_W}) / 64.0 AS x2c,
         (coords[2 * (s + ((j - s + 1) % (e - s))) + 2] + {_W}) / 64.0 AS y2c
  FROM edges
),
bands AS (
  SELECT osm_id, ri, x1c, y1c, x2c, y2c,
         unnest(range(CAST(FLOOR(LEAST(y1c, y2c)) AS BIGINT),
                      CAST(FLOOR(GREATEST(y1c, y2c)) AS BIGINT) + 1)) AS yy
  FROM xy
),
xr AS (
  SELECT osm_id, ri, yy,
    CAST(FLOOR(LEAST(x1c + ta * (x2c - x1c), x1c + tb * (x2c - x1c))) AS BIGINT) AS lo,
    CAST(FLOOR(GREATEST(x1c + ta * (x2c - x1c), x1c + tb * (x2c - x1c))) AS BIGINT) AS hi
  FROM (
    SELECT *,
      CASE WHEN y2c = y1c THEN 0.0
           ELSE GREATEST(0.0, LEAST(1.0, (yy - y1c) / (y2c - y1c))) END AS ta,
      CASE WHEN y2c = y1c THEN 1.0
           ELSE GREATEST(0.0, LEAST(1.0, (yy + 1 - y1c) / (y2c - y1c))) END AS tb
    FROM bands
  )
),
outer_rows AS (
  SELECT osm_id, yy, MIN(lo) AS omn, MAX(hi) AS omx
  FROM xr WHERE ri = 0 GROUP BY 1, 2
),
hole_cells AS (
  SELECT DISTINCT osm_id, ri, yy, xx
  FROM (SELECT osm_id, ri, yy, unnest(range(lo, hi + 1)) AS xx
        FROM xr WHERE ri > 0)
),
hole_rows AS (
  SELECT osm_id, ri, yy, MIN(xx) AS hmn, MAX(xx) AS hmx,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM hole_cells GROUP BY 1, 2, 3
),
hole_excl AS (
  SELECT osm_id, CAST(SUM(hmx - hmn + 1 - cnt) AS BIGINT) AS excl
  FROM hole_rows GROUP BY 1
),
outer_cnt AS (
  SELECT osm_id, CAST(SUM(omx - omn + 1) AS BIGINT) AS n FROM outer_rows GROUP BY 1
)
SELECT o.osm_id, CAST(o.n - COALESCE(h.excl, 0) AS BIGINT) AS n_cells_exact
FROM outer_cnt o LEFT JOIN hole_excl h USING (osm_id)
"""


def _sample_points_sql() -> str:
    """SQL mirror of geo.q_sample_points (G19): the jittered sampling grid
    rebuilt cell-exactly — arange length/values via the identical float
    expressions, the per-point jitter via the two-round keyed Jenkins
    chain (geom/rng.py:keyed_uniform ≡ chained _jenkins_round_sql), and
    the strict ray-cast PIP of the point_in_polygon oracle, point paired
    with ITS building only."""
    M = 4294967296
    tag11 = (11 * 2654435761) % M
    tag13 = (13 * 2654435761) % M
    mix_a, h_a = _jenkins_round_sql("a0", "ja")
    mix_b, h_b = _jenkins_round_sql("b0", "jb")
    mix_c, h_c = _jenkins_round_sql("c0", "ka")
    mix_d, h_d = _jenkins_round_sql("d0", "kb")
    b = f"read_parquet('{_SYNTH_001}/buildings/*.parquet')"
    return f"""
WITH g AS (
  SELECT osm_id, coords, ring_offsets, minx, miny, maxx, maxy,
    CAST(CASE WHEN minx + 3.0 < maxx
              THEN CEIL((maxx - (minx + 3.0)) / 6.0) ELSE 0 END AS BIGINT) AS nx,
    CAST(CASE WHEN miny + 3.0 < maxy
              THEN CEIL((maxy - (miny + 3.0)) / 6.0) ELSE 0 END AS BIGINT) AS ny
  FROM {b}
),
p AS (
  SELECT osm_id, coords, ring_offsets, minx, miny, nx,
         unnest(range(0, nx * ny)) AS pidx
  FROM g WHERE nx > 0 AND ny > 0
),
x0s AS (
  SELECT osm_id, coords, ring_offsets, pidx,
         (minx + 3.0) + (pidx % nx) * 6.0 AS gx0,
         (miny + 3.0) + (pidx // nx) * 6.0 AS gy0,
         osm_id * 1000003 + pidx AS keyv
  FROM p
),
s0 AS (SELECT *, xor(keyv % {M}, {tag11}) AS a0 FROM x0s),
s1 AS (SELECT osm_id, coords, ring_offsets, pidx, gx0, gy0, keyv, {mix_a} FROM s0),
s2 AS (SELECT osm_id, coords, ring_offsets, pidx, gx0, gy0, keyv,
              xor({h_a}, (keyv // {M}) % {M}) AS b0 FROM s1),
s3 AS (SELECT osm_id, coords, ring_offsets, pidx, gx0, gy0, keyv, {mix_b} FROM s2),
s4 AS (SELECT osm_id, coords, ring_offsets, pidx, gx0, gy0, keyv,
              {h_b} / 4294967296.0 AS u11 FROM s3),
t0 AS (SELECT *, xor(keyv % {M}, {tag13}) AS c0 FROM s4),
t1 AS (SELECT osm_id, coords, ring_offsets, pidx, gx0, gy0, keyv, u11, {mix_c} FROM t0),
t2 AS (SELECT osm_id, coords, ring_offsets, pidx, gx0, gy0, u11,
              xor({h_c}, (keyv // {M}) % {M}) AS d0 FROM t1),
t3 AS (SELECT osm_id, coords, ring_offsets, pidx, gx0, gy0, u11, {mix_d} FROM t2),
pts AS (
  SELECT osm_id, coords, ring_offsets, pidx,
         gx0 + ((u11 - 0.5) * 0.4) * 6.0 AS px,
         gy0 + (({h_d} / 4294967296.0 - 0.5) * 0.4) * 6.0 AS py,
         CAST(len(coords) // 2 AS BIGINT) AS nv
  FROM t3
),
rings AS (
  SELECT osm_id, pidx, px, py, coords, nv, ring_offsets,
         unnest(range(0, len(ring_offsets))) AS ri
  FROM pts
),
spans AS (
  SELECT osm_id, pidx, px, py, coords, ri,
         CAST(ring_offsets[ri + 1] AS BIGINT) AS s,
         CAST(CASE WHEN ri + 1 < len(ring_offsets)
                   THEN ring_offsets[ri + 2] ELSE nv END AS BIGINT) AS e
  FROM rings
),
edges AS (
  SELECT osm_id, pidx, px, py, coords, ri, s, e, unnest(range(s, e)) AS j
  FROM spans
),
xy AS (
  SELECT osm_id, pidx, px, py, ri,
         coords[2 * j + 1] AS x1, coords[2 * j + 2] AS y1,
         coords[2 * (s + ((j - s + 1) % (e - s))) + 1] AS x2,
         coords[2 * (s + ((j - s + 1) % (e - s))) + 2] AS y2
  FROM edges
),
hits AS (
  SELECT osm_id, pidx, ri,
         SUM(CASE WHEN (y1 > py) <> (y2 > py)
                  THEN CASE WHEN px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
                            THEN 1 ELSE 0 END
                  ELSE 0 END) AS nhit
  FROM xy GROUP BY 1, 2, 3
),
inr AS (SELECT osm_id, pidx, ri, (nhit % 2 = 1) AS inside FROM hits),
ok AS (
  SELECT osm_id, pidx FROM inr
  GROUP BY 1, 2
  HAVING BOOL_OR(ri = 0 AND inside) AND NOT BOOL_OR(ri > 0 AND inside)
),
cnt AS (SELECT osm_id, CAST(COUNT(*) AS BIGINT) AS np FROM ok GROUP BY 1)
SELECT bb.osm_id, CAST(COALESCE(cnt.np, 0) AS BIGINT) AS n_points
FROM {b} bb LEFT JOIN cnt USING (osm_id)
"""


def _random_projection_sql() -> str:
    """SQL mirror of ann.random_projection: the ±1 sign matrix is bit 0 of
    one Jenkins avalanche round over ``d*k + j`` (geom/rng.py:jenkins_mix
    ≡ _jenkins_round_sql), so DuckDB derives the identical matrix."""
    mix, h = _jenkins_round_sql("a0", "m")
    return f"""
WITH u AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         unnest(range(0, len(embedding))) AS d
  FROM embeddings
),
s0 AS (
  SELECT CAST(dd.d AS BIGINT) AS d, CAST(t2.range AS BIGINT) AS jj,
         CAST(dd.d * 16 + t2.range AS BIGINT) AS a0
  FROM (SELECT DISTINCT d FROM u) dd CROSS JOIN range(0, 16) t2
),
s1 AS (SELECT d, jj, {mix} FROM s0),
s AS (SELECT d, jj,
             CASE WHEN {h} % 2 = 0 THEN 1.0 ELSE -1.0 END AS sign
      FROM s1)
SELECT u.vec_id, CAST(s.jj AS BIGINT) AS j,
       CAST(FLOOR(SUM(u.v * s.sign) * 0.25 * 1000000 + 0.5) AS BIGINT) AS y_e6
FROM u JOIN s USING (d)
GROUP BY 1, 2
"""


def entry() -> Any:
    """Flagship pipeline at sf0.001: documents (spans) → parse → per-building
    3D geometry (actor pool: walls + roof dispatch) → per-tile stats
    (batch_length, vertex counts, bbox union)."""
    import ray.data

    from osm_data_3d_tiles_ray.pipelines.buildings import geometry_stats

    root = ensure_synth(0.001)
    docs = ray.data.read_parquet(str(root / "documents"))
    return geometry_stats(docs)


def _s2_ij_sql(src: str, level: int) -> str:
    """CTE chunk: rows of (osm_id, px, py) EPSG:3857 → (osm_id, face, i, j)
    at ``level`` — mirrors ``geom/s2.py:s2_cell_from_mercator`` expression
    by expression (Gudermannian lat, cube-face CASE with the same x≥y≥z
    tie order, quadratic ST warp, floor-then-clamp)."""
    n = 1 << level
    return f"""
ll AS (
  SELECT osm_id, px / {_W} * PI() AS lon,
         2 * ATAN(EXP(py / {_W} * PI())) - PI() / 2 AS lat
  FROM {src}
), sph AS (
  SELECT osm_id, COS(lat) * COS(lon) AS x, COS(lat) * SIN(lon) AS y,
         SIN(lat) AS z
  FROM ll
), fc AS (
  SELECT osm_id, x, y, z,
         CASE WHEN ABS(x) >= ABS(y) AND ABS(x) >= ABS(z)
                THEN CASE WHEN x > 0 THEN 0 ELSE 3 END
              WHEN ABS(y) >= ABS(z)
                THEN CASE WHEN y > 0 THEN 1 ELSE 4 END
              ELSE CASE WHEN z > 0 THEN 2 ELSE 5 END END AS face
  FROM sph
), fuv AS (
  SELECT osm_id, face,
         CASE face WHEN 0 THEN y / x WHEN 1 THEN -x / y WHEN 2 THEN -x / z
                   WHEN 3 THEN z / x WHEN 4 THEN z / y ELSE -y / z END AS u,
         CASE face WHEN 0 THEN z / x WHEN 1 THEN z / y WHEN 2 THEN -y / z
                   WHEN 3 THEN y / x WHEN 4 THEN -x / y ELSE -x / z END AS v
  FROM fc
), st AS (
  SELECT osm_id, face,
         CASE WHEN u >= 0 THEN 0.5 * SQRT(1 + 3 * u)
              ELSE 1 - 0.5 * SQRT(1 - 3 * u) END AS s,
         CASE WHEN v >= 0 THEN 0.5 * SQRT(1 + 3 * v)
              ELSE 1 - 0.5 * SQRT(1 - 3 * v) END AS t
  FROM fuv
), ij AS (
  SELECT osm_id, CAST(face AS BIGINT) AS face,
         CAST(LEAST(GREATEST(FLOOR(s * {n}.0), 0), {n - 1}) AS BIGINT) AS i,
         CAST(LEAST(GREATEST(FLOOR(t * {n}.0), 0), {n - 1}) AS BIGINT) AS j
  FROM st
)"""


def _hilbert_sql(src: str, level: int) -> str:
    """Recursive-CTE Hilbert xy2d over rows (osm_id, face, i, j) — the
    mod-s reflect/rotate recurrence, integer-identical to
    ``geom/s2.py:hilbert_xy2d`` (and to its vectorized numpy loop)."""
    s0 = 1 << (level - 1)
    return f"""
h AS (
  SELECT osm_id, face, i, j, i AS x, j AS y,
         CAST(0 AS BIGINT) AS d, CAST({s0} AS BIGINT) AS s
  FROM {src}
  UNION ALL
  SELECT osm_id, face, i, j,
         CASE WHEN (y & s) = 0
              THEN (CASE WHEN (x & s) > 0 THEN s - 1 - (y % s) ELSE (y % s) END)
              ELSE (x % s) END,
         CASE WHEN (y & s) = 0
              THEN (CASE WHEN (x & s) > 0 THEN s - 1 - (x % s) ELSE (x % s) END)
              ELSE (y % s) END,
         d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
                         CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END),
         s // 2
  FROM h WHERE s > 0
)"""


def _s2_cells_sql(level: int = 12) -> str:
    return f"""
WITH RECURSIVE b AS (
  SELECT osm_id, centroid_x AS px, centroid_y AS py
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
), {_s2_ij_sql('b', level)}, {_hilbert_sql('ij', level)}
SELECT osm_id, CAST(face AS INTEGER) AS s2_face, i AS s2_i, j AS s2_j,
       CAST(face * {1 << (2 * level)} + d AS BIGINT) AS s2_cell
FROM h WHERE s = 0
"""


def _s2_cover_sql(level: int = 16) -> str:
    return f"""
WITH RECURSIVE bb AS (
  SELECT osm_id, minx, miny, maxx, maxy
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
), corners AS (
  SELECT osm_id, unnest([
      {{'px': minx, 'py': miny}}, {{'px': maxx, 'py': miny}},
      {{'px': minx, 'py': maxy}}, {{'px': maxx, 'py': maxy}}]) AS pt
  FROM bb
), b AS (
  SELECT osm_id, pt.px AS px, pt.py AS py FROM corners
), {_s2_ij_sql('b', level)}, rect AS (
  SELECT osm_id, MIN(face) AS face,
         MIN(i) AS i0, MAX(i) AS i1, MIN(j) AS j0, MAX(j) AS j1
  FROM ij GROUP BY osm_id
), ci AS (
  SELECT osm_id, face, unnest(range(i0, i1 + 1)) AS i, j0, j1 FROM rect
), cells AS (
  SELECT osm_id, face, i, unnest(range(j0, j1 + 1)) AS j FROM ci
), {_hilbert_sql('cells', level)}
SELECT osm_id,
       CAST(face * {1 << (2 * level)} + d AS BIGINT) AS s2_cell
FROM h WHERE s = 0
"""


def _kmeans_exact_sql(n_clusters: int = 4, iters: int = 3) -> str:
    """Unrolled integer Lloyd rounds mirroring ``ann.kmeans_exact``:
    micro-unit quantization, vec_id<k init, ROW_NUMBER argmin with the
    same (dist, cluster) tie order, floormod-adjusted exact floor
    division, empty clusters keep the previous centroid."""
    blocks = []
    for t in range(iters + 1):
        blocks.append(f"""
d{t} AS (
  SELECT e.vec_id, c.cluster,
         SUM((e.q - c.mu) * (e.q - c.mu)) AS dist
  FROM eq e JOIN cent{t} c USING (dim) GROUP BY 1, 2
), a{t} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
    FROM d{t}) WHERE rn = 1
)""")
        if t < iters:
            blocks.append(f"""
s{t} AS (
  SELECT a.cluster, e.dim, SUM(e.q) AS s, COUNT(*) AS n
  FROM a{t} a JOIN eq e USING (vec_id) GROUP BY 1, 2
), cent{t + 1} AS (
  SELECT p.cluster, p.dim,
         CAST(CASE WHEN s.n IS NULL THEN p.mu
              ELSE (s.s - (((s.s % s.n) + s.n) % s.n)) // s.n END
              AS BIGINT) AS mu
  FROM cent{t} p LEFT JOIN s{t} s ON s.cluster = p.cluster AND s.dim = p.dim
)""")
    return f"""
WITH dims AS (
  SELECT unnest(range(0, (SELECT len(embedding) FROM embeddings LIMIT 1))) AS dim
), eq AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, d.dim,
         CAST(FLOOR(CAST(embedding[d.dim + 1] AS DOUBLE) * 1000000) AS BIGINT) AS q
  FROM embeddings, dims d
), cent0 AS (
  SELECT vec_id AS cluster, dim, q AS mu FROM eq WHERE vec_id < {n_clusters}
), {', '.join(blocks)}
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM a{iters}
"""


def _tile_pagerank_sql(iters: int = 5) -> str:
    """Unrolled integer PageRank rounds mirroring ``geo.q_tile_pagerank``
    — same SCALE/BASE units, same ``p // deg`` truncation (all values
    non-negative, so DuckDB's truncating ``//`` IS floor), same deg-0
    rule (no incoming edges → BASE)."""
    scale = 10**12
    base = 15 * scale // 100
    blocks = [
        f"p0 AS (SELECT tile_x, tile_y, CAST({scale} AS BIGINT) AS p FROM occ)"
    ]
    for t in range(iters):
        blocks.append(f"""
c{t + 1} AS (
  SELECT e.nx AS tile_x, e.ny AS tile_y, SUM(p.p // d.deg) AS s
  FROM e JOIN p{t} p ON p.tile_x = e.sx AND p.tile_y = e.sy
         JOIN deg d ON d.sx = e.sx AND d.sy = e.sy
  GROUP BY 1, 2
), p{t + 1} AS (
  SELECT o.tile_x, o.tile_y,
         CAST({base} + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS p
  FROM occ o LEFT JOIN c{t + 1} c USING (tile_x, tile_y)
)""")
    return f"""
WITH occ AS (
  SELECT DISTINCT tile_x, tile_y FROM ({_TILE_SQL})
), nbr AS (
  SELECT o.tile_x AS sx, o.tile_y AS sy,
         o.tile_x + dx.d AS nx, o.tile_y + dy.d AS ny
  FROM occ o
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
  WHERE NOT (dx.d = 0 AND dy.d = 0)
), e AS (
  SELECT n.sx, n.sy, n.nx, n.ny
  FROM nbr n JOIN occ t ON t.tile_x = n.nx AND t.tile_y = n.ny
), deg AS (
  SELECT sx, sy, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1, 2
), {', '.join(blocks)}
SELECT tile_x, tile_y, p AS pr FROM p{iters}
"""


def _s2_neighbors_sql(level: int = 16) -> str:
    """Occupied-cell 8-neighborhood over the S2-analog grid — mirrors
    ``pipelines/geo.q_s2_neighbors``: same within-face adjacency rule,
    same clamp, Hilbert center ids via the shared recursive CTE."""
    n = 1 << level
    return f"""
WITH RECURSIVE b AS (
  SELECT osm_id, centroid_x AS px, centroid_y AS py
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
), {_s2_ij_sql('b', level)}, occ AS (
  SELECT DISTINCT face, i, j FROM ij
), nbr AS (
  SELECT o.face, o.i, o.j, o.i + dx.d AS ni, o.j + dy.d AS nj
  FROM occ o
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
  WHERE NOT (dx.d = 0 AND dy.d = 0)
    AND o.i + dx.d >= 0 AND o.i + dx.d < {n}
    AND o.j + dy.d >= 0 AND o.j + dy.d < {n}
), flag AS (
  SELECT nbr.face, nbr.i, nbr.j,
         CASE WHEN o2.i IS NOT NULL THEN 1 ELSE 0 END AS occ
  FROM nbr LEFT JOIN occ o2
    ON o2.face = nbr.face AND o2.i = nbr.ni AND o2.j = nbr.nj
), agg AS (
  SELECT face, i, j, CAST(COUNT(*) AS BIGINT) AS n_neighbors,
         CAST(SUM(occ) AS BIGINT) AS n_occupied
  FROM flag GROUP BY 1, 2, 3
), cellsrc AS (
  SELECT CAST(0 AS BIGINT) AS osm_id, face, i, j FROM occ
), {_hilbert_sql('cellsrc', level)}
SELECT CAST(c.face * {1 << (2 * level)} + c.d AS BIGINT) AS s2_cell,
       a.n_neighbors, a.n_occupied
FROM (SELECT face, i, j, d FROM h WHERE s = 0) c
JOIN agg a ON a.face = c.face AND a.i = c.i AND a.j = c.j
"""


def _subtree_avail_sql() -> str:
    """Implicit-tiling availability: ancestor/leaf bits OR'd per z12 root,
    mirroring ``pipelines/geo.q_subtree_avail`` — unrolled 4-bit Morton,
    level-order offsets (0,1,5,21), 52-bit BIGINT-safe words."""
    mort = (
        "((ax & 1) + ((ax >> 1) & 1) * 4 + ((ax >> 2) & 1) * 16"
        " + ((ax >> 3) & 1) * 64"
        " + (ay & 1) * 2 + ((ay >> 1) & 1) * 8 + ((ay >> 2) & 1) * 32"
        " + ((ay >> 3) & 1) * 128)"
    )
    return f"""
WITH t AS (
  SELECT CAST(tile_x AS BIGINT) AS tx, CAST(tile_y AS BIGINT) AS ty,
         CAST(COUNT(*) AS BIGINT) AS nb
  FROM ({_TILE_SQL}) GROUP BY 1, 2
), d AS (SELECT unnest(range(0, 5)) AS dep),
e AS (
  SELECT tx // 16 AS root_x, ty // 16 AS root_y, nb, dep,
         (tx % 16) >> (4 - dep) AS ax, (ty % 16) >> (4 - dep) AS ay
  FROM t CROSS JOIN d
), m AS (
  SELECT root_x, root_y, nb, dep, {mort} AS mort FROM e
), p AS (
  SELECT root_x, root_y, nb, dep, mort,
         CASE dep WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 5
                  ELSE 21 END + mort AS ibit
  FROM m
)
SELECT CAST(root_x AS INTEGER) AS root_x, CAST(root_y AS INTEGER) AS root_y,
       CAST(COUNT(CASE WHEN dep = 4 THEN 1 END) AS BIGINT) AS n_tiles,
       CAST(COALESCE(SUM(CASE WHEN dep = 4 THEN nb END), 0) AS BIGINT)
           AS n_buildings,
       CAST(COALESCE(bit_or(CASE WHEN dep < 4 AND ibit < 52
                THEN CAST(1 AS BIGINT) << CAST(ibit AS INTEGER) END), 0)
           AS BIGINT) AS int_w0,
       CAST(COALESCE(bit_or(CASE WHEN dep < 4 AND ibit >= 52
                THEN CAST(1 AS BIGINT) << CAST(ibit - 52 AS INTEGER) END), 0)
           AS BIGINT) AS int_w1,
       CAST(COALESCE(bit_or(CASE WHEN dep = 4 AND mort // 52 = 0
                THEN CAST(1 AS BIGINT) << CAST(mort % 52 AS INTEGER) END), 0)
           AS BIGINT) AS leaf_w0,
       CAST(COALESCE(bit_or(CASE WHEN dep = 4 AND mort // 52 = 1
                THEN CAST(1 AS BIGINT) << CAST(mort % 52 AS INTEGER) END), 0)
           AS BIGINT) AS leaf_w1,
       CAST(COALESCE(bit_or(CASE WHEN dep = 4 AND mort // 52 = 2
                THEN CAST(1 AS BIGINT) << CAST(mort % 52 AS INTEGER) END), 0)
           AS BIGINT) AS leaf_w2,
       CAST(COALESCE(bit_or(CASE WHEN dep = 4 AND mort // 52 = 3
                THEN CAST(1 AS BIGINT) << CAST(mort % 52 AS INTEGER) END), 0)
           AS BIGINT) AS leaf_w3,
       CAST(COALESCE(bit_or(CASE WHEN dep = 4 AND mort // 52 = 4
                THEN CAST(1 AS BIGINT) << CAST(mort % 52 AS INTEGER) END), 0)
           AS BIGINT) AS leaf_w4
FROM p GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# uint64 wrap-arithmetic SQL mirrors (near-dup / sketch family)
#
# DuckDB has no unsigned 64-bit type, so the engine's uint64 hash chains
# (pipelines/textops.py: _minhash_batch / _simhash_batch) are mirrored in
# HUGEINT kept in [0, 2^64) with explicit ``% 2^64`` wraps; xor/bit_count
# run in the signed BIGINT domain (two's complement is bit-identical) and
# convert back for unsigned comparisons/mins.

_U64 = 1 << 64
_I64 = 1 << 63
_GOLD = 0x9E3779B97F4A7C15
_FNV = 0x100000001B3


def _u2s(x: str) -> str:
    """HUGEINT in [0,2^64) → the same 64 bits as signed BIGINT."""
    return (
        f"(CASE WHEN ({x}) >= {_I64} THEN CAST(({x}) - {_U64} AS BIGINT) "
        f"ELSE CAST(({x}) AS BIGINT) END)"
    )


def _s2u(x: str) -> str:
    """Signed BIGINT → the same 64 bits as HUGEINT in [0,2^64)."""
    return (
        f"(CASE WHEN ({x}) < 0 THEN CAST(({x}) AS HUGEINT) + {_U64} "
        f"ELSE CAST(({x}) AS HUGEINT) END)"
    )


def _xor_u(a: str, b: str) -> str:
    """uint64 xor of two HUGEINT-in-[0,2^64) expressions."""
    return _s2u(f"xor({_u2s(a)}, {_u2s(b)})")


def _mulmod_u64(x: str, c: int) -> str:
    """``x * c mod 2^64`` for HUGEINT ``x`` in [0,2^64) and a Python-int
    constant ``c`` < 2^64 — split at 2^32 so no intermediate product
    exceeds HUGEINT range (x_lo*c ≤ 2^96, x_hi*c ≤ 2^96)."""
    return (
        f"(((({x}) % 4294967296) * {c} + "
        f"((({x}) // 4294967296) * {c} % 4294967296) * 4294967296) % {_U64})"
    )


# --- ASCII-only corpus invariant (ADVICE r4) -------------------------------
# The character-level text oracles below (the shingle CTE, the CDC rolling
# hash, the poly257 base hash, the span-sequence fold) address text with
# DuckDB's ``ord(substr(...))`` codepoints and ``length()`` CHARACTER
# counts, while the engine hashes UTF-8 BYTES at byte offsets.  The two
# agree iff every byte is a codepoint — i.e. the corpus is pure ASCII.
# That invariant holds for the driver's testdata and the synth corpus by
# construction and is ASSERTED by tests/test_corpus_ascii.py (DuckDB
# ``strlen(text) = length(text)`` over every corpus at every SF);
# a non-ASCII corpus must switch these oracles to byte addressing
# (``encode(text)`` blobs) before trusting a hash compare.
_SHINGLE_CTE = """
sh AS (
  SELECT DISTINCT doc_id,
         CAST(ord(substr(text, CAST(i AS INT), 1))
            + 256 * ord(substr(text, CAST(i AS INT) + 1, 1))
            + 65536 * ord(substr(text, CAST(i AS INT) + 2, 1))
            + 16777216 * ord(substr(text, CAST(i AS INT) + 3, 1))
           AS BIGINT) AS s
  FROM documents, unnest(range(1, length(text) - 2)) AS u(i)
  WHERE length(text) >= 4
  UNION
  SELECT doc_id, CAST(0 AS BIGINT) AS s
  FROM documents WHERE length(text) < 4
)"""


def _minhash_buckets_ctes() -> str:
    """CTE chain ending in ``bk(doc_id, band, band_key)`` — the exact LSH
    band keys of ``textops._minhash_batch`` (64 perms × 16 bands, 4-byte
    char shingles, h = s·a_i xor s>>7, FNV-fold band keys), expression by
    expression in wrap arithmetic."""
    perms = ", ".join(
        f"({j}, CAST({((j + 1) * _GOLD) % _U64 | 1} AS HUGEINT))"
        for j in range(64)
    )
    # per-shingle perm hash: (s*a mod 2^64) xor (s >> 7); s < 2^32 so the
    # single HUGEINT product fits and s//128 is the unsigned shift
    hv = _xor_u(f"(CAST(s AS HUGEINT) * a) % {_U64}", "CAST(s // 128 AS HUGEINT)")
    # band-key FNV fold over the band's 4 perm minima (keys start at 0:
    # k1 = s0; k_{r+1} = (k_r * FNV mod 2^64) xor s_r)
    k = "s0"
    for r in (1, 2, 3):
        k = _xor_u(_mulmod_u64(k, _FNV), f"s{r}")
    return f"""
{_SHINGLE_CTE},
perms(j, a) AS (VALUES {perms}),
hv AS MATERIALIZED (
  SELECT doc_id, j, MIN({hv}) AS sig
  FROM sh CROSS JOIN perms GROUP BY 1, 2
),
piv AS (
  SELECT doc_id, j // 4 AS band,
         MAX(CASE WHEN j % 4 = 0 THEN sig END) AS s0,
         MAX(CASE WHEN j % 4 = 1 THEN sig END) AS s1,
         MAX(CASE WHEN j % 4 = 2 THEN sig END) AS s2,
         MAX(CASE WHEN j % 4 = 3 THEN sig END) AS s3
  FROM hv GROUP BY 1, 2
),
bk AS MATERIALIZED (
  SELECT doc_id, band, {k} AS band_key FROM piv
)"""


def _minhash_pairs_sql() -> str:
    """Oracle for ``textops.minhash_near_dup``: docs sharing any LSH band
    bucket, paired with the bucket's smallest doc_id."""
    return f"""
WITH {_minhash_buckets_ctes()},
mn AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY band, band_key) AS dup_of
  FROM bk
)
SELECT DISTINCT doc_id, dup_of FROM mn WHERE doc_id > dup_of
"""


def _jaccard_ngram_pairs_sql(threshold_pct: int = 50) -> str:
    """Oracle for ``textops.jaccard_ngram_pairs``: MinHash candidates
    verified by exact shingle-set Jaccard, percentage rounded half-even
    in pure integer arithmetic (np.round mirror)."""
    return f"""
WITH {_minhash_buckets_ctes()},
mn AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY band, band_key) AS dup_of
  FROM bk
),
cand AS (SELECT DISTINCT doc_id, dup_of FROM mn WHERE doc_id > dup_of),
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_id, c.dup_of, CAST(COUNT(*) AS BIGINT) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_id
  JOIN sh b ON b.doc_id = c.dup_of AND b.s = a.s
  GROUP BY 1, 2
),
j AS (
  SELECT c.doc_id, c.dup_of,
         COALESCE(i.i, 0) AS i,
         sa.n + sb.n - COALESCE(i.i, 0) AS u
  FROM cand c
  LEFT JOIN inter i ON i.doc_id = c.doc_id AND i.dup_of = c.dup_of
  JOIN sz sa ON sa.doc_id = c.doc_id
  JOIN sz sb ON sb.doc_id = c.dup_of
),
r AS (
  SELECT doc_id, dup_of, i, u,
         (100 * i) // u AS f, 100 * i - ((100 * i) // u) * u AS rem
  FROM j WHERE 2 * i >= u AND u > 0
)
SELECT doc_id, dup_of,
       CAST(f + CASE WHEN 2 * rem > u THEN 1
                     WHEN 2 * rem = u AND f % 2 = 1 THEN 1
                     ELSE 0 END AS BIGINT) AS jaccard_pct
FROM r
"""


def _simhash_cand_ctes() -> str:
    """The SimHash candidate CTE chain (shingles → signature → 4×16-bit
    band buckets → within-bucket pairs with Hamming), ending in
    ``pairs(doc_id, dup_of, hamming)`` — shared by the simhash_near_dup
    oracle and the edit-distance verify oracle."""
    h = _xor_u(
        f"(CAST(s AS HUGEINT) * {_GOLD}) % {_U64}", "CAST(s // 8192 AS HUGEINT)"
    )
    # sig as unsigned HUGEINT from the 64 positive-vote bits
    return f"""{_SHINGLE_CTE},
hv AS MATERIALIZED (SELECT doc_id, {h} AS h FROM sh),
bits AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (h // CAST(power(2::HUGEINT, j) AS HUGEINT)) % 2 = 1
                  THEN 1 ELSE -1 END) AS votes
  FROM hv, unnest(range(0, 64)) AS u(j)
  GROUP BY 1, 2
),
sig AS MATERIALIZED (
  SELECT doc_id,
         COALESCE(SUM(CASE WHEN votes > 0
              THEN CAST(power(2::HUGEINT, j) AS HUGEINT) END), 0) AS sig
  FROM bits GROUP BY 1
),
bk AS (
  SELECT doc_id, sig, band,
         (sig // CAST(power(2::HUGEINT, band * 16) AS HUGEINT)) % 65536
             AS band_key
  FROM sig, unnest(range(0, 4)) AS u(band)
),
pairs AS (
  SELECT DISTINCT a.doc_id, b.doc_id AS dup_of,
         bit_count(xor({_u2s('a.sig')}, {_u2s('b.sig')})) AS hamming
  FROM bk a JOIN bk b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id > b.doc_id
)"""


def _simhash_pairs_sql(max_hamming: int = 8) -> str:
    """Oracle for ``textops.simhash_near_dup``: 64-bit SimHash over char
    shingles (h = s·GOLD xor s>>13, signed bit votes), 4×16-bit band
    buckets, pairwise Hamming ≤ ``max_hamming`` within buckets."""
    return f"""
WITH {_simhash_cand_ctes()}
SELECT doc_id, dup_of, CAST(hamming AS BIGINT) AS hamming
FROM pairs WHERE hamming <= {max_hamming}
"""


def _edit_distance_near_dup_sql(
    max_hamming: int = 8, rel_permille: int = 200
) -> str:
    """Oracle for ``textops.edit_distance_near_dup``: the SimHash
    candidate chain + DuckDB ``levenshtein`` under the identical integer
    relative threshold (exact over the ASCII corpus — byte == char)."""
    return f"""
WITH {_simhash_cand_ctes()},
cand AS (SELECT doc_id, dup_of FROM pairs WHERE hamming <= {max_hamming})
SELECT c.doc_id, c.dup_of,
       CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev_dist,
       CAST(length(da.text) AS BIGINT) AS len_a,
       CAST(length(db.text) AS BIGINT) AS len_b
FROM cand c
JOIN documents da ON da.doc_id = c.doc_id
JOIN documents db ON db.doc_id = c.dup_of
WHERE levenshtein(da.text, db.text) * 1000
      <= {rel_permille} * greatest(length(da.text), length(db.text), 1)
"""


def _splitmix_ctes(src: str, h: str, d: str, carry: str) -> tuple[str, str]:
    """Salted splitmix64 (``textops._splitmix64_salted``) as linear
    MATERIALIZED CTE steps over HUGEINT-in-[0,2^64) column ``h`` with salt
    column ``d``; final CTE carries ``carry`` plus ``smz``."""
    c1, c2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    steps = [
        f"({h} + {d} + {_GOLD}) % {_U64}",
        _mulmod_u64(_xor_u("z1", f"z1 // {1 << 30}"), c1),
        _mulmod_u64(_xor_u("z2", f"z2 // {1 << 27}"), c2),
        _xor_u("z3", f"z3 // {1 << 31}"),
    ]
    ctes, prev = [], src
    for i, expr in enumerate(steps, start=1):
        ctes.append(
            f"smx{i} AS MATERIALIZED (SELECT {carry}, {expr} AS z{i} FROM {prev})"
        )
        prev = f"smx{i}"
    return ",\n".join(ctes), prev


def _term_counts_cms_sql(depth: int = 4, width: int = 1024, k: int = 10) -> str:
    """Oracle for ``textops.term_counts_cms``: the Count-Min estimate is a
    pure function of the term stream once the hashes are fixed — bucket
    ``d`` of a term is salted-splitmix64 of its base-257 poly hash, the
    counter is the summed count of ALL terms landing in that bucket, and
    the estimate is the min over depths.  Probe terms are the exact
    top-``k`` (same ordering as the ``top_terms`` oracle)."""
    sm, last = _splitmix_ctes("hd", "h", "d", "w, c, d")
    return f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok WHERE w <> '' GROUP BY 1),
top AS (SELECT w AS term FROM cnt ORDER BY c DESC, w LIMIT {k}),
pw AS (
  WITH RECURSIVE pr(j, p) AS (
    SELECT 0, CAST(1 AS HUGEINT)
    UNION ALL
    SELECT j + 1, (p * 257) % {_U64} FROM pr
    WHERE j < (SELECT MAX(length(w)) FROM cnt)
  ) SELECT * FROM pr
),
ch AS (
  SELECT w, CAST(i AS BIGINT) AS i,
         CAST(ord(substr(w, CAST(i AS INT), 1)) AS HUGEINT) AS b,
         CAST(length(w) AS BIGINT) AS L
  FROM cnt, unnest(range(1, length(w) + 1)) AS u(i)
),
h0 AS MATERIALIZED (
  SELECT ch.w, SUM(ch.b * pw.p) % {_U64} AS h
  FROM ch JOIN pw ON pw.j = ch.L - ch.i GROUP BY 1
),
hd AS (
  SELECT h0.w, cnt.c, h0.h, dd.d
  FROM h0 JOIN cnt USING (w) CROSS JOIN (SELECT unnest(range(0, {depth})) AS d) dd
),
{sm},
bkt AS (SELECT w, c, d, z4 % {width} AS idx FROM {last}),
csum AS (SELECT d, idx, SUM(c) AS bc FROM bkt GROUP BY 1, 2)
SELECT t.term, CAST(MIN(cs.bc) AS BIGINT) AS est_count
FROM top t
JOIN bkt b ON b.w = t.term
JOIN csum cs ON cs.d = b.d AND cs.idx = b.idx
GROUP BY 1
"""


def _hll_sql(p: int = 12) -> str:
    """Oracle for ``events.distinct_users_hll``: the HLL estimate is a
    pure function of the id set once the hash is fixed — splitmix64 per
    distinct user, register = max rank per bucket (the engine's 6-step
    halving cascade mirrored arithmetically: no bitwise ops, only
    compares and in-range multiplies), Z as the integer S = Σ 2^(maxrank
    − reg), and the identical double expression for the estimate with
    the linear-counting branch."""
    m = 1 << p
    maxrank = 64 - p + 1
    sm, last = _splitmix_ctes("hx", "h", "0", "h")
    # halving cascade: (cur, rank) through shifts 32..1
    casc, prev = [], "rr"
    for i, s in enumerate((32, 16, 8, 4, 2, 1), start=1):
        lim = 1 << (64 - s)
        casc.append(
            f"c{i} AS (SELECT idx, rest, "
            f"rank + CASE WHEN cur = 0 THEN 0 WHEN cur < {lim} THEN {s} "
            f"ELSE 0 END AS rank, "
            f"CASE WHEN cur < {lim} THEN cur * {1 << s} ELSE cur END AS cur "
            f"FROM {prev})"
        )
        prev = f"c{i}"
    cascade = ",\n".join(casc)
    alpha_est = (
        f"((0.7213 / (1.0 + 1.079 / {float(m)})) * {float(m)} * {float(m)})"
        f" * {float(1 << maxrank)} / CAST(s_int AS DOUBLE)"
    )
    return f"""
WITH u AS (SELECT DISTINCT CAST(user_id AS HUGEINT) AS h FROM events),
hx AS (SELECT h FROM u),
{sm},
rr AS (
  SELECT z4 // {1 << (64 - p)} AS idx,
         (z4 * {1 << p}) % {_U64} AS rest,
         CAST(1 AS BIGINT) AS rank,
         (z4 * {1 << p}) % {_U64} AS cur
  FROM {last}
),
{cascade},
regs AS (
  SELECT idx,
         MAX(CASE WHEN rest = 0 THEN {maxrank}
                  ELSE LEAST(rank, {maxrank}) END) AS reg
  FROM c6 GROUP BY 1
),
agg AS (
  SELECT SUM(CAST(power(2.0, {maxrank} - reg) AS HUGEINT)) AS s_occ,
         COUNT(*) AS n_occ
  FROM regs
),
fin AS (
  SELECT s_occ + ({m} - n_occ) * CAST({1 << maxrank} AS HUGEINT) AS s_int,
         {m} - n_occ AS zeros
  FROM agg
)
SELECT CAST(FLOOR(CASE WHEN {alpha_est} <= {2.5 * m} AND zeros > 0
            THEN {float(m)} * ln({float(m)} / CAST(zeros AS DOUBLE))
            ELSE {alpha_est} END + 0.5) AS BIGINT) AS n_users_hll
FROM fin
"""


def _tile_components_sql(rounds: int = 16) -> str:
    """Oracle for ``geo.q_tile_components``: connected components of the
    occupied z16 tile grid (4-connectivity), labels = min packed tile id
    per component.  The label is algorithm-independent; plain hook +
    pointer-jump unrolling stalls at label plateaus (only grid hooks
    cross local minima → O(diameter) rounds), so the oracle unrolls the
    same alternating LARGE-STAR / SMALL-STAR edge rewriting the engine
    runs (Kiveris et al., SoCC'14 — O(log n) rounds); at the fixed point
    every non-root node holds exactly one edge to its component min."""
    ctes = []
    prev = "e0"
    for k in range(1, rounds + 1):
        # large-star: center on every endpoint; n > c rewires to the
        # center's neighborhood min
        ctes.append(
            f"""dl{k} AS MATERIALIZED (
  SELECT DISTINCT c, n FROM (
    SELECT u AS c, v AS n FROM {prev}
    UNION ALL SELECT v, u FROM {prev})
),
ml{k} AS (SELECT c, LEAST(MIN(n), c) AS m FROM dl{k} GROUP BY 1),
gl{k} AS MATERIALIZED (
  SELECT DISTINCT d.n AS u, m.m AS v
  FROM dl{k} d JOIN ml{k} m USING (c)
  WHERE d.n > d.c AND d.n <> m.m
)"""
        )
        # small-star: center on the larger endpoint; all smaller
        # neighbors (and the center) rewire to the neighborhood min
        ctes.append(
            f"""ds{k} AS MATERIALIZED (
  SELECT DISTINCT GREATEST(u, v) AS c, LEAST(u, v) AS n FROM gl{k}
),
ms{k} AS (SELECT c, MIN(n) AS m FROM ds{k} GROUP BY 1),
es{k} AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT d.n AS u, m.m AS v FROM ds{k} d JOIN ms{k} m USING (c)
    UNION ALL
    SELECT c AS u, m AS v FROM ms{k})
  WHERE u <> v
)"""
        )
        prev = f"es{k}"
    chain = ",\n".join(ctes)
    return f"""
WITH occ AS (
  SELECT DISTINCT CAST(tile_x AS BIGINT) AS tx, CAST(tile_y AS BIGINT) AS ty
  FROM ({_TILE_SQL})
),
n AS MATERIALIZED (SELECT tx, ty, tx * 1048576 + ty AS node FROM occ),
e0 AS MATERIALIZED (
  SELECT a.node AS u, b.node AS v
  FROM n a JOIN n b ON b.tx = a.tx + 1 AND b.ty = a.ty
  UNION ALL
  SELECT a.node, b.node
  FROM n a JOIN n b ON b.tx = a.tx AND b.ty = a.ty + 1
),
{chain},
lab AS (SELECT u AS node, MIN(v) AS root FROM {prev} GROUP BY 1)
SELECT CAST(n.tx AS INTEGER) AS tile_x, CAST(n.ty AS INTEGER) AS tile_y,
       CAST(COALESCE(lab.root, n.node) AS BIGINT) AS component_id
FROM n LEFT JOIN lab ON lab.node = n.node
"""


def _tile_bfs_sql(horizon: int = 12, n_landmarks: int = 16) -> str:
    """Oracle for ``geo.q_tile_bfs``: unrolled Bellman rounds (one per
    hop of the horizon) over the occupied-tile 4-adjacency; label =
    hops·2^42 + landmark id, numeric MIN = lexicographic (hops,
    landmark) min."""
    SH = 1 << 42
    ctes, prev = [], "l0"
    for k in range(1, horizon + 1):
        ctes.append(
            f"l{k} AS MATERIALIZED (SELECT e.v AS node, "
            f"MIN(p.best + CASE WHEN e.u = e.v THEN 0 ELSE {SH} END) AS best "
            f"FROM e JOIN {prev} p ON p.node = e.u GROUP BY 1)"
        )
        prev = f"l{k}"
    chain = ",\n".join(ctes)
    return f"""
WITH cagg AS (
  SELECT CAST(tile_x AS BIGINT) AS tx, CAST(tile_y AS BIGINT) AS ty,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ({_TILE_SQL}) GROUP BY 1, 2
),
n AS MATERIALIZED (SELECT tx, ty, tx * 1048576 + ty AS node, cnt FROM cagg),
lm AS (SELECT node FROM n ORDER BY cnt DESC, node LIMIT {n_landmarks}),
e0 AS (
  SELECT a.node AS u, b.node AS v
  FROM n a JOIN n b ON b.tx = a.tx + 1 AND b.ty = a.ty
  UNION ALL
  SELECT a.node, b.node
  FROM n a JOIN n b ON b.tx = a.tx AND b.ty = a.ty + 1
),
e AS MATERIALIZED (
  SELECT u, v FROM e0
  UNION ALL SELECT v, u FROM e0
  UNION ALL SELECT node, node FROM n
),
l0 AS (SELECT node, node AS best FROM lm),
{chain}
SELECT CAST(n.tx AS INTEGER) AS tile_x, CAST(n.ty AS INTEGER) AS tile_y,
       CAST(f.best // {SH} AS BIGINT) AS hops,
       CAST(f.best % {SH} AS BIGINT) AS landmark
FROM {prev} f JOIN n ON n.node = f.node
"""


def _ann_lsh_topk_sql(n_planes: int = 12, tag: int = 0x51A000) -> str:
    """Oracle for ``ann.ann_lsh_topk``: the ±1 sign planes are bit 0 of a
    Jenkins round over ``plane·dims + d + tag`` (identical to the engine
    after the session-G determinization), so bucket signatures, the
    multiprobe (Hamming-1) candidate set, and the within-candidate cosine
    ranks are all reproducible; like ``ann_topk``, only ranks are
    compared (ordering is stable far beyond float association noise)."""
    mix, h = _jenkins_round_sql("a0", "m")
    return f"""
WITH u AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         unnest(range(0, len(embedding))) AS d
  FROM embeddings
),
dm AS (SELECT CAST(MAX(d) + 1 AS BIGINT) AS dims FROM u),
s0 AS (
  SELECT t2.range AS b, dd.d,
         CAST(t2.range * dm.dims + dd.d + {tag} AS BIGINT) AS a0
  FROM (SELECT DISTINCT d FROM u) dd
  CROSS JOIN range(0, {n_planes}) t2 CROSS JOIN dm
),
s1 AS (SELECT b, d, {mix} FROM s0),
sgn AS (SELECT b, d,
               CASE WHEN {h} % 2 = 0 THEN 1.0 ELSE -1.0 END AS sign
        FROM s1),
dot AS (
  SELECT u.vec_id, s.b, SUM(u.v * s.sign) AS dp
  FROM u JOIN sgn s USING (d) GROUP BY 1, 2
),
sig AS MATERIALIZED (
  SELECT vec_id,
         CAST(SUM(CASE WHEN FLOOR(dp * 1000000 + 0.5) > 0
                  THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
                  ELSE 0 END) AS BIGINT) AS sg
  FROM dot GROUP BY 1
),
qs AS (SELECT vec_id AS qid, sg AS qsig FROM sig WHERE vec_id < 10),
flips AS (
  SELECT CAST(0 AS BIGINT) AS f
  UNION ALL
  SELECT CAST(1 AS BIGINT) << CAST(range AS INTEGER) FROM range(0, {n_planes})
),
probe AS (SELECT DISTINCT xor(qsig, f) AS ps FROM qs CROSS JOIN flips),
cand AS (SELECT DISTINCT s.vec_id FROM sig s JOIN probe p ON p.ps = s.sg),
pairs AS (
  SELECT q.qid, e.vec_id, q.qe, e.embedding AS ee
  FROM (SELECT vec_id AS qid, embedding AS qe
        FROM embeddings WHERE vec_id < 10) q
  CROSS JOIN embeddings e
  WHERE e.vec_id <> q.qid AND e.vec_id IN (SELECT vec_id FROM cand)
),
un AS (
  SELECT qid, vec_id,
         CAST(UNNEST(qe) AS DOUBLE) AS qa, CAST(UNNEST(ee) AS DOUBLE) AS ea
  FROM pairs
),
sims AS (
  SELECT qid, vec_id,
         SUM(qa * ea) / (sqrt(SUM(qa * qa)) * sqrt(SUM(ea * ea))) AS sim
  FROM un GROUP BY qid, vec_id
),
r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
  FROM sims
)
SELECT qid, vec_id, CAST(rn AS INTEGER) AS rank FROM r WHERE rn <= 5
"""


def _mmr_select_sql(k: int = 8, lam_pm: int = 500) -> str:
    """Oracle for ``ann.mmr_select``: the identical greedy rounds unrolled
    as CTE blocks (the ``kmeans_exact`` discipline) — normalized vectors,
    e6-floored similarities, pure-integer scores, ties to smallest
    vec_id.  ``m{r}`` accumulates the running max-sim to the selected
    set; ``p{r}`` is round r's champion."""
    lam, mu = int(lam_pm), 1000 - int(lam_pm)
    ctes = [
        """eu AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         unnest(range(0, len(embedding))) AS d
  FROM embeddings
),
enrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM eu GROUP BY 1),
en AS MATERIALIZED (
  SELECT eu.vec_id, eu.d, eu.v / n.nrm AS v
  FROM eu JOIN enrm n ON n.vec_id = eu.vec_id
),
qs AS (SELECT d, SUM(v) AS sv FROM en WHERE vec_id < 10 GROUP BY 1),
qsn AS (SELECT sqrt(SUM(sv * sv)) AS nrm FROM qs),
anc AS (SELECT qs.d, qs.sv / qsn.nrm AS v FROM qs CROSS JOIN qsn),
rel AS MATERIALIZED (
  SELECT en.vec_id,
         CAST(FLOOR(SUM(en.v * anc.v) * 1000000 + 0.5) AS BIGINT) AS rel_e6
  FROM en JOIN anc USING (d) GROUP BY 1
)"""
    ]
    picked = []
    for r in range(1, k + 1):
        if r == 1:
            ctes.append(
                f"""p1 AS MATERIALIZED (
  SELECT vec_id, rel_e6, CAST(0 AS BIGINT) AS maxsim_e6,
         {lam} * rel_e6 AS score
  FROM rel ORDER BY score DESC, vec_id LIMIT 1
)"""
            )
        else:
            prev = r - 1
            ctes.append(
                f"""s{prev} AS MATERIALIZED (
  SELECT en.vec_id,
         CAST(FLOOR(SUM(en.v * pv.v) * 1000000 + 0.5) AS BIGINT) AS sim_e6
  FROM en JOIN (SELECT d, v FROM en
                WHERE vec_id = (SELECT vec_id FROM p{prev})) pv USING (d)
  GROUP BY 1
)"""
            )
            if prev == 1:
                ctes.append(
                    f"m{prev} AS MATERIALIZED (SELECT vec_id, sim_e6 AS ms FROM s{prev})"
                )
            else:
                ctes.append(
                    f"""m{prev} AS MATERIALIZED (
  SELECT a.vec_id, GREATEST(a.ms, b.sim_e6) AS ms
  FROM m{prev - 1} a JOIN s{prev} b USING (vec_id)
)"""
                )
            excl = " UNION ALL ".join(
                f"SELECT vec_id FROM p{i}" for i in range(1, r)
            )
            ctes.append(
                f"""p{r} AS MATERIALIZED (
  SELECT rel.vec_id, rel.rel_e6, m.ms AS maxsim_e6,
         {lam} * rel.rel_e6 - {mu} * m.ms AS score
  FROM rel JOIN m{r - 1} m USING (vec_id)
  WHERE rel.vec_id NOT IN ({excl})
  ORDER BY score DESC, vec_id LIMIT 1
)"""
            )
        picked.append(
            f"SELECT CAST({r} AS BIGINT) AS rank, vec_id, rel_e6, maxsim_e6 FROM p{r}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(picked)


def _kcenter_select_sql(k: int = 8) -> str:
    """Oracle for ``ann.kcenter_select``: the identical greedy Gonzalez
    rounds unrolled as MATERIALIZED CTE blocks — seed = MIN(vec_id),
    each round picks the candidate minimizing the e6-floored max-sim to
    the selected set, ties to smallest vec_id."""
    ctes = [
        """eu AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         unnest(range(0, len(embedding))) AS d
  FROM embeddings
),
enrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM eu GROUP BY 1),
en AS MATERIALIZED (
  SELECT eu.vec_id, eu.d, eu.v / n.nrm AS v
  FROM eu JOIN enrm n ON n.vec_id = eu.vec_id
),
p1 AS MATERIALIZED (
  SELECT MIN(vec_id) AS vec_id, CAST(1000000 AS BIGINT) AS maxsim_e6
  FROM en
)"""
    ]
    picked = ["SELECT CAST(1 AS BIGINT) AS rank, vec_id, maxsim_e6 FROM p1"]
    for r in range(2, k + 1):
        prev = r - 1
        ctes.append(
            f"""s{prev} AS MATERIALIZED (
  SELECT en.vec_id,
         CAST(FLOOR(SUM(en.v * pv.v) * 1000000 + 0.5) AS BIGINT) AS sim_e6
  FROM en JOIN (SELECT d, v FROM en
                WHERE vec_id = (SELECT vec_id FROM p{prev})) pv USING (d)
  GROUP BY 1
)"""
        )
        if prev == 1:
            ctes.append(
                f"m{prev} AS MATERIALIZED (SELECT vec_id, sim_e6 AS ms FROM s{prev})"
            )
        else:
            ctes.append(
                f"""m{prev} AS MATERIALIZED (
  SELECT a.vec_id, GREATEST(a.ms, b.sim_e6) AS ms
  FROM m{prev - 1} a JOIN s{prev} b USING (vec_id)
)"""
            )
        excl = " UNION ALL ".join(f"SELECT vec_id FROM p{i}" for i in range(1, r))
        ctes.append(
            f"""p{r} AS MATERIALIZED (
  SELECT vec_id, ms AS maxsim_e6
  FROM m{prev}
  WHERE vec_id NOT IN ({excl})
  ORDER BY ms, vec_id LIMIT 1
)"""
        )
        picked.append(
            f"SELECT CAST({r} AS BIGINT) AS rank, vec_id, maxsim_e6 FROM p{r}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(picked)


def _embedding_pairs_ctes(
    threshold: float, n_planes: int = 8, tag: int = 0xE4B000
) -> str:
    """CTE chain ending in ``epairs(vec_id, dup_of, sim)`` — the exact
    sign-LSH bucket pairs of ``ann.embedding_near_dup`` (Jenkins ±1
    planes, same-bucket candidates, normalized-cosine verify ≥
    ``threshold``).  Bucket signs come from the NORMALIZED vectors (like
    the engine's ``mn @ planes.T``) on the e6-quantized grid; the verify
    threshold and reported percentage are also integer-grid compares
    (``floor(x*scale + 0.5)``, the repo's oracle float rule)."""
    mix, h = _jenkins_round_sql("a0", "m")
    thr_e6 = round(threshold * 1e6)
    return f"""
eu AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         unnest(range(0, len(embedding))) AS d
  FROM embeddings
),
edm AS (SELECT CAST(MAX(d) + 1 AS BIGINT) AS dims FROM eu),
es0 AS (
  SELECT t2.range AS b, dd.d,
         CAST(t2.range * edm.dims + dd.d + {tag} AS BIGINT) AS a0
  FROM (SELECT DISTINCT d FROM eu) dd
  CROSS JOIN range(0, {n_planes}) t2 CROSS JOIN edm
),
es1 AS (SELECT b, d, {mix} FROM es0),
esgn AS (SELECT b, d,
                CASE WHEN {h} % 2 = 0 THEN 1.0 ELSE -1.0 END AS sign
         FROM es1),
enrm AS (
  SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM eu GROUP BY 1
),
edot AS (
  -- normalized dot, like the engine (mn @ planes.T); the sign compare
  -- runs on the e6-quantized grid so DuckDB's sequential sum and
  -- numpy's BLAS pairwise sum agree even ~1e-13 from zero (ADVICE r4)
  SELECT eu.vec_id, s.b, SUM(eu.v / n.nrm * s.sign) AS dp
  FROM eu JOIN esgn s USING (d) JOIN enrm n ON n.vec_id = eu.vec_id
  GROUP BY 1, 2
),
esig AS MATERIALIZED (
  SELECT vec_id,
         CAST(SUM(CASE WHEN FLOOR(dp * 1000000 + 0.5) > 0
                  THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
                  ELSE 0 END) AS BIGINT) AS sg
  FROM edot GROUP BY 1
),
ecand AS (
  SELECT a.vec_id, b.vec_id AS dup_of
  FROM esig a JOIN esig b ON a.sg = b.sg AND a.vec_id > b.vec_id
),
eun AS (
  SELECT c.vec_id, c.dup_of, ua.d, ua.v AS va, ub.v AS vb
  FROM ecand c
  JOIN eu ua ON ua.vec_id = c.vec_id
  JOIN eu ub ON ub.vec_id = c.dup_of AND ub.d = ua.d
),
epairs AS MATERIALIZED (
  SELECT vec_id, dup_of,
         SUM(va * vb) / (sqrt(SUM(va * va)) * sqrt(SUM(vb * vb))) AS sim
  FROM eun GROUP BY 1, 2
  HAVING FLOOR(SUM(va * vb) / (sqrt(SUM(va * va)) * sqrt(SUM(vb * vb)))
               * 1000000 + 0.5) >= {thr_e6}
)"""


def _embedding_near_dup_sql(threshold: float = 0.92) -> str:
    return f"""
WITH {_embedding_pairs_ctes(threshold)}
SELECT vec_id, dup_of, CAST(FLOOR(sim * 100 + 0.5) AS BIGINT) AS sim_pct
FROM epairs
"""


def _semantic_dedup_sql(threshold: float = 0.35) -> str:
    """Oracle for ``ann.semantic_dedup``: greedy keep-lowest-id over the
    near-dup pair relation at the SemDeDup threshold."""
    return f"""
WITH {_embedding_pairs_ctes(threshold)},
drop_min AS (
  SELECT vec_id, MIN(dup_of) AS dup_of_min FROM epairs GROUP BY 1
)
SELECT e.vec_id,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep,
       CAST(COALESCE(d.dup_of_min, -1) AS BIGINT) AS dup_of
FROM embeddings e LEFT JOIN drop_min d ON d.vec_id = e.vec_id
"""


def _span_invariant_sql() -> str:
    """Oracle for ``geo.q_span_invariant``: the identical order-sensitive
    span-sequence fold computed in SQL from the RAW synth files — char
    powers and span powers as recursive mod-2^64 CTEs; the span-hash ×
    span-power product uses the split multiply (both operands are full
    64-bit columns)."""
    # column×column mod-2^64 multiply: x*y = ((x>>32)*y mod 2^32)<<32 + (x&0xffffffff)*y
    mul = (
        f"(((sh2 % 4294967296) * pw2.p + "
        f"((sh2 // 4294967296) * pw2.p % 4294967296) * 4294967296) % {_U64})"
    )
    return f"""
WITH d AS (
  SELECT doc_id, spans FROM read_parquet('{_SYNTH_001}/documents/*.parquet')
),
ix AS MATERIALIZED (
  SELECT doc_id, len(spans) AS ns, CAST(i AS BIGINT) AS i,
         spans[CAST(i AS INT)].kind || chr(1) ||
         spans[CAST(i AS INT)].text || chr(1) ||
         spans[CAST(i AS INT)].media_ref AS s,
         CAST(spans[CAST(i AS INT)]."offset" AS BIGINT) AS off
  FROM d, unnest(range(1, len(spans) + 1)) AS u(i)
),
pw AS (
  WITH RECURSIVE pr(j, p) AS (
    SELECT 0, CAST(1 AS HUGEINT)
    UNION ALL SELECT j + 1, (p * 257) % {_U64} FROM pr
    WHERE j < (SELECT MAX(length(s)) FROM ix)
  ) SELECT * FROM pr
),
ch AS MATERIALIZED (
  SELECT doc_id, i, CAST(j AS BIGINT) AS j,
         CAST(ord(substr(s, CAST(j AS INT), 1)) AS HUGEINT) AS b,
         CAST(length(s) AS BIGINT) AS L
  FROM ix, unnest(range(1, length(s) + 1)) AS u(j)
),
sh AS MATERIALIZED (
  SELECT ch.doc_id, ch.i, SUM(ch.b * pw.p) % {_U64} AS h
  FROM ch JOIN pw ON pw.j = ch.L - ch.j GROUP BY 1, 2
),
sh2t AS MATERIALIZED (
  SELECT sh.doc_id, sh.i, ix.ns,
         (sh.h + CAST(ix.off AS HUGEINT) * {_GOLD}) % {_U64} AS sh2
  FROM sh JOIN ix ON ix.doc_id = sh.doc_id AND ix.i = sh.i
),
pw2 AS (
  WITH RECURSIVE pr2(j, p) AS (
    SELECT 0, CAST(1 AS HUGEINT)
    UNION ALL SELECT j + 1, (p * 257) % {_U64} FROM pr2
    WHERE j < (SELECT MAX(ns) FROM ix)
  ) SELECT * FROM pr2
),
fold AS (
  SELECT t.doc_id, MAX(t.ns) AS ns,
         SUM({mul}) % {_U64} AS h
  FROM sh2t t JOIN pw2 ON pw2.j = t.ns - t.i
  GROUP BY 1
)
SELECT doc_id, CAST(ns AS BIGINT) AS n_spans,
       {_u2s('h')} AS seq_hash
FROM fold
"""


def _q_embedding_near_dup(sf_dir: str) -> Any:
    """At the 0.92 threshold this corpus legitimately has zero pairs, and
    ``Dataset.to_pandas()`` on an empty dataset drops columns (CLAUDE.md
    quirk) — materialize to a TYPED Arrow table so the driver's schema
    compare sees the real columns."""
    import pyarrow as pa

    import ray

    from osm_data_3d_tiles_ray.pipelines.ann import embedding_near_dup

    ds = embedding_near_dup(sf_dir)
    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows or t.num_columns]
    empty = pa.table(
        {
            "vec_id": pa.array([], type=pa.int64()),
            "dup_of": pa.array([], type=pa.int64()),
            "sim_pct": pa.array([], type=pa.int64()),
        }
    )
    if not parts:
        return empty
    tbl = pa.concat_tables([p.select(empty.column_names) for p in parts])
    return tbl if tbl.num_rows or tbl.num_columns else empty


def _q_geometry_stats(sf_dir: str) -> Any:
    """Per-tile geometry stats through the corpus-keyed checkpoint
    (VERDICT r4 item 5's reuse option): the full Build3D pass is the
    single most expensive upstream in the sweep and its per-tile stats
    rows are a pure function of the corpus, so they materialize once per
    corpus state; the bench FLAGSHIP calls geometry_stats() directly (no
    checkpoint) and keeps measuring the real build."""
    import ray.data

    from osm_data_3d_tiles_ray.pipelines.buildings import geometry_stats
    from osm_data_3d_tiles_ray.state.checkpoint import (
        corpus_key,
        parquet_checkpoint,
    )
    from osm_data_3d_tiles_ray.synth.generator import sf_from_dir

    root = ensure_synth(sf_from_dir(sf_dir))
    return parquet_checkpoint(
        "geo_geometry_stats",
        corpus_key([str(root / "documents")]),
        lambda: geometry_stats(ray.data.read_parquet(str(root / "documents"))),
    )


def _q_tile_compression(sf_dir: str) -> Any:
    import ray.data

    from osm_data_3d_tiles_ray.pipelines.buildings import tile_compression
    from osm_data_3d_tiles_ray.synth.generator import sf_from_dir

    root = ensure_synth(sf_from_dir(sf_dir))
    return tile_compression(ray.data.read_parquet(str(root / "documents")))


def _q_media_features(sf_dir: str) -> Any:
    from osm_data_3d_tiles_ray.stages.media import media_features

    return media_features(sf_dir)


def _q_media_frame_sample(sf_dir: str) -> Any:
    from osm_data_3d_tiles_ray.stages.media import media_frame_sample

    return media_frame_sample(sf_dir)


def _q_media_audio_windows(sf_dir: str) -> Any:
    from osm_data_3d_tiles_ray.stages.media import media_audio_windows

    return media_audio_windows(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from osm_data_3d_tiles_ray.pipelines import (
        ann,
        corpus_stats,
        diagnostics,
        dsir,
        events,
        geo,
        mining,
        overlap,
        rangejoin,
        relational,
        sampling,
        storage,
        textops,
    )

    return {
        # geo engine core (SURVEY.md §2: S2/M1-M12, J1, A1, G18-adjacent)
        "geo_parse": geo.q_parse,
        "geo_assignments": geo.q_assignments,
        "geo_tile_stats": geo.q_tile_stats,
        # integer-exact PageRank over occupied-tile adjacency (iterative
        # graph shape: one keyed exchange per round, state on self rows)
        "geo_tile_pagerank": geo.q_tile_pagerank,
        # shuffle-key skew audit (hot cells + salt factor, north-rule
        # "salted-key skew splitting" diagnostic)
        "geo_skew_audit": geo.q_skew_audit,
        "geo_zoom_rollup": geo.q_zoom_rollup,
        "geo_hexbin": geo.q_hexbin,
        "geo_overlap_pairs": geo.q_overlap_pairs,
        "geo_tile_smooth": geo.q_tile_smooth,
        "geo_local_moran": geo.q_local_moran,
        "geo_dem_slope": geo.q_dem_slope,
        "geo_zorder": geo.q_zorder,
        "geo_hilbert": geo.q_hilbert,
        "geo_nn_within": geo.q_nn_within,
        "geo_media_density": geo.q_media_density,
        "geo_ring_areas": geo.q_ring_areas,
        "geo_edge_stats": geo.q_edge_stats,
        "geo_tile_height_p90": geo.q_tile_height_p90,
        "geo_tile_orientation": geo.q_tile_orientation,
        "geo_radius_count": geo.q_radius_count,
        "geo_rasterize": geo.q_rasterize,
        "geo_media_dispersion": geo.q_media_dispersion,
        "geo_hex_smooth": geo.q_hex_smooth,
        "geo_text_density": geo.q_text_density,
        "geo_idw": geo.q_idw,
        # iterative star-rewriting CC — not SQL-expressible at this shape
        # (transitive-closure CTE is ~n² pairs); exact BFS oracle in
        # tests/test_round4c_ops.py at sf0.001 AND sf0.01
        "geo_tile_components": geo.q_tile_components,
        # bounded-horizon multi-source BFS (isochrone) from the densest tiles
        "geo_tile_bfs": geo.q_tile_bfs,
        # the north rule's per-row span-sequence invariant, driver-gated
        "geo_span_invariant": geo.q_span_invariant,
        "geo_height_median": geo.q_height_median,
        "geo_norm_params": geo.q_norm_params,
        "geo_cell_cover": geo.q_cell_cover,
        "geo_cell_cover_exact": geo.q_cell_cover_exact,
        "geo_knn": geo.q_knn,
        "geo_knn_bucketed": geo.q_knn_bucketed,
        "geo_point_bbox_join": geo.q_point_bbox_join,
        "geo_point_in_polygon": geo.q_point_in_polygon,
        "geo_dem_sample": geo.q_dem_sample,
        "geo_dem_zonal": geo.q_dem_zonal,
        "geo_batch_table": geo.q_batch_table,
        "geo_labels": geo.q_labels,
        "geo_lod_sample": geo.q_lod_sample,
        "geo_sample_points": geo.q_sample_points,
        "geo_simplify": geo.q_simplify,
        # S2-analog spherical index (north-star companions): cube-face +
        # quadratic ST + Hilbert cell per centroid; bbox covering on an
        # actor pool with a per-actor Hilbert memo ("S2 covering cache")
        "geo_s2_cells": geo.q_s2_cells,
        "geo_s2_cover": geo.q_s2_cover,
        # occupied-cell 8-neighborhood on the spherical grid (tag-union
        # occupancy join — no broadcast of the occupied-cell set)
        "geo_s2_neighbors": geo.q_s2_neighbors,
        # implicit-tiling availability subtrees (z12 roots, depth 4)
        "geo_subtree_avail": geo.q_subtree_avail,
        # spec-shaped .subtree binaries written + decoded back; the oracle
        # recomputes the decoded counts from the availability words, so a
        # green row certifies the binary artifact, not just the aggregate
        "geo_subtree_files": geo.q_subtree_files,
        # full geometry build (vertex counts not SQL-expressible → rows-only
        # check here; pytest goldens cover the kernels, SURVEY.md §5.1)
        "geo_geometry_stats": _q_geometry_stats,
        # Draco-equivalent per-tile mesh compression (weld + delta/deflate;
        # codec roundtrip is pytest-oracled, sizes not SQL-expressible)
        "tile_compression": _q_tile_compression,
        # training-data companions
        "dedup_exact": textops.dedup_exact,
        "text_stats": textops.text_stats,
        "lang_quality": textops.lang_quality,
        "minhash_near_dup": textops.minhash_near_dup,
        "simhash_near_dup": textops.simhash_near_dup_checkpointed,
        "edit_distance_near_dup": textops.edit_distance_near_dup,
        "jaccard_ngram_pairs": textops.jaccard_ngram_pairs,
        "embedding_near_dup": _q_embedding_near_dup,
        "doc_fingerprint": textops.doc_fingerprint,
        "media_features": _q_media_features,
        "media_frame_sample": _q_media_frame_sample,
        "media_audio_windows": _q_media_audio_windows,
        "vocab_growth": corpus_stats.vocab_growth,
        "source_top_terms": corpus_stats.source_top_terms,
        "ngram_novelty": corpus_stats.ngram_novelty,
        "span_mix": corpus_stats.span_mix,
        "media_usage": corpus_stats.media_usage,
        "media_cooccurrence": corpus_stats.media_cooccurrence,
        "span_transitions": corpus_stats.span_transitions,
        "span_gap_stats": corpus_stats.span_gap_stats,
        "interleaved_pack": corpus_stats.interleaved_pack_checkpointed,
        "pack_stats": corpus_stats.pack_stats,
        "span_dedup": corpus_stats.span_dedup,
        "media_context": corpus_stats.media_context,
        "ann_topk": ann.ann_topk,
        # integer-exact distributed Lloyd k-means (iterative-ML shape with
        # a value-exact oracle: unrolled SQL rounds mirror every iteration)
        "kmeans_exact": ann.kmeans_exact,
        "ann_lsh_topk": ann.ann_lsh_topk,
        "ann_mmr_select": ann.mmr_select,
        "ann_kcenter_select": ann.kcenter_select,
        "ann_ivf_topk": ann.ann_ivf_topk_validated,
        "events_hourly": events.hourly_by_type,
        "events_user_daily": events.user_daily_activity,
        "events_sessionize": events.sessionize,
        "events_asof_last_order": events.asof_last_order,
        "events_distinct_users_hll": events.distinct_users_hll,
        "events_distinct_users_exact": events.distinct_users_exact,
        "events_sliding_window": events.sliding_window,
        "events_type_quantiles": events.type_quantiles,
        "events_quantiles_tdigest": events.value_quantiles_tdigest,
        "events_user_value_rank": events.user_value_rank,
        "events_value_outliers": events.value_outliers,
        "events_top_users": events.top_users,
        "events_funnel": events.funnel,
        "events_percent_rank": events.value_percent_rank,
        "lang_id": textops.lang_id,
        "token_count_bpe": textops.token_count_bpe,
        "tf_idf": textops.tf_idf,
        "seq_pack": textops.seq_pack,
        "top_terms": textops.top_terms,
        "top_terms_by_lang": textops.top_terms_by_lang,
        "term_counts_cms": textops.term_counts_cms,
        "source_mixture": textops.source_mixture,
        "stratified_sample": textops.stratified_sample,
        "doc_repetition": textops.doc_repetition,
        "quality_filter": textops.quality_filter,
        "chunk_dedup": textops.chunk_dedup,
        "embedding_centroid_sim": ann.embedding_centroid_sim,
        "ann_range_search": ann.range_search,
        "semantic_dedup": ann.semantic_dedup,
        "embedding_random_projection": ann.random_projection,
        "embedding_pq": ann.product_quantize_validated,
        "embedding_class_cohesion": ann.class_cohesion,
        "text_embedding_fusion": ann.text_embedding_fusion,
        "bm25_topk": textops.bm25_topk,
        "bigram_lm_score": textops.bigram_lm_score,
        "corpus_prep": textops.corpus_prep,
        "source_contamination": textops.source_contamination,
        "bpe_merge_candidates": textops.bpe_merge_candidates,
        "winnow_fingerprints": textops.winnow_fingerprints,
        "jaccard_word_pairs": textops.jaccard_word_pairs,
        "token_budget_mix": textops.token_budget_mix,
        "decontaminate": textops.decontaminate,
        "dedup_clusters": textops.dedup_clusters,
        "leakage_safe_split": textops.leakage_safe_split,
        # generic relational machinery (partial-combine aggregates,
        # broadcast join, global top-k) over the TPC-H-ish tables
        "rel_pricing_summary": relational.pricing_summary,
        "rel_orders_by_segment": relational.orders_by_segment,
        "rel_top_suppliers": relational.top_suppliers,
        "rel_customers_no_orders": relational.customers_no_orders,
        "rel_shipping_priority": relational.shipping_priority,
        "rel_shipping_priority_bloom": functools.partial(
            relational.shipping_priority, use_bloom=True
        ),
        "rel_late_shipment_priority": relational.late_shipment_priority,
        "rel_running_totals": relational.running_customer_totals,
        "rel_revenue_by_nation": relational.revenue_by_nation,
        "rel_forecast_revenue": relational.forecast_revenue,
        "rel_promo_revenue": relational.promo_revenue,
        "rel_large_orders": relational.large_orders,
        "rel_returned_customers": relational.returned_customers,
        "rel_parts_supplier_count": relational.parts_supplier_count,
        "rel_linestatus_priority": relational.linestatus_priority,
        "rel_customer_order_counts": relational.customer_order_counts,
        "rel_monthly_growth": relational.monthly_revenue_growth,
        "rel_cohort_retention": relational.cohort_retention,
        "dup_source_matrix": textops.dup_source_matrix,
        "rel_min_balance_supplier": relational.min_balance_supplier,
        "rel_volume_shipping": relational.volume_shipping,
        "rel_small_qty_revenue": relational.small_qty_revenue,
        "rel_important_parts": relational.important_parts,
        "rel_market_share": relational.market_share,
        "rel_sales_opportunity": relational.sales_opportunity,
        "rel_nation_trade_balance": relational.nation_trade_balance,
        "rel_blame_supplier": relational.blame_supplier,
        "rel_spend_deciles": relational.spend_deciles,
        "rel_order_gap_histogram": relational.order_gap_histogram,
        "rel_yearly_top_supplier": relational.yearly_top_supplier,
        "rel_discounted_revenue": relational.discounted_revenue,
        "rel_revenue_rollup": relational.revenue_rollup,
        "rel_product_profit": relational.product_profit,
        "rel_promo_suppliers": relational.promo_suppliers,
        "events_watermark_late": events.watermark_late_counts,
        # tumbling event-time windows with allowed lateness (Flink window
        # lifecycle, batch-exact over the jittered-arrival replay)
        "events_tumbling_lateness": events.tumbling_lateness,
        "events_user_gaps": events.user_gap_stats,
        "events_value_histogram": events.value_histogram,
        "events_distinct_users_by_type": events.distinct_users_by_type,
        "events_props_hist": events.props_k_histogram,
        "events_retention": events.retention_cohorts,
        "events_hourly_anomaly": events.hourly_anomaly,
        "events_value_zscore": events.value_zscore,
        "events_type_transitions": events.type_transitions,
        "events_windowed_dedup": events.windowed_dedup,
        "events_grid_smooth": events.grid_smooth,
        "events_value_median_exact": events.value_median_exact,
        "events_type_p90_exact": events.type_p90_exact,
        "events_session_ids": events.session_ids,
        "events_session_paths": events.session_paths,
        "reservoir_sample": sampling.reservoir_sample,
        "domain_mix": corpus_stats.domain_mix,
        "geo_distance_bands": geo.q_distance_bands,
        "doc_chunks": textops.doc_chunks,
        "term_scrub": textops.term_scrub,
        "quality_top_percent": textops.quality_top_percent,
        "lang_confusion": textops.lang_confusion,
        "class_balanced_sample": textops.class_balanced_sample,
        "events_attribution_window": rangejoin.event_attribution,
        "geo_neighbor_density": rangejoin.neighbor_density,
        "dsir_select": dsir.dsir_score,
        "ccnet_ppl_buckets": dsir.ccnet_buckets,
        "rel_skyline_orders": mining.skyline_orders,
        "rel_basket_pairs": mining.basket_pairs,
        "events_pps_sample": diagnostics.pps_sample,
        "events_type_value_corr": diagnostics.type_value_corr,
        "source_lang_pmi": diagnostics.source_lang_pmi,
        "dup_span_coverage": textops.dup_span_coverage,
        # content-defined chunking (FastCDC-shape local-boundary cuts) +
        # exact chunk dedup across the corpus
        "cdc_chunk_dedup": textops.cdc_chunk_dedup,
        # C4-style canonicalize-then-exact dedup
        "normalized_dedup": textops.normalized_dedup,
        # asymmetric delta dedup: new shard vs the existing base corpus
        "delta_dedup": textops.delta_dedup,
        "curriculum_rank": textops.curriculum_rank,
        "geo_range_join_sample": sampling.range_join_sample,
        "rle_run_stats": storage.rle_run_stats,
        "source_token_entropy": textops.source_token_entropy,
        "rel_rfm_segments": mining.rfm_segments,
        "events_weighted_join_sample": sampling.weighted_join_sample,
        "source_vocab_overlap": overlap.source_vocab_overlap,
        "events_decayed_score": events.decayed_user_score,
        "curation_matrix": dsir.curation_matrix_checkpointed,
        "events_type_winsorized": events.type_winsorized,
        "rel_revenue_concentration": mining.revenue_concentration,
        "rel_spend_gini": mining.spend_gini,
        "lang_length_drift": diagnostics.lang_length_drift,
        "events_daily_cusum": events.daily_cusum,
        "events_hourly_uniformity": events.hourly_uniformity,
        "rel_nation_spend_gini": mining.nation_spend_gini,
        "events_daily_trend": events.daily_trend,
        "curation_funnel": dsir.curation_funnel,
        "rel_priority_segment_chi2": diagnostics.priority_segment_independence,
        "events_type_top_values": events.type_top_values,
    }


_CURATION_MATRIX_SQL = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), wc AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY 1, 2),
m AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words, MAX(c) AS top
      FROM wc GROUP BY 1),
tq AS (SELECT doc_id, length(text) AS n_chars,
              length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
       FROM documents),
q AS (SELECT m.doc_id,
       CAST(CASE WHEN m.n_words >= 12 AND 4 * m.top <= m.n_words
                  AND 10 * tq.n_alpha >= 7 * tq.n_chars THEN 1 ELSE 0 END
            AS BIGINT) AS keep
      FROM m JOIN tq ON m.doc_id = tq.doc_id),
dk AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
tt AS (SELECT doc_id, source,
              list_filter(string_split(text, ' '), x -> x <> '') AS a
       FROM documents),
ix AS (SELECT doc_id, source, a, unnest(range(1, len(a) - 1)) AS i FROM tt),
g AS (SELECT doc_id, source, array_to_string(a[i:i+2], ' ') AS ng FROM ix),
ev AS (SELECT DISTINCT ng FROM g WHERE source = 'src19'),
cont AS (SELECT DISTINCT g.doc_id
         FROM g JOIN ev USING (ng) WHERE g.source <> 'src19'),
td AS (SELECT doc_id, source,
              unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS wd
       FROM documents),
agg AS (SELECT wd,
               CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                    AS BIGINT) AS ct,
               CAST(COUNT(*) AS BIGINT) AS c_all
        FROM td GROUP BY 1),
tot AS (SELECT SUM(ct) AS tt2, SUM(c_all) - SUM(ct) AS tr, COUNT(*) AS v
        FROM agg),
ds AS (SELECT td.doc_id,
        CAST(CAST(SUM(CAST(FLOOR(LN((agg.ct + 1.0) / (tot.tt2 + tot.v))
                                 * 1000000 + 0.5) AS BIGINT)
                - CAST(FLOOR(LN((agg.c_all - agg.ct + 1.0) / (tot.tr + tot.v))
                             * 1000000 + 0.5) AS BIGINT)) > 0 AS BIGINT)
             AS BIGINT) AS kept
       FROM td JOIN agg ON td.wd = agg.wd CROSS JOIN tot GROUP BY 1)
SELECT d.doc_id,
  COALESCE(q.keep, 0) AS q_keep,
  CAST(CASE WHEN dk.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
    AS dedup_keeper,
  CAST(CASE WHEN cont.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
    AS contaminated,
  COALESCE(ds.kept, 0) AS dsir_kept,
  COALESCE(q.keep, 0) * CASE WHEN dk.doc_id IS NOT NULL THEN 1 ELSE 0 END
    * (1 - CASE WHEN cont.doc_id IS NOT NULL THEN 1 ELSE 0 END)
    * COALESCE(ds.kept, 0) AS selected
FROM documents d
LEFT JOIN q ON q.doc_id = d.doc_id
LEFT JOIN dk ON dk.doc_id = d.doc_id
LEFT JOIN cont ON cont.doc_id = d.doc_id
LEFT JOIN ds ON ds.doc_id = d.doc_id
"""


def oracle_sql() -> dict[str, str]:
    b = f"read_parquet('{_SYNTH_001}/buildings/*.parquet')"
    dem = f"read_parquet('{_SYNTH_001}/dem.parquet')"
    qp = f"read_parquet('{_SYNTH_001}/query_points.parquet')"
    return {
        "geo_parse": f"""
SELECT 'doc_' || lpad(CAST(osm_id AS VARCHAR), 12, '0') AS doc_id,
       osm_id, osm_type,
       CAST(len(ring_offsets) AS INTEGER) AS n_rings,
       CAST(len(coords) / 2 AS BIGINT) AS n_vertices,
       height, levels, roof_type, name,
       minx, miny, maxx, maxy, centroid_x, centroid_y
FROM {b}
""",
        "geo_assignments": f"""
SELECT osm_id, CAST(16 AS INTEGER) AS tile_z, tile_x, tile_y
FROM ({_TILE_SQL})
""",
        "geo_tile_stats": f"""
SELECT tile_x, tile_y, CAST(COUNT(*) AS BIGINT) AS batch_length
FROM ({_TILE_SQL}) GROUP BY tile_x, tile_y
""",
        "geo_tile_pagerank": _tile_pagerank_sql(),
        "geo_skew_audit": f"""
WITH c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ({_TILE_SQL}) GROUP BY tile_x, tile_y
), r AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt) AS rn FROM c
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tiles, CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(MAX(cnt) AS BIGINT) AS max_count
  FROM c
)
SELECT s.n_tiles, s.total, s.max_count,
       (SELECT cnt FROM r WHERE rn = (s.n_tiles - 1) * 99 // 100 + 1) AS p99_count,
       s.total * 1000000 // s.n_tiles AS mean_e6,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c
        WHERE cnt * s.n_tiles > 8 * s.total) AS hot_tiles,
       (s.max_count * s.n_tiles + 8 * s.total - 1) // (8 * s.total) AS salt_factor
FROM s
""",
        # quadtree pyramid: leaf (z16) counts rolled up to z10 by >> shifts
        "geo_zoom_rollup": f"""
WITH t AS ({_TILE_SQL}),
z AS (SELECT unnest(range(10, 17)) AS zl)
SELECT CAST(z.zl AS INTEGER) AS tile_z,
       CAST(t.tile_x >> (16 - z.zl) AS INTEGER) AS tile_x,
       CAST(t.tile_y >> (16 - z.zl) AS INTEGER) AS tile_y,
       CAST(COUNT(*) AS BIGINT) AS n_buildings
FROM t CROSS JOIN z
GROUP BY 1, 2, 3
""",
        # hex grid (H3 analog): axial coords + cube rounding, every float
        # op mirrored verbatim from pipelines/geo.py:hex_axial
        "geo_hexbin": f"""
WITH f AS (
  SELECT ({_HEX_S3!r} * centroid_x - centroid_y / 3.0) / 1000.0 AS cx,
         (centroid_y * {_HEX_TT!r}) / 1000.0 AS cz,
         height
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
), r AS (
  SELECT FLOOR(cx + 0.5) AS rx, FLOOR((-cx - cz) + 0.5) AS ry,
         FLOOR(cz + 0.5) AS rz,
         ABS(FLOOR(cx + 0.5) - cx) AS dx,
         ABS(FLOOR((-cx - cz) + 0.5) - (-cx - cz)) AS dy,
         ABS(FLOOR(cz + 0.5) - cz) AS dz,
         height
  FROM f
), h AS (
  SELECT CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS hq,
         CASE WHEN (dx > dy AND dx > dz) OR dy > dz THEN rz
              ELSE -rx - ry END AS hr,
         height
  FROM r
)
SELECT CAST(hq AS BIGINT) AS hex_q, CAST(hr AS BIGINT) AS hex_r,
       CAST(COUNT(*) AS BIGINT) AS n_buildings,
       CAST(SUM(CASE WHEN height IS NOT NULL
                     THEN FLOOR(height * 10 + 0.5) ELSE 0 END) AS BIGINT)
           AS sum_height_dm
FROM h GROUP BY 1, 2
""",
        # bbox-intersection self-join (closed intervals); area expression
        # mirrors pipelines/geo.py:q_overlap_pairs bit-for-bit
        "geo_overlap_pairs": f"""
SELECT a.osm_id AS osm_a, b.osm_id AS osm_b,
       CAST(FLOOR(((LEAST(a.maxx, b.maxx) - GREATEST(a.minx, b.minx))
                   * (LEAST(a.maxy, b.maxy) - GREATEST(a.miny, b.miny)))
                  * 100 + 0.5) AS BIGINT) AS ov_area_c
FROM read_parquet('{_SYNTH_001}/buildings/*.parquet') a
JOIN read_parquet('{_SYNTH_001}/buildings/*.parquet') b
  ON a.osm_id < b.osm_id
 AND a.minx <= b.maxx AND b.minx <= a.maxx
 AND a.miny <= b.maxy AND b.miny <= a.maxy
""",
        "geo_height_median": f"""
WITH s AS (
  SELECT COALESCE(roof_type, 'none') AS roof_type,
         CAST(FLOOR(height * 10 + 0.5) AS BIGINT) AS dm
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
  WHERE height IS NOT NULL
), h AS (
  SELECT roof_type, dm, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY 1, 2
), c AS (
  SELECT roof_type, dm, n,
         SUM(n) OVER (PARTITION BY roof_type ORDER BY dm) AS cum,
         SUM(n) OVER (PARTITION BY roof_type) AS tot
  FROM h
)
SELECT roof_type, CAST(MAX(tot) AS BIGINT) AS n_buildings,
       CAST(MIN(dm) AS BIGINT) AS median_dm
FROM c WHERE 2 * cum >= tot GROUP BY 1
""",
        "geo_tile_smooth": f"""
WITH g AS (
  SELECT tile_x, tile_y, CAST(COUNT(*) AS BIGINT) AS c
  FROM ({_TILE_SQL}) GROUP BY tile_x, tile_y
)
SELECT CAST(a.tile_x AS BIGINT) AS tile_x, CAST(a.tile_y AS BIGINT) AS tile_y,
       a.c AS n_buildings, CAST(SUM(b.c) AS BIGINT) AS smooth3x3
FROM g a JOIN g b
  ON abs(a.tile_x - b.tile_x) <= 1 AND abs(a.tile_y - b.tile_y) <= 1
GROUP BY 1, 2, 3
""",
        # raster slope/aspect: z widens to DOUBLE before any arithmetic
        # (DuckDB FLOAT-FLOAT would round to float32 and diverge from
        # numpy's float64); expression tree mirrors geo.q_dem_slope
        "geo_dem_slope": f"""
WITH d AS (
  SELECT row, col, CAST(z AS DOUBLE) AS z, dx, dy
  FROM read_parquet('{_SYNTH_001}/dem.parquet')
), g AS (
  SELECT a.row AS row, a.col AS col,
         (r.z - l.z) / (2.0 * a.dx) AS dzdx,
         (dn.z - up.z) / (2.0 * a.dy) AS dzdy
  FROM d a
  JOIN d l  ON l.row  = a.row     AND l.col  = a.col - 1
  JOIN d r  ON r.row  = a.row     AND r.col  = a.col + 1
  JOIN d up ON up.row = a.row - 1 AND up.col = a.col
  JOIN d dn ON dn.row = a.row + 1 AND dn.col = a.col
)
SELECT CAST(row AS BIGINT) AS row, CAST(col AS BIGINT) AS col,
       CAST(FLOOR(dzdx * 1000000 + 0.5) AS BIGINT) AS dzdx_e6,
       CAST(FLOOR(dzdy * 1000000 + 0.5) AS BIGINT) AS dzdy_e6,
       CAST(FLOOR(sqrt(dzdx * dzdx + dzdy * dzdy) * 1000000 + 0.5)
            AS BIGINT) AS slope_e6,
       CAST(CASE WHEN ABS(dzdx) >= ABS(dzdy) THEN 4 ELSE 0 END
            + CASE WHEN dzdy >= 0 THEN 2 ELSE 0 END
            + CASE WHEN dzdx >= 0 THEN 1 ELSE 0 END AS BIGINT)
           AS aspect_class
FROM g
""",
        # Morton (Z-order) index: the 16-bit bit-spread ladder is pure
        # integer arithmetic — identical on both engines
        "geo_zorder": f"""
WITH t AS (
  SELECT osm_id,
         CAST(FLOOR((centroid_x + {_W}) / {_T}) AS BIGINT) AS tx,
         CAST(FLOOR(({_W} - centroid_y) / {_T}) AS BIGINT) AS ty
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
), s1 AS (
  SELECT osm_id, tx, ty,
         ((tx | (tx << 8)) & 16711935) AS x, ((ty | (ty << 8)) & 16711935) AS y
  FROM t
), s2 AS (
  SELECT osm_id, tx, ty,
         ((x | (x << 4)) & 252645135) AS x, ((y | (y << 4)) & 252645135) AS y
  FROM s1
), s3 AS (
  SELECT osm_id, tx, ty,
         ((x | (x << 2)) & 858993459) AS x, ((y | (y << 2)) & 858993459) AS y
  FROM s2
), s4 AS (
  SELECT osm_id, tx, ty,
         ((x | (x << 1)) & 1431655765) AS x, ((y | (y << 1)) & 1431655765) AS y
  FROM s3
)
SELECT osm_id, CAST(tx AS INTEGER) AS tile_x, CAST(ty AS INTEGER) AS tile_y,
       CAST(x | (y << 1) AS BIGINT) AS morton,
       CAST((x | (y << 1)) >> 22 AS BIGINT) AS shard
FROM s4
""",
        # Hilbert index over the z16 tile grid: reuses the S2 cells'
        # recursive-CTE xy2d (integer-identical to geom/s2.py:hilbert_xy2d)
        "geo_hilbert": f"""
WITH RECURSIVE t AS (
  SELECT osm_id, CAST(0 AS BIGINT) AS face,
         CAST(FLOOR((centroid_x + {_W}) / {_T}) AS BIGINT) AS i,
         CAST(FLOOR(({_W} - centroid_y) / {_T}) AS BIGINT) AS j
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
), {_hilbert_sql('t', 16)}
SELECT osm_id, CAST(i AS INTEGER) AS tile_x, CAST(j AS INTEGER) AS tile_y,
       d AS hilbert_d, CAST(d >> 22 AS BIGINT) AS shard
FROM h WHERE s = 0
""",
        # windowed nearest neighbor: candidates replicate to the 9 cells
        # of a 150 m integer grid (quantized mm, offset non-negative so
        # truncating // IS floor), equi-join on cell = the Ray exchange
        "geo_nn_within": f"""
WITH p AS (
  SELECT osm_id,
         CAST(FLOOR(centroid_x * 1000 + 0.5) AS BIGINT) + 20037508343 AS qx,
         CAST(FLOOR(centroid_y * 1000 + 0.5) AS BIGINT) + 20037508343 AS qy
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
), c AS (
  SELECT osm_id, qx, qy, qx // 150000 AS cx, qy // 150000 AS cy FROM p
), offs AS (
  SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                        (1,-1),(1,0),(1,1)) t(dx, dy)
), rep AS (
  SELECT c.osm_id, c.qx, c.qy, c.cx + o.dx AS cx, c.cy + o.dy AS cy
  FROM c CROSS JOIN offs o
), d AS (
  SELECT h.osm_id, r.osm_id AS nn,
         (h.qx - r.qx) * (h.qx - r.qx) + (h.qy - r.qy) * (h.qy - r.qy) AS d2
  FROM c h JOIN rep r ON r.cx = h.cx AND r.cy = h.cy
                     AND r.osm_id <> h.osm_id
), rk AS (
  SELECT osm_id, nn, d2,
         ROW_NUMBER() OVER (PARTITION BY osm_id ORDER BY d2, nn) AS rn
  FROM d
)
SELECT osm_id, nn AS nn_id, CAST(d2 AS BIGINT) AS nn_d2_mm2
FROM rk WHERE rn = 1
""",
        # media spans × map tiles (the interleaved×geo cross): spans join
        # their building through the doc's osm_id tag, exactly as parse does
        "geo_media_density": f"""
WITH sp AS (
  SELECT doc_id, s.kind AS kind, s.text AS txt, s.media_ref AS media_ref
  FROM (SELECT doc_id, unnest(spans) AS s
        FROM read_parquet('{_SYNTH_001}/documents/*.parquet'))
), ids AS (
  SELECT doc_id,
         MAX(CASE WHEN kind = 'tag' AND txt LIKE 'osm_id=%'
                  THEN CAST(substr(txt, 8) AS BIGINT) END) AS osm_id
  FROM sp GROUP BY doc_id
), m AS (
  SELECT ids.osm_id, string_split(sp.media_ref, '/')[3] AS family
  FROM sp JOIN ids USING (doc_id) WHERE sp.kind = 'media'
), b AS (
  SELECT osm_id,
         CAST(FLOOR((centroid_x + {_W}) / {_T}) AS INTEGER) AS tile_x,
         CAST(FLOOR(({_W} - centroid_y) / {_T}) AS INTEGER) AS tile_y
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
)
SELECT tile_x, tile_y, family, CAST(COUNT(*) AS BIGINT) AS n_media
FROM m JOIN b USING (osm_id) GROUP BY 1, 2, 3
""",
        # vector→raster burn: bbox cover expanded cell-by-cell (two nested
        # unnest(range) levels — a single SELECT with two unnests would zip)
        "geo_rasterize": f"""
WITH t AS (
  SELECT t0.osm_id, t0.tile_x, t0.tile_y, t0.tile_x1, t0.tile_y1,
         CASE WHEN b.height IS NOT NULL
              THEN CAST(FLOOR(b.height * 10 + 0.5) AS BIGINT)
              ELSE 0 END AS hdm
  FROM ({_TILE_SQL}) t0
  JOIN read_parquet('{_SYNTH_001}/buildings/*.parquet') b
    ON b.osm_id = t0.osm_id
), cx AS (
  SELECT osm_id, hdm, unnest(range(tile_x, tile_x1 + 1)) AS cell_x,
         tile_y, tile_y1
  FROM t
), c AS (
  SELECT osm_id, hdm, cell_x, unnest(range(tile_y, tile_y1 + 1)) AS cell_y
  FROM cx
)
SELECT CAST(cell_x AS INTEGER) AS cell_x, CAST(cell_y AS INTEGER) AS cell_y,
       CAST(COUNT(*) AS BIGINT) AS n_buildings,
       CAST(MAX(hdm) AS BIGINT) AS max_height_dm,
       CAST(SUM(hdm) AS BIGINT) AS sum_height_dm
FROM c GROUP BY 1, 2
""",
        # per-texture spatial dispersion: distinct-tile counting through the
        # same two-level rollup the engine runs
        "geo_media_dispersion": f"""
WITH sp AS (
  SELECT doc_id, s.kind AS kind, s.text AS txt, s.media_ref AS media_ref
  FROM (SELECT doc_id, unnest(spans) AS s
        FROM read_parquet('{_SYNTH_001}/documents/*.parquet'))
), ids AS (
  SELECT doc_id,
         MAX(CASE WHEN kind = 'tag' AND txt LIKE 'osm_id=%'
                  THEN CAST(substr(txt, 8) AS BIGINT) END) AS osm_id
  FROM sp GROUP BY doc_id
), b AS (
  SELECT osm_id,
         CAST(FLOOR((centroid_x + {_W}) / {_T}) AS INTEGER) AS tile_x,
         CAST(FLOOR(({_W} - centroid_y) / {_T}) AS INTEGER) AS tile_y,
         CAST(FLOOR(centroid_x * 1000 + 0.5) AS BIGINT) AS qcx,
         CAST(FLOOR(centroid_y * 1000 + 0.5) AS BIGINT) AS qcy
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
), g AS (
  SELECT sp.media_ref, b.tile_x, b.tile_y,
         COUNT(*) AS n, SUM(b.qcx) AS scx, SUM(b.qcy) AS scy
  FROM sp JOIN ids USING (doc_id) JOIN b USING (osm_id)
  WHERE sp.kind = 'media'
  GROUP BY 1, 2, 3
)
SELECT media_ref,
       CAST(SUM(n) AS BIGINT) AS n_spans,
       CAST(COUNT(*) AS BIGINT) AS n_tiles,
       CAST(MIN(tile_x) AS INTEGER) AS min_tx,
       CAST(MAX(tile_x) AS INTEGER) AS max_tx,
       CAST(MIN(tile_y) AS INTEGER) AS min_ty,
       CAST(MAX(tile_y) AS INTEGER) AS max_ty,
       CAST(SUM(scx) AS BIGINT) AS sum_cx_mm,
       CAST(SUM(scy) AS BIGINT) AS sum_cy_mm
FROM g GROUP BY 1
""",
        # integer IDW: weights are exact integer quotients of quantized-mm
        # squared distances, so sums and the final quotient are
        # association-proof on both engines
        "geo_idw": f"""
WITH p AS (
  SELECT CAST(FLOOR((centroid_x + {_W}) / {_T}) AS BIGINT) AS tx,
         CAST(FLOOR(({_W} - centroid_y) / {_T}) AS BIGINT) AS ty,
         CAST(FLOOR(centroid_x * 1000 + 0.5) AS BIGINT) AS qpx,
         CAST(FLOOR(centroid_y * 1000 + 0.5) AS BIGINT) AS qpy,
         CASE WHEN height IS NOT NULL
              THEN CAST(FLOOR(height * 10 + 0.5) AS BIGINT) ELSE 0 END AS hdm
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
), cx AS (
  SELECT p.*, tx + unnest(range(-2, 3)) AS cell_x FROM p
), c AS (
  SELECT cx.*, ty + unnest(range(-2, 3)) AS cell_y FROM cx
), w AS (
  SELECT cell_x, cell_y, hdm,
         CAST(1000000000000 AS BIGINT) * 10 //
             GREATEST((qpx - CAST(FLOOR(((cell_x + 0.5) * {_T} - {_W}) * 1000
                                        + 0.5) AS BIGINT))
                      * (qpx - CAST(FLOOR(((cell_x + 0.5) * {_T} - {_W}) * 1000
                                          + 0.5) AS BIGINT))
                      + (qpy - CAST(FLOOR(({_W} - (cell_y + 0.5) * {_T}) * 1000
                                          + 0.5) AS BIGINT))
                      * (qpy - CAST(FLOOR(({_W} - (cell_y + 0.5) * {_T}) * 1000
                                          + 0.5) AS BIGINT)),
                      1000000) AS wgt
  FROM c
)
SELECT CAST(cell_x AS INTEGER) AS cell_x, CAST(cell_y AS INTEGER) AS cell_y,
       CAST(SUM(wgt) AS BIGINT) AS sum_w,
       CAST(SUM(wgt * hdm) AS BIGINT) AS sum_wh,
       CAST(CAST(SUM(wgt * hdm) AS BIGINT) * 1000 //
            GREATEST(CAST(SUM(wgt) AS BIGINT), 1) AS BIGINT) AS idw_e3
FROM w GROUP BY 1, 2
""",
        # text mass per tile: spans fold to per-doc scalars, then the
        # building's centroid tile, mirroring the engine's partial pass
        "geo_text_density": f"""
WITH sp AS (
  SELECT doc_id, s.kind AS kind, s.text AS txt
  FROM (SELECT doc_id, unnest(spans) AS s
        FROM read_parquet('{_SYNTH_001}/documents/*.parquet'))
), per_doc AS (
  SELECT doc_id,
         MAX(CASE WHEN kind = 'tag' AND txt LIKE 'osm_id=%'
                  THEN CAST(substr(txt, 8) AS BIGINT) END) AS osm_id,
         CAST(SUM(CASE WHEN kind = 'text' THEN length(txt) ELSE 0 END)
              AS BIGINT) AS chars,
         CAST(SUM(CASE WHEN kind = 'tag' THEN 1 ELSE 0 END) AS BIGINT)
             AS tags
  FROM sp GROUP BY doc_id
), b AS (
  SELECT osm_id,
         CAST(FLOOR((centroid_x + {_W}) / {_T}) AS INTEGER) AS tile_x,
         CAST(FLOOR(({_W} - centroid_y) / {_T}) AS INTEGER) AS tile_y
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
)
SELECT tile_x, tile_y,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(chars) AS BIGINT) AS text_chars,
       CAST(SUM(tags) AS BIGINT) AS n_tags
FROM per_doc JOIN b USING (osm_id)
GROUP BY 1, 2
""",
        # 7-cell hex neighborhood aggregate over the hexbin grid
        "geo_hex_smooth": f"""
WITH f AS (
  SELECT ({_HEX_S3!r} * centroid_x - centroid_y / 3.0) / 1000.0 AS cx,
         (centroid_y * {_HEX_TT!r}) / 1000.0 AS cz
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
), r AS (
  SELECT FLOOR(cx + 0.5) AS rx, FLOOR((-cx - cz) + 0.5) AS ry,
         FLOOR(cz + 0.5) AS rz,
         ABS(FLOOR(cx + 0.5) - cx) AS dx,
         ABS(FLOOR((-cx - cz) + 0.5) - (-cx - cz)) AS dy,
         ABS(FLOOR(cz + 0.5) - cz) AS dz
  FROM f
), hx AS (
  SELECT CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS hq,
         CASE WHEN (dx > dy AND dx > dz) OR dy > dz THEN rz
              ELSE -rx - ry END AS hr
  FROM r
), h AS (
  SELECT CAST(hq AS BIGINT) AS hex_q, CAST(hr AS BIGINT) AS hex_r,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM hx GROUP BY 1, 2
)
SELECT a.hex_q AS hex_q, a.hex_r AS hex_r, a.n AS n_local,
       CAST(SUM(b.n) AS BIGINT) AS n_hood
FROM h a JOIN h b
  ON (b.hex_q - a.hex_q) IN (-1, 0, 1)
 AND (b.hex_r - a.hex_r) IN (-1, 0, 1)
 AND (b.hex_q - a.hex_q) + (b.hex_r - a.hex_r) IN (-1, 0, 1)
 AND NOT ((b.hex_q - a.hex_q) = -1 AND (b.hex_r - a.hex_r) = -1)
 AND NOT ((b.hex_q - a.hex_q) = 1 AND (b.hex_r - a.hex_r) = 1)
GROUP BY 1, 2, 3
""",
        # integer-exact shoelace per ring: millimeter-quantized coords,
        # differenced edge terms — exact integers, association-proof
        "geo_edge_stats": f"""
WITH b AS (
  SELECT osm_id, coords, ring_offsets, len(coords) // 2 AS nv
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
  WHERE len(coords) > 0 AND len(ring_offsets) > 0
), v AS (
  SELECT osm_id, nv, (generate_subscripts(coords, 1) - 1) AS ci,
         unnest(coords) AS val
  FROM b
), px AS (
  SELECT osm_id, nv, ci // 2 AS vi,
         CAST(FLOOR(MAX(CASE WHEN ci % 2 = 0 THEN val END) * 1000 + 0.5)
              AS BIGINT) AS qx,
         CAST(FLOOR(MAX(CASE WHEN ci % 2 = 1 THEN val END) * 1000 + 0.5)
              AS BIGINT) AS qy
  FROM v GROUP BY 1, 2, 3
), r AS (
  SELECT osm_id, nv, generate_subscripts(ring_offsets, 1) - 1 AS ring_idx,
         unnest(ring_offsets) AS roff
  FROM b
), re AS (
  SELECT osm_id, ring_idx, roff,
         COALESCE(LEAD(roff) OVER (PARTITION BY osm_id ORDER BY ring_idx),
                  nv) AS rend
  FROM r
), e AS (
  SELECT p.osm_id, r.ring_idx, p.vi, p.qx, p.qy,
         LEAD(p.qx) OVER (PARTITION BY p.osm_id, r.ring_idx ORDER BY p.vi)
             - p.qx AS dx,
         LEAD(p.qy) OVER (PARTITION BY p.osm_id, r.ring_idx ORDER BY p.vi)
             - p.qy AS dy
  FROM px p JOIN re r
    ON r.osm_id = p.osm_id AND p.vi >= r.roff AND p.vi < r.rend
), g AS (
  SELECT osm_id, ring_idx, vi, dx, dy, dx * dx + dy * dy AS len2,
         ROW_NUMBER() OVER (
           PARTITION BY osm_id
           ORDER BY dx * dx + dy * dy DESC, ring_idx, vi
         ) AS rk
  FROM e WHERE dx IS NOT NULL
)
SELECT osm_id, CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(ABS(dx) + ABS(dy)) AS BIGINT) AS manh_perim_mm,
       CAST(MAX(len2) AS BIGINT) AS max_edge_len2,
       CAST(MAX(CASE WHEN rk = 1 THEN
             CASE WHEN dy < 0 THEN 4 ELSE 0 END
             + CASE WHEN dx < 0 THEN 2 ELSE 0 END
             + CASE WHEN ABS(dy) > ABS(dx) THEN 1 ELSE 0 END
           END) AS BIGINT) AS max_edge_oct
FROM g GROUP BY osm_id
""",
        # per-tile modal longest-edge octant: the edge CTE of
        # geo_edge_stats + centroid tile + mode with lowest-octant ties
        "geo_tile_orientation": f"""
WITH b AS (
  SELECT osm_id, coords, ring_offsets, len(coords) // 2 AS nv,
         CAST(FLOOR((centroid_x + {_W}) / {_T}) AS BIGINT) AS tile_x,
         CAST(FLOOR(({_W} - centroid_y) / {_T}) AS BIGINT) AS tile_y
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
  WHERE len(coords) > 0 AND len(ring_offsets) > 0
), v AS (
  SELECT osm_id, nv, (generate_subscripts(coords, 1) - 1) AS ci,
         unnest(coords) AS val
  FROM b
), px AS (
  SELECT osm_id, nv, ci // 2 AS vi,
         CAST(FLOOR(MAX(CASE WHEN ci % 2 = 0 THEN val END) * 1000 + 0.5)
              AS BIGINT) AS qx,
         CAST(FLOOR(MAX(CASE WHEN ci % 2 = 1 THEN val END) * 1000 + 0.5)
              AS BIGINT) AS qy
  FROM v GROUP BY 1, 2, 3
), r AS (
  SELECT osm_id, nv, generate_subscripts(ring_offsets, 1) - 1 AS ring_idx,
         unnest(ring_offsets) AS roff
  FROM b
), re AS (
  SELECT osm_id, ring_idx, roff,
         COALESCE(LEAD(roff) OVER (PARTITION BY osm_id ORDER BY ring_idx),
                  nv) AS rend
  FROM r
), e AS (
  SELECT p.osm_id, r.ring_idx, p.vi, p.qx, p.qy,
         LEAD(p.qx) OVER (PARTITION BY p.osm_id, r.ring_idx ORDER BY p.vi)
             - p.qx AS dx,
         LEAD(p.qy) OVER (PARTITION BY p.osm_id, r.ring_idx ORDER BY p.vi)
             - p.qy AS dy
  FROM px p JOIN re r
    ON r.osm_id = p.osm_id AND p.vi >= r.roff AND p.vi < r.rend
), g AS (
  SELECT osm_id, dx, dy,
         ROW_NUMBER() OVER (
           PARTITION BY osm_id
           ORDER BY dx * dx + dy * dy DESC, ring_idx, vi
         ) AS rk
  FROM e WHERE dx IS NOT NULL
), o AS (
  SELECT osm_id,
         MAX(CASE WHEN rk = 1 THEN
               CASE WHEN dy < 0 THEN 4 ELSE 0 END
               + CASE WHEN dx < 0 THEN 2 ELSE 0 END
               + CASE WHEN ABS(dy) > ABS(dx) THEN 1 ELSE 0 END
             END) AS oct
  FROM g GROUP BY osm_id
), tb AS (
  SELECT b.tile_x, b.tile_y, o.oct FROM o JOIN b USING (osm_id)
), c AS (
  SELECT tile_x, tile_y, oct, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tb GROUP BY 1, 2, 3
), m AS (
  SELECT tile_x, tile_y, oct, cnt,
         SUM(cnt) OVER (PARTITION BY tile_x, tile_y) AS n,
         ROW_NUMBER() OVER (PARTITION BY tile_x, tile_y
                            ORDER BY cnt DESC, oct) AS rn
  FROM c
)
SELECT tile_x, tile_y, CAST(n AS BIGINT) AS n_oriented,
       CAST(oct AS BIGINT) AS modal_oct, cnt AS modal_cnt
FROM m WHERE rn = 1
""",
        # windowed density: q_nn_within's replicated-grid join as a LEFT
        # join so isolated buildings keep their zero
        "geo_radius_count": f"""
WITH p AS (
  SELECT osm_id,
         CAST(FLOOR(centroid_x * 1000 + 0.5) AS BIGINT) + 20037508343 AS qx,
         CAST(FLOOR(centroid_y * 1000 + 0.5) AS BIGINT) + 20037508343 AS qy
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
), c AS (
  SELECT osm_id, qx, qy, qx // 150000 AS cx, qy // 150000 AS cy FROM p
), offs AS (
  SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                        (1,-1),(1,0),(1,1)) t(dx, dy)
), rep AS (
  SELECT c.osm_id, c.qx, c.qy, c.cx + o.dx AS cx, c.cy + o.dy AS cy
  FROM c CROSS JOIN offs o
)
SELECT h.osm_id, CAST(COUNT(r.osm_id) AS BIGINT) AS n_within_100m
FROM c h LEFT JOIN rep r
  ON r.cx = h.cx AND r.cy = h.cy AND r.osm_id <> h.osm_id
 AND (h.qx - r.qx) * (h.qx - r.qx) + (h.qy - r.qy) * (h.qy - r.qy)
     <= 10000000000
GROUP BY h.osm_id
""",
        "geo_tile_height_p90": f"""
WITH t AS (
  SELECT CAST(FLOOR((centroid_x + {_W}) / {_T}) AS BIGINT) AS tile_x,
         CAST(FLOOR(({_W} - centroid_y) / {_T}) AS BIGINT) AS tile_y,
         CAST(FLOOR(height * 10 + 0.5) AS BIGINT) AS hdm
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
  WHERE height IS NOT NULL
), c AS (
  SELECT tile_x, tile_y, hdm, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM t GROUP BY 1, 2, 3
), w AS (
  SELECT tile_x, tile_y, hdm,
         SUM(cnt) OVER (PARTITION BY tile_x, tile_y ORDER BY hdm) AS cum,
         SUM(cnt) OVER (PARTITION BY tile_x, tile_y) AS n
  FROM c
)
SELECT tile_x, tile_y, CAST(MAX(n) AS BIGINT) AS n_heights,
       CAST(MIN(CASE WHEN 10 * cum >= 9 * n THEN hdm END) AS BIGINT)
           AS p90_dm
FROM w GROUP BY 1, 2
""",
        "geo_ring_areas": f"""
WITH b AS (
  SELECT osm_id, coords, ring_offsets, len(coords) // 2 AS nv
  FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
  WHERE len(coords) > 0 AND len(ring_offsets) > 0
), v AS (
  SELECT osm_id, nv, (generate_subscripts(coords, 1) - 1) AS ci,
         unnest(coords) AS val
  FROM b
), px AS (
  SELECT osm_id, nv, ci // 2 AS vi,
         CAST(FLOOR(MAX(CASE WHEN ci % 2 = 0 THEN val END) * 1000 + 0.5)
              AS BIGINT) AS qx,
         CAST(FLOOR(MAX(CASE WHEN ci % 2 = 1 THEN val END) * 1000 + 0.5)
              AS BIGINT) AS qy
  FROM v GROUP BY 1, 2, 3
), r AS (
  SELECT osm_id, nv, generate_subscripts(ring_offsets, 1) - 1 AS ring_idx,
         unnest(ring_offsets) AS roff
  FROM b
), re AS (
  SELECT osm_id, ring_idx, roff,
         COALESCE(LEAD(roff) OVER (PARTITION BY osm_id ORDER BY ring_idx),
                  nv) AS rend
  FROM r
), assigned AS (
  SELECT p.osm_id, r.ring_idx, r.roff, r.rend, p.vi, p.qx, p.qy,
         LEAD(p.qx) OVER (PARTITION BY p.osm_id, r.ring_idx ORDER BY p.vi)
             AS nx,
         LEAD(p.qy) OVER (PARTITION BY p.osm_id, r.ring_idx ORDER BY p.vi)
             AS ny
  FROM px p JOIN re r
    ON r.osm_id = p.osm_id AND p.vi >= r.roff AND p.vi < r.rend
)
SELECT osm_id, CAST(ring_idx AS BIGINT) AS ring_idx,
       CAST(rend - roff AS BIGINT) AS ring_nv,
       CAST(COALESCE(SUM(CASE WHEN nx IS NOT NULL
                THEN qx * (ny - qy) - (nx - qx) * qy END), 0) AS BIGINT)
           AS area2_mm2
FROM assigned GROUP BY osm_id, ring_idx, rend, roff
""",
        # LISA components, integer-exact: every term pre-multiplied by
        # the tile count so no float mean enters the comparison
        "geo_local_moran": f"""
WITH g AS (
  SELECT tile_x, tile_y, CAST(COUNT(*) AS BIGINT) AS c
  FROM ({_TILE_SQL}) GROUP BY 1, 2
), t AS (SELECT COUNT(*) AS n, SUM(c) AS s FROM g)
SELECT CAST(a.tile_x AS BIGINT) AS tile_x, CAST(a.tile_y AS BIGINT) AS tile_y,
       CAST(t.n * a.c - t.s AS BIGINT) AS dev,
       CAST(t.n * COALESCE(SUM(b.c), 0) - COUNT(b.c) * t.s AS BIGINT)
           AS nbr_dev_sum,
       CAST(COUNT(b.c) AS BIGINT) AS n_nbrs
FROM g a CROSS JOIN t
LEFT JOIN g b
  ON abs(a.tile_x - b.tile_x) <= 1 AND abs(a.tile_y - b.tile_y) <= 1
 AND NOT (a.tile_x = b.tile_x AND a.tile_y = b.tile_y)
GROUP BY a.tile_x, a.tile_y, a.c, t.n, t.s
""",
        "geo_norm_params": _norm_params_sql(),
        "geo_batch_table": f"""
SELECT osm_id,
       'https://www.openstreetmap.org/' || osm_type || '/' || CAST(osm_id AS VARCHAR) AS osm_url,
       CAST(FLOOR(((minx + maxx) / 2) / {_W} * 180 * 1000000 + 0.5) AS BIGINT) AS box_center_lon_micro,
       CAST(FLOOR((DEGREES(2 * ATAN(EXP(((miny + maxy) / 2) / {_W} * PI()))) - 90) * 1000000 + 0.5) AS BIGINT) AS box_center_lat_micro
FROM read_parquet('{_SYNTH_001}/buildings/*.parquet')
""",
        "geo_cell_cover": f"""
SELECT osm_id,
       CAST((tile_x1 - tile_x + 1) * (tile_y1 - tile_y + 1) AS BIGINT) AS n_cells
FROM ({_TILE_SQL})
""",
        "geo_cell_cover_exact": _cell_cover_exact_sql(),
        "geo_s2_cells": _s2_cells_sql(),
        "geo_s2_cover": _s2_cover_sql(),
        "geo_s2_neighbors": _s2_neighbors_sql(),
        "geo_subtree_avail": _subtree_avail_sql(),
        "geo_subtree_files": f"""
SELECT root_x, root_y, n_tiles,
       CAST(bit_count(int_w0) + bit_count(int_w1) + n_tiles AS BIGINT)
           AS tile_available
FROM ({_subtree_avail_sql()})
""",
        "geo_point_in_polygon": _point_in_polygon_sql(),
        "geo_lod_sample": _lod_sample_sql(),
        "geo_sample_points": _sample_points_sql(),
        "geo_knn": f"""
WITH d AS (
  SELECT q.qid, b.osm_id, q.k,
         sqrt((b.centroid_x - q.x) * (b.centroid_x - q.x)
              + (b.centroid_y - q.y) * (b.centroid_y - q.y)) AS dist
  FROM {qp} q CROSS JOIN {b} b
),
r AS (
  SELECT qid, osm_id, k,
         row_number() OVER (PARTITION BY qid ORDER BY dist, osm_id) AS rn
  FROM d
)
SELECT qid, osm_id, CAST(rn AS INTEGER) AS rank FROM r WHERE rn <= k
""",
        "geo_knn_bucketed": f"""
WITH t AS (SELECT 40075016.685578488 / 8192.0 AS ts),
qb AS (
  SELECT qid, x, y, k,
         CAST(FLOOR((x + 20037508.342789244) / ts) AS BIGINT) AS bx,
         CAST(FLOOR((20037508.342789244 - y) / ts) AS BIGINT) AS by
  FROM {qp} CROSS JOIN t
),
bb AS (
  SELECT osm_id, centroid_x, centroid_y,
         CAST(FLOOR((centroid_x + 20037508.342789244) / ts) AS BIGINT) AS bx,
         CAST(FLOOR((20037508.342789244 - centroid_y) / ts) AS BIGINT) AS by
  FROM {b} CROSS JOIN t
),
d AS (
  SELECT q.qid, b.osm_id, q.k,
         sqrt((b.centroid_x - q.x) * (b.centroid_x - q.x)
              + (b.centroid_y - q.y) * (b.centroid_y - q.y)) AS dist
  FROM qb q JOIN bb b
    ON b.bx BETWEEN q.bx - 1 AND q.bx + 1
   AND b.by BETWEEN q.by - 1 AND q.by + 1
),
r AS (
  SELECT qid, osm_id, k,
         row_number() OVER (PARTITION BY qid ORDER BY dist, osm_id) AS rn
  FROM d
)
SELECT qid, osm_id, CAST(rn AS INTEGER) AS rank FROM r WHERE rn <= k
""",
        "geo_point_bbox_join": f"""
SELECT q.qid, b.osm_id
FROM {qp} q JOIN {b} b
  ON q.x >= b.minx AND q.x <= b.maxx AND q.y >= b.miny AND q.y <= b.maxy
""",
        "geo_dem_sample": f"""
WITH p AS (SELECT osm_id, centroid_x, centroid_y FROM {b}),
m AS (SELECT any_value(x0) AS x0, any_value(y0) AS y0,
             any_value(dx) AS dx, any_value(dy) AS dy,
             MAX(row) + 1 AS n FROM {dem}),
g AS (SELECT p.osm_id,
             (p.centroid_x - m.x0) / m.dx - 0.5 AS gx,
             (p.centroid_y - m.y0) / m.dy - 0.5 AS gy, m.n
      FROM p, m),
i AS (SELECT osm_id, gx, gy, n,
             CAST(LEAST(GREATEST(FLOOR(gx), 0), n - 2) AS INTEGER) AS i0,
             CAST(LEAST(GREATEST(FLOOR(gy), 0), n - 2) AS INTEGER) AS j0
      FROM g),
f AS (SELECT osm_id, i0, j0,
             LEAST(GREATEST(gx - i0, 0), 1) AS fx,
             LEAST(GREATEST(gy - j0, 0), 1) AS fy
      FROM i)
SELECT f.osm_id,
       ROUND((1 - fx) * (1 - fy) * z00.z + fx * (1 - fy) * z10.z
             + (1 - fx) * fy * z01.z + fx * fy * z11.z, 6) AS elevation
FROM f
JOIN {dem} z00 ON z00.row = f.j0     AND z00.col = f.i0
JOIN {dem} z10 ON z10.row = f.j0     AND z10.col = f.i0 + 1
JOIN {dem} z01 ON z01.row = f.j0 + 1 AND z01.col = f.i0
JOIN {dem} z11 ON z11.row = f.j0 + 1 AND z11.col = f.i0 + 1
""",
        "geo_dem_zonal": f"""
WITH c AS (
  SELECT CAST(FLOOR(CAST(z AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS z6,
         x0 + (col + 0.5) * dx AS cx,
         y0 + (row + 0.5) * dy AS cy
  FROM {dem}
), j AS (
  SELECT b.osm_id,
         CAST(COUNT(c.z6) AS BIGINT) AS n_cells,
         CAST(COALESCE(SUM(c.z6), 0) AS BIGINT) AS s
  FROM {b} b LEFT JOIN c
    ON c.cx >= b.minx AND c.cx <= b.maxx
   AND c.cy >= b.miny AND c.cy <= b.maxy
  GROUP BY 1
)
SELECT osm_id, n_cells, s AS sum_z_e6,
       CAST(CASE WHEN n_cells > 0 THEN s // n_cells ELSE 0 END AS BIGINT)
         AS mean_z_e6
FROM j
""",
        "dedup_exact": """
SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY text
""",
        "term_counts_cms": _term_counts_cms_sql(),
        "events_distinct_users_hll": _hll_sql(),
        "geo_tile_components": _tile_components_sql(),
        "geo_tile_bfs": _tile_bfs_sql(),
        "geo_span_invariant": _span_invariant_sql(),
        "ann_lsh_topk": _ann_lsh_topk_sql(),
        "ann_mmr_select": _mmr_select_sql(),
        "ann_kcenter_select": _kcenter_select_sql(),
        "embedding_near_dup": _embedding_near_dup_sql(),
        "semantic_dedup": _semantic_dedup_sql(),
        "delta_dedup": f"""
WITH {_minhash_buckets_ctes()},
thr AS (
  SELECT MAX(doc_id) AS t FROM (
    SELECT doc_id FROM documents ORDER BY doc_id
    LIMIT (SELECT GREATEST((COUNT(*) * 80) // 100, 1) FROM documents))
),
ex AS (
  SELECT n.doc_id, 1 AS dup_kind
  FROM documents n, thr
  WHERE n.doc_id > thr.t
    AND EXISTS (SELECT 1 FROM documents b
                WHERE b.doc_id <= thr.t AND b.text = n.text)
),
nr AS (
  SELECT DISTINCT a.doc_id, 2 AS dup_kind
  FROM bk a JOIN bk b ON a.band = b.band AND a.band_key = b.band_key
  CROSS JOIN thr
  WHERE a.doc_id > thr.t AND b.doc_id <= thr.t
)
SELECT doc_id, CAST(MIN(dup_kind) AS BIGINT) AS dup_kind
FROM (SELECT * FROM ex UNION ALL SELECT * FROM nr)
GROUP BY 1
""",
        "minhash_near_dup": _minhash_pairs_sql(),
        # identical RE2 normalization on both engines (term_scrub pattern)
        "normalized_dedup": """
WITH nx AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
                             '\s+', ' ', 'g')) AS nt
  FROM documents
)
SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_dups,
       CAST(length(nt) AS BIGINT) AS norm_chars
FROM nx GROUP BY nt
""",
        "jaccard_ngram_pairs": _jaccard_ngram_pairs_sql(),
        "simhash_near_dup": _simhash_pairs_sql(),
        "edit_distance_near_dup": _edit_distance_near_dup_sql(),
        # Heaps-law vocabulary growth over word TRIGRAMS (hash identity on
        # the engine side ≡ string identity here, the decontaminate pattern)
        "vocab_growth": """
WITH t0 AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a FROM documents),
ix AS (SELECT doc_id, a, unnest(range(1, len(a) - 1)) AS i FROM t0 WHERE len(a) >= 3),
tt AS (SELECT array_to_string(a[i:i+2], chr(1)) AS w, MIN(doc_id) AS fid FROM ix GROUP BY 1),
m AS (SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM documents),
b AS (SELECT LEAST(9, ((fid - mn) * 10) // (mx - mn + 1)) AS bucket FROM tt, m),
g AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_terms FROM b GROUP BY 1)
SELECT bucket, new_terms,
       CAST(SUM(new_terms) OVER (ORDER BY bucket) AS BIGINT) AS cum_vocab
FROM g
""",
        "source_top_terms": """
WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
c AS (SELECT source, w AS term, CAST(COUNT(*) AS BIGINT) AS n
      FROM t WHERE w <> '' GROUP BY 1, 2),
r AS (SELECT source, term, n,
             CAST(row_number() OVER (PARTITION BY source ORDER BY n DESC, term) AS BIGINT) AS rank
      FROM c)
SELECT source, term, n, rank FROM r WHERE rank <= 10
""",
        "ngram_novelty": """
WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a FROM documents),
ix AS (SELECT doc_id, a, unnest(range(1, len(a) - 1)) AS i FROM t WHERE len(a) >= 3),
g AS (SELECT DISTINCT doc_id, array_to_string(a[i:i+2], chr(1)) AS gram FROM ix),
f AS (SELECT gram, MIN(doc_id) AS fid FROM g GROUP BY gram),
per AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN f.fid = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        FROM g JOIN f USING (gram) GROUP BY 1)
SELECT d.doc_id, COALESCE(per.n_grams, 0) AS n_grams, COALESCE(per.n_novel, 0) AS n_novel
FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
""",
        # span-sequence profile of the north-rule interleaved table
        "span_mix": f"""
WITH u AS (
  SELECT doc_id, s.kind AS kind, s.text AS txt, s.media_ref AS media_ref,
         s.offset AS off,
         row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS rn
  FROM (SELECT doc_id, unnest(spans) AS s,
               generate_subscripts(spans, 1) AS idx
        FROM read_parquet('{_SYNTH_001}/documents/*.parquet'))
),
mono AS (
  SELECT doc_id,
         CAST(CASE WHEN BOOL_AND(COALESCE(off >= prev, TRUE)) THEN 1 ELSE 0 END AS BIGINT) AS offsets_monotone
  FROM (SELECT doc_id, off, lag(off) OVER (PARTITION BY doc_id ORDER BY rn) AS prev FROM u)
  GROUP BY 1
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
         CAST(SUM(CASE WHEN kind = 'tag' THEN 1 ELSE 0 END) AS BIGINT) AS n_tag,
         CAST(SUM(CASE WHEN media_ref <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_media,
         CAST(SUM(length(txt)) AS BIGINT) AS text_chars
  FROM u GROUP BY 1
)
SELECT agg.*, mono.offsets_monotone FROM agg JOIN mono USING (doc_id)
""",
        # cross-document media usage over the interleaved spans table
        "media_usage": f"""
WITH u AS (
  SELECT doc_id, s.media_ref AS media_ref
  FROM (SELECT doc_id, unnest(spans) AS s
        FROM read_parquet('{_SYNTH_001}/documents/*.parquet'))
  WHERE s.media_ref <> ''
)
SELECT media_ref,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       MIN(doc_id) AS first_doc
FROM u GROUP BY 1
""",
        # unordered media_ref co-occurrence edges (per-document distinct)
        "media_cooccurrence": f"""
WITH u AS (
  SELECT DISTINCT doc_id, s.media_ref AS ref
  FROM (SELECT doc_id, unnest(spans) AS s
        FROM read_parquet('{_SYNTH_001}/documents/*.parquet'))
  WHERE s.media_ref <> ''
)
SELECT a.ref AS ref_a, b.ref AS ref_b, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM u a JOIN u b ON a.doc_id = b.doc_id AND a.ref < b.ref
GROUP BY 1, 2
""",
        # span-kind Markov transition counts in stored span order
        "span_transitions": f"""
WITH u AS (
  SELECT doc_id, s.kind AS kind,
         row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS rn
  FROM (SELECT doc_id, unnest(spans) AS s,
               generate_subscripts(spans, 1) AS idx
        FROM read_parquet('{_SYNTH_001}/documents/*.parquet'))
)
SELECT prev AS kind_from, kind AS kind_to, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT doc_id, kind,
             lag(kind) OVER (PARTITION BY doc_id ORDER BY rn) AS prev
      FROM u)
WHERE prev IS NOT NULL GROUP BY 1, 2
""",
        # span-level fixed-budget packing: global window cumsum in span order
        "interleaved_pack": f"""
WITH s AS (
  SELECT doc_id, generate_subscripts(spans, 1) AS span_idx,
         unnest(spans) AS sp
  FROM read_parquet('{_SYNTH_001}/documents/*.parquet')
), c AS (
  SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
         CASE WHEN sp.media_ref <> '' THEN 64
              ELSE CAST(len(regexp_extract_all(sp.text, '\\S+')) AS BIGINT)
         END AS cost
  FROM s
), p AS (
  SELECT doc_id, span_idx, cost,
         COALESCE(SUM(cost) OVER (ORDER BY doc_id, span_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM c
)
SELECT doc_id, span_idx, cost,
       prefix // 256 AS example_id, prefix % 256 AS slot_offset
FROM p
""",
        # packing-efficiency audit over the same prefix-scan CTE
        "pack_stats": f"""
WITH s AS (
  SELECT doc_id, generate_subscripts(spans, 1) AS span_idx,
         unnest(spans) AS sp
  FROM read_parquet('{_SYNTH_001}/documents/*.parquet')
), c AS (
  SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
         CASE WHEN sp.media_ref <> '' THEN 64
              ELSE CAST(len(regexp_extract_all(sp.text, '\\S+')) AS BIGINT)
         END AS cost
  FROM s
), p AS (
  SELECT doc_id, cost,
         COALESCE(SUM(cost) OVER (ORDER BY doc_id, span_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM c
)
SELECT prefix // 256 AS example_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(cost) AS BIGINT) AS cost_sum,
       CAST(SUM(GREATEST(prefix % 256 + cost - 256, 0)) AS BIGINT) AS spill
FROM p GROUP BY 1
""",
        # caption-candidate context: nearest textual span each side of
        # every media span (IGNORE NULLS window fills)
        "media_context": f"""
WITH s AS (
  SELECT doc_id, generate_subscripts(spans, 1) AS rn, unnest(spans) AS sp
  FROM read_parquet('{_SYNTH_001}/documents/*.parquet')
), t AS (
  SELECT doc_id, CAST(rn AS BIGINT) AS rn, sp.media_ref AS media_ref,
         sp.media_ref <> '' AS is_media,
         CASE WHEN sp.media_ref = ''
              THEN CAST(len(regexp_extract_all(sp.text, '\\S+')) AS BIGINT)
         END AS ntok
  FROM s
), w AS (
  SELECT doc_id, rn, media_ref, is_media,
    last_value(CASE WHEN NOT is_media THEN rn END IGNORE NULLS)
      OVER (PARTITION BY doc_id ORDER BY rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prn,
    last_value(CASE WHEN NOT is_media THEN ntok END IGNORE NULLS)
      OVER (PARTITION BY doc_id ORDER BY rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ptok,
    first_value(CASE WHEN NOT is_media THEN rn END IGNORE NULLS)
      OVER (PARTITION BY doc_id ORDER BY rn
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nrn,
    first_value(CASE WHEN NOT is_media THEN ntok END IGNORE NULLS)
      OVER (PARTITION BY doc_id ORDER BY rn
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ntok2
  FROM t
)
SELECT doc_id, rn AS span_idx, media_ref,
       COALESCE(rn - prn, -1) AS prev_gap,
       COALESCE(ptok, -1) AS prev_tokens,
       COALESCE(nrn - rn, -1) AS next_gap,
       COALESCE(ntok2, -1) AS next_tokens
FROM w WHERE is_media
""",
        # span-level exact-dup audit: a textual span is dup when its exact
        # text occurs in >= 2 distinct docs
        "span_dedup": f"""
WITH s AS (
  SELECT doc_id, sp.text AS t, length(sp.text) AS chars
  FROM (SELECT doc_id, unnest(spans) AS sp
        FROM read_parquet('{_SYNTH_001}/documents/*.parquet'))
  WHERE sp.media_ref = ''
), d AS (SELECT t, COUNT(DISTINCT doc_id) AS nd FROM s GROUP BY 1)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_text_spans,
       CAST(SUM(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_spans,
       CAST(SUM(CASE WHEN d.nd >= 2 THEN s.chars ELSE 0 END) AS BIGINT)
           AS dup_chars
FROM s JOIN d ON s.t = d.t
GROUP BY 1
""",
        # per-document span byte-layout integrity (gaps / overlaps)
        "span_gap_stats": f"""
WITH u AS (
  SELECT doc_id, s.offset AS off, length(s.text) AS ln,
         row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS rn
  FROM (SELECT doc_id, unnest(spans) AS s,
               generate_subscripts(spans, 1) AS idx
        FROM read_parquet('{_SYNTH_001}/documents/*.parquet'))
),
p AS (
  SELECT doc_id, off, ln,
         lag(off) OVER w AS poff, lag(ln) OVER w AS pln
  FROM u WINDOW w AS (PARTITION BY doc_id ORDER BY rn)
)
SELECT doc_id,
       CAST(SUM(CASE WHEN poff IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
       CAST(SUM(CASE WHEN poff IS NOT NULL AND off < poff + pln THEN 1 ELSE 0 END) AS BIGINT) AS n_overlaps,
       CAST(SUM(CASE WHEN poff IS NOT NULL AND off > poff + pln THEN off - poff - pln ELSE 0 END) AS BIGINT) AS gap_total,
       CAST(SUM(ln) AS BIGINT) AS span_bytes
FROM p GROUP BY 1
""",
        # same RE2 pattern as the engine (DuckDB and Arrow share the RE2
        # engine); SQL doubles the apostrophes inside the literal
        "token_count_bpe": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '"
            + r"''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
            + "')) AS BIGINT) AS n_bpe_tokens FROM documents"
        ),
        "source_mixture": """
SELECT doc_id, source FROM documents
WHERE ((doc_id * 2654435761) % 4294967296) % 1000 < (CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 1000 WHEN 'src2' THEN 500 WHEN 'src3' THEN 1000 WHEN 'src4' THEN 500 WHEN 'src5' THEN 1000 WHEN 'src6' THEN 500 WHEN 'src7' THEN 1000 WHEN 'src8' THEN 500 WHEN 'src9' THEN 1000 WHEN 'src10' THEN 500 WHEN 'src11' THEN 1000 WHEN 'src12' THEN 500 WHEN 'src13' THEN 1000 WHEN 'src14' THEN 500 WHEN 'src15' THEN 1000 WHEN 'src16' THEN 500 WHEN 'src17' THEN 1000 WHEN 'src18' THEN 500 WHEN 'src19' THEN 1000 ELSE 1000 END)
""",
        "stratified_sample": """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
  FROM documents
)
SELECT doc_id, source FROM r WHERE rn <= 12
""",
        "doc_repetition": """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS a FROM documents
), w AS (
  SELECT doc_id, unnest(a) AS word FROM t
), wc AS (
  SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY 1, 2
), ws AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_unique_words,
         CAST(MAX(c) AS BIGINT) AS top_word_count
  FROM wc GROUP BY 1
), ix AS (
  SELECT doc_id, a, unnest(range(1, len(a))) AS i FROM t
), bg AS (
  SELECT doc_id, array_to_string(a[i:i+1], chr(1)) AS bigram FROM ix
), bc AS (
  SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2
), bs AS (
  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_count FROM bc GROUP BY 1
)
SELECT ws.doc_id AS doc_id, ws.n_words, ws.n_unique_words, ws.top_word_count,
       CAST(GREATEST(ws.n_words - 1, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(bs.top_bigram_count, 0) AS BIGINT) AS top_bigram_count
FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
""",
        "quality_filter": """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), wc AS (
  SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY 1, 2
), m AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words, MAX(c) AS top FROM wc GROUP BY 1
), t AS (
  SELECT doc_id, length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
  FROM documents
)
SELECT m.doc_id AS doc_id,
       CASE WHEN m.n_words < 12 THEN 'short'
            WHEN 4 * m.top > m.n_words THEN 'repetitive'
            WHEN 10 * t.n_alpha < 7 * t.n_chars THEN 'low_alpha'
            ELSE 'ok' END AS reason,
       CAST(CASE WHEN m.n_words >= 12 AND 4 * m.top <= m.n_words
                  AND 10 * t.n_alpha >= 7 * t.n_chars THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM m JOIN t ON m.doc_id = t.doc_id
""",
        "chunk_dedup": """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS a FROM documents
), ix AS (
  SELECT doc_id, a, unnest(range(0, len(a) // 8)) AS j FROM t
), ch AS (
  SELECT doc_id, array_to_string(a[j*8+1 : j*8+8], ' ') AS chunk FROM ix
), cc AS (
  SELECT chunk, COUNT(*) AS c FROM ch GROUP BY 1
), per AS (
  SELECT ch.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(CASE WHEN cc.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
  FROM ch JOIN cc USING (chunk) GROUP BY 1
)
SELECT d.doc_id AS doc_id,
       CAST(COALESCE(per.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(COALESCE(per.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks
FROM documents d LEFT JOIN per USING (doc_id)
""",
        "embedding_centroid_sim": """
WITH u AS (
  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
         unnest(range(1, len(embedding) + 1)) AS d
  FROM embeddings
), c AS (
  SELECT label, d, AVG(v) AS cv FROM u GROUP BY 1, 2
), j AS (
  SELECT u.vec_id, u.label,
         SUM(u.v * c.cv) AS dot, SUM(u.v * u.v) AS nv, SUM(c.cv * c.cv) AS nc
  FROM u JOIN c ON u.label = c.label AND u.d = c.d
  GROUP BY 1, 2
)
SELECT vec_id, CAST(label AS BIGINT) AS label,
       CAST(FLOOR(dot / (sqrt(nv) * sqrt(nc)) * 1000000 + 0.5) AS BIGINT) AS centroid_sim_e6
FROM j
""",
        "bm25_topk": """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tok2 AS (
  SELECT doc_id, term FROM tok WHERE term <> ''
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM tok2 GROUP BY 1, 2
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM tok2 GROUP BY 1
), stats AS (
  SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs,
         (SELECT CAST(SUM(dl) AS DOUBLE) FROM dl)
           / (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS avgdl
), df AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1
), q AS (
  SELECT DISTINCT doc_id AS qid, term FROM tok2 WHERE doc_id < 5
), sc AS (
  SELECT q.qid, tf.doc_id,
         SUM( ln((s.n_docs - df.df + 0.5e0) / (df.df + 0.5e0) + 1.0e0)
              * tf.tf * (1.2e0 + 1.0e0)
              / (tf.tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl.dl / s.avgdl)) ) AS score
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE tf.doc_id <> q.qid
  GROUP BY 1, 2
), r AS (
  SELECT qid, doc_id, CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT) AS score_e6
  FROM sc
), rk AS (
  SELECT qid, doc_id, score_e6,
         row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) AS rn
  FROM r
)
SELECT qid, doc_id, score_e6, CAST(rn AS BIGINT) AS rank FROM rk WHERE rn <= 10
""",
        "token_budget_mix": r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
  FROM documents
), p AS (
  SELECT doc_id, source,
         COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS pre
  FROM t
)
SELECT doc_id, source, CAST(pre AS BIGINT) AS tok_prefix,
       CAST(CASE WHEN pre < 2000 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM p
""",
        "jaccard_word_pairs": """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
  FROM documents
), ix AS (
  SELECT doc_id, a, unnest(range(1, len(a) - 1)) AS i FROM t
), g0 AS (
  SELECT DISTINCT doc_id, array_to_string(a[i:i+2], ' ') AS gram FROM ix
), df AS (
  SELECT gram, COUNT(*) AS c FROM g0 GROUP BY 1
), g AS (
  SELECT g0.doc_id, g0.gram FROM g0 JOIN df USING (gram) WHERE df.c <= 50
), sz AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY 1
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.inter,
       CAST(p.inter * 10000 // GREATEST(sa.n + sb.n - p.inter, 1) AS BIGINT)
         AS jaccard_e4
FROM p
JOIN sz sa ON sa.doc_id = p.doc_a
JOIN sz sb ON sb.doc_id = p.doc_b
WHERE p.inter * 10000 >= 5000 * (sa.n + sb.n - p.inter)
""",
        # rolling polynomial hash (base 257, mod 2^64) mirrored with
        # HUGEINT wrap arithmetic; corpus text is pure ASCII so ord() ==
        # the UTF-8 byte the engine hashes
        "doc_fingerprint": """
WITH p AS (
  SELECT * FROM (VALUES
    (0, CAST(74051159531521793 AS HUGEINT)),
    (1, CAST(288136807515649 AS HUGEINT)),
    (2, CAST(1121154893057 AS HUGEINT)),
    (3, CAST(4362470401 AS HUGEINT)),
    (4, CAST(16974593 AS HUGEINT)),
    (5, CAST(66049 AS HUGEINT)),
    (6, CAST(257 AS HUGEINT)),
    (7, CAST(1 AS HUGEINT))) AS p(j, pw)
), c AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         CAST(ord(substr(text, CAST(i AS INT), 1)) AS HUGEINT) AS b,
         CAST(length(text) AS BIGINT) AS L
  FROM documents, unnest(range(1, length(text) + 1)) AS u(i)
), h AS (
  SELECT doc_id, i - j AS pos,
         SUM(b * pw) % 18446744073709551616 AS m
  FROM c CROSS JOIN p
  WHERE i - j >= 1 AND i - j <= L - 7
  GROUP BY 1, 2
), s AS (
  SELECT doc_id,
         CAST(CASE WHEN m < 9223372036854775808 THEN m
                   ELSE m - 18446744073709551616 END AS BIGINT) AS v
  FROM h
), agg AS (
  SELECT doc_id, MIN(v) AS fp_min, MAX(v) AS fp_max, bit_xor(v) AS fp_xor
  FROM s GROUP BY 1
)
SELECT d.doc_id, COALESCE(agg.fp_min, 0) AS fp_min,
       COALESCE(agg.fp_max, 0) AS fp_max, COALESCE(agg.fp_xor, 0) AS fp_xor
FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
""",
        "winnow_fingerprints": """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
  FROM documents
), ix AS (
  SELECT doc_id, a, unnest(range(1, len(a) - 1)) AS i FROM t
), g AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         array_to_string(a[i:i+2], ' ') AS gram
  FROM ix
), n AS (
  SELECT doc_id, COUNT(*) AS ng FROM g GROUP BY 1
), q AS (
  SELECT g.doc_id, g.pos AS q
  FROM g JOIN n USING (doc_id)
  WHERE g.pos <= GREATEST(n.ng - 4, 0)
), j AS (
  SELECT q.doc_id, q.q, g.pos, g.gram
  FROM q JOIN g ON g.doc_id = q.doc_id AND g.pos BETWEEN q.q AND q.q + 3
), m AS (
  SELECT doc_id, q, MIN(gram) AS mg FROM j GROUP BY 1, 2
), r AS (
  SELECT j.doc_id, j.q, MAX(j.pos) AS pos
  FROM j JOIN m ON j.doc_id = m.doc_id AND j.q = m.q AND j.gram = m.mg
  GROUP BY 1, 2
)
SELECT DISTINCT r.doc_id, r.pos, g.gram
FROM r JOIN g ON g.doc_id = r.doc_id AND g.pos = r.pos
""",
        "bpe_merge_candidates": """
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
), wf AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS f
  FROM w WHERE word <> '' GROUP BY 1
), ix AS (
  SELECT word, f, unnest(range(1, length(word))) AS i FROM wf
), p AS (
  SELECT substring(word, CAST(i AS INTEGER), 2) AS pair,
         CAST(SUM(f) AS BIGINT) AS n
  FROM ix GROUP BY 1
), r AS (
  SELECT pair, n,
         CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rank
  FROM p
)
SELECT pair, n, rank FROM r WHERE rank <= 20
""",
        "source_contamination": """
WITH t AS (
  SELECT source, string_split(text, ' ') AS a FROM documents
), ix AS (
  SELECT source, a, unnest(range(0, len(a) // 8)) AS j FROM t
), ch AS (
  SELECT DISTINCT source, array_to_string(a[j*8+1 : j*8+8], ' ') AS chunk
  FROM ix
)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_chunks
FROM ch a JOIN ch b ON a.chunk = b.chunk AND a.source < b.source
GROUP BY 1, 2
""",
        "corpus_prep": r"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), wc AS (
  SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY 1, 2
), m AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words, MAX(c) AS top
  FROM wc GROUP BY 1
), t AS (
  SELECT doc_id, length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
         text
  FROM documents
), q AS (
  SELECT t.doc_id, t.n_tokens, t.text
  FROM m JOIN t ON m.doc_id = t.doc_id
  WHERE m.n_words >= 12 AND 4 * m.top <= m.n_words
    AND 10 * t.n_alpha >= 7 * t.n_chars
), d AS (
  SELECT MIN(doc_id) AS doc_id FROM q GROUP BY text
), s AS (
  SELECT q.doc_id, q.n_tokens FROM q JOIN d USING (doc_id)
), p AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS prefix
  FROM s
)
SELECT doc_id, CAST(prefix // 512 AS BIGINT) AS example_id,
       CAST(prefix % 512 AS BIGINT) AS tok_offset
FROM p
""",
        "bigram_lm_score": """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
  FROM documents
), ix AS (
  SELECT doc_id, a, unnest(range(1, len(a))) AS i FROM t
), bg AS (
  SELECT doc_id, a[i] AS w1, a[i + 1] AS w2 FROM ix
), bc AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2
), uc AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY 1
), v AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uc
)
SELECT bg.doc_id AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CAST(FLOOR(ln((bc.c2 + 1.0) / (uc.c1 + v.v)) * 1000000 + 0.5)
                     AS BIGINT)) AS BIGINT) AS logprob_e6
FROM bg
JOIN bc USING (w1, w2)
JOIN uc USING (w1)
CROSS JOIN v
GROUP BY 1
""",
        "decontaminate": """
WITH t AS (
  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS a
  FROM documents
), ix AS (
  SELECT doc_id, source, a, unnest(range(1, len(a) - 1)) AS i FROM t
), g AS (
  SELECT doc_id, source, array_to_string(a[i:i+2], ' ') AS ng FROM ix
), ev AS (
  SELECT DISTINCT ng FROM g WHERE source = 'src19'
)
SELECT DISTINCT g.doc_id AS doc_id
FROM g JOIN ev USING (ng) WHERE g.source <> 'src19'
""",
        "seq_pack": """
WITH t AS (
  SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
  FROM documents
), p AS (
  SELECT doc_id,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM t
)
SELECT doc_id, CAST(prefix // 512 AS BIGINT) AS example_id,
       CAST(prefix % 512 AS BIGINT) AS tok_offset
FROM p
""",
        "tf_idf": """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), t AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok WHERE term <> '' GROUP BY 1, 2
), d AS (
  SELECT term, COUNT(*) AS df FROM t GROUP BY 1
), n AS (SELECT COUNT(*) AS n FROM documents)
SELECT t.doc_id AS doc_id, t.term AS term,
       CAST(FLOOR(t.tf * ln(n.n / d.df) * 1000000 + 0.5) AS BIGINT) AS tfidf_micro
FROM t, d, n WHERE t.term = d.term
""",
        # transitive closure over the prefix/suffix-equality edge union —
        # the SQL mirror of the engine's min-label propagation
        "leakage_safe_split": """
WITH clusters AS (WITH RECURSIVE pre AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY substr(text, 1, 64)) AS rep
  FROM documents
), suf AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY substr(reverse(text), 1, 64)) AS rep
  FROM documents
), edges AS (
  SELECT doc_id AS a, rep AS b FROM pre
  UNION SELECT rep, doc_id FROM pre
  UNION SELECT doc_id, rep FROM suf
  UNION SELECT rep, doc_id FROM suf
  UNION SELECT doc_id, doc_id FROM documents
), walk(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT w.a, e.b FROM walk w JOIN edges e ON w.b = e.a
)
SELECT a AS doc_id, MIN(b) AS cluster_id FROM walk GROUP BY a)
SELECT doc_id,
       CASE WHEN cluster_id % 10 < 8 THEN 'train'
            WHEN cluster_id % 10 = 8 THEN 'val'
            ELSE 'test' END AS split
FROM clusters
""",
        "dedup_clusters": """
WITH RECURSIVE pre AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY substr(text, 1, 64)) AS rep
  FROM documents
), suf AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY substr(reverse(text), 1, 64)) AS rep
  FROM documents
), edges AS (
  SELECT doc_id AS a, rep AS b FROM pre
  UNION SELECT rep, doc_id FROM pre
  UNION SELECT doc_id, rep FROM suf
  UNION SELECT rep, doc_id FROM suf
  UNION SELECT doc_id, doc_id FROM documents
), walk(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT w.a, e.b FROM walk w JOIN edges e ON w.b = e.a
)
SELECT a AS doc_id, MIN(b) AS cluster_id FROM walk GROUP BY a
""",
        "text_stats": r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
       CAST(len(regexp_extract_all(text, '\s')) AS BIGINT) AS n_space
FROM documents
""",
        "lang_quality": r"""
SELECT doc_id,
       CASE WHEN length(text) = 0 THEN 0.0
            ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                 / length(text) END AS alpha_ratio,
       CAST(len(regexp_extract_all(lower(text), '\bthe\b'))
          + len(regexp_extract_all(lower(text), '\band\b'))
          + len(regexp_extract_all(lower(text), '\bof\b'))
          + len(regexp_extract_all(lower(text), '\bto\b'))
          + len(regexp_extract_all(lower(text), '\bin\b'))
          + len(regexp_extract_all(lower(text), '\bis\b'))
          + len(regexp_extract_all(lower(text), '\bfor\b')) AS BIGINT) AS n_stopwords
FROM documents
""",
        "embedding_random_projection": _random_projection_sql(),
        "text_embedding_fusion": r"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), wc AS (
  SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY 1, 2
), m AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words, MAX(c) AS top
  FROM wc GROUP BY 1
), t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
  FROM documents
), d AS (
  SELECT t.doc_id, t.n_tokens,
         CAST(CASE WHEN m.n_words >= 12 AND 4 * m.top <= m.n_words
                    AND 10 * t.n_alpha >= 7 * t.n_chars
              THEN 1 ELSE 0 END AS BIGINT) AS keep
  FROM m JOIN t ON m.doc_id = t.doc_id
), u AS (
  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
), e AS (
  SELECT vec_id, CAST(any_value(label) AS BIGINT) AS label,
         CAST(FLOOR(sqrt(SUM(v * v)) * 1000000 + 0.5) AS BIGINT) AS norm_e6
  FROM u GROUP BY 1
)
SELECT d.doc_id, d.n_tokens, d.keep, e.label, e.norm_e6
FROM d JOIN e ON e.vec_id = d.doc_id
""",
        "embedding_class_cohesion": """
WITH u AS (
  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
         unnest(range(0, len(embedding))) AS d
  FROM embeddings
), nrm AS (
  SELECT vec_id, sqrt(SUM(v * v)) AS nn FROM u GROUP BY 1
), un AS (
  SELECT u.vec_id, u.label, u.d, u.v / nrm.nn AS uv
  FROM u JOIN nrm USING (vec_id)
), t AS (
  SELECT label, d, SUM(uv) AS sd FROM un GROUP BY 1, 2
), nl AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings GROUP BY 1
), q AS (
  SELECT label, SUM(sd * sd) AS norm2 FROM t GROUP BY 1
)
SELECT CAST(q.label AS BIGINT) AS label, nl.n AS n_vectors,
       CAST(FLOOR((q.norm2 - nl.n) / GREATEST(nl.n * (nl.n - 1), 1)
                  * 1000000 + 0.5) AS BIGINT) AS cohesion_e6
FROM q JOIN nl USING (label)
""",
        "kmeans_exact": _kmeans_exact_sql(),
        "ann_topk": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT q.qid, e.vec_id, q.qe, e.embedding AS ee
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
),
un AS (
  SELECT qid, vec_id,
         CAST(UNNEST(qe) AS DOUBLE) AS qa, CAST(UNNEST(ee) AS DOUBLE) AS ea
  FROM pairs
),
sims AS (
  SELECT qid, vec_id,
         SUM(qa * ea) / (sqrt(SUM(qa * qa)) * sqrt(SUM(ea * ea))) AS sim
  FROM un GROUP BY qid, vec_id
),
r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
  FROM sims
)
SELECT qid, vec_id, CAST(rn AS INTEGER) AS rank FROM r WHERE rn <= 5
""",
        "events_hourly": """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(FLOOR(SUM(value) * 1000000 + 0.5) AS BIGINT) AS sum_value_micro
FROM events GROUP BY 1, 2
""",
        "events_distinct_users_exact": """
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events
""",
        "top_terms": """
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS est_count
      FROM tok WHERE term <> '' GROUP BY 1)
SELECT term, est_count,
       CAST(row_number() OVER (ORDER BY est_count DESC, term) AS BIGINT) AS rank
FROM c ORDER BY est_count DESC, term LIMIT 10
""",
        "events_user_daily": """
SELECT date_trunc('day', ts) AS day, user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY 1, 2
""",
        "events_sessionize": """
WITH o AS (
  SELECT user_id, event_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
b AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM o
),
s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM b
)
SELECT user_id, MIN(ts) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(FLOOR(EPOCH(MAX(ts) - MIN(ts))) AS BIGINT) AS duration_sec
FROM s GROUP BY user_id, sess
""",
        "events_type_quantiles": """
SELECT event_type,
       CAST(FLOOR(quantile_cont(value, 0.5) * 10000 + 0.5) AS BIGINT) AS q50_e4,
       CAST(FLOOR(quantile_cont(value, 0.95) * 10000 + 0.5) AS BIGINT) AS q95_e4
FROM events GROUP BY 1
""",
        "events_sliding_window": """
WITH e AS (
  SELECT date_trunc('hour', ts) AS h, event_type, value FROM events
), w AS (
  SELECT h - i * INTERVAL 1 HOUR AS window_start, event_type, value
  FROM e, range(6) t(i)
)
SELECT window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(FLOOR(SUM(value) * 1000000 + 0.5) AS BIGINT) AS sum_value_micro
FROM w GROUP BY 1, 2
""",
        "events_asof_last_order": """
SELECT e.event_id AS event_id, e.user_id AS user_id,
       o.o_orderdate AS last_order_date
FROM events e ASOF JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
        "events_value_outliers": """
WITH th AS (
  SELECT event_type,
         CAST(FLOOR(quantile_cont(value, 0.95) * 10000 + 0.5) AS BIGINT) AS q95_e4
  FROM events GROUP BY 1
)
SELECT e.event_id AS event_id, e.event_type AS event_type,
       CAST(FLOOR(e.value * 10000 + 0.5) AS BIGINT) AS value_e4
FROM events e JOIN th USING (event_type)
WHERE CAST(FLOOR(e.value * 10000 + 0.5) AS BIGINT) > th.q95_e4
""",
        "events_user_value_rank": """
WITH r AS (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rn
  FROM events
)
SELECT user_id, event_id, CAST(rn AS BIGINT) AS rnk FROM r WHERE rn <= 3
""",
        "rel_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(FLOOR(SUM(l_quantity) * 100 + 0.5) AS BIGINT) AS sum_qty_cent,
       CAST(FLOOR(SUM(l_extendedprice) * 100 + 0.5) AS BIGINT) AS sum_base_cent,
       CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT) AS sum_disc_cent,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY 1, 2
""",
        "rel_orders_by_segment": """
SELECT c.c_mktsegment,
       CAST(FLOOR(SUM(o.o_totalprice) * 100 + 0.5) AS BIGINT) AS total_price_cent,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
""",
        "rel_top_suppliers": """
SELECT l_suppkey,
       CAST(FLOOR(SUM(l_quantity) * 100 + 0.5) AS BIGINT) AS total_qty_cent
FROM lineitem GROUP BY 1
ORDER BY total_qty_cent DESC, l_suppkey
LIMIT 5
""",
        "rel_customers_no_orders": """
SELECT c_custkey, c_name,
       CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cent
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
)
""",
        "rel_shipping_priority_bloom": """
SELECT l.l_orderkey AS o_orderkey, o.o_orderdate AS o_orderdate,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cent
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY 1, 2
ORDER BY revenue_cent DESC, o_orderkey
LIMIT 10
""",
        "rel_shipping_priority": """
SELECT l.l_orderkey AS o_orderkey, o.o_orderdate AS o_orderdate,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cent
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY 1, 2
ORDER BY revenue_cent DESC, o_orderkey
LIMIT 10
""",
        "ann_range_search": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT q.qid, e.vec_id, q.qe, e.embedding AS ee
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
),
un AS (
  SELECT qid, vec_id,
         CAST(UNNEST(qe) AS DOUBLE) AS qa, CAST(UNNEST(ee) AS DOUBLE) AS ea
  FROM pairs
),
sims AS (
  SELECT qid, vec_id,
         SUM(qa * ea) / (sqrt(SUM(qa * qa)) * sqrt(SUM(ea * ea))) AS sim
  FROM un GROUP BY qid, vec_id
)
SELECT qid, vec_id,
       CAST(FLOOR(sim * 1000000 + 0.5) AS BIGINT) AS sim_e6
FROM sims WHERE sim >= 0.35
""",
        "rel_late_shipment_priority": """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
GROUP BY 1
""",
        "events_top_users": """
SELECT user_id,
       CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_value_e4,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
ORDER BY total_value_e4 DESC, user_id
LIMIT 10
""",
        "rel_revenue_by_nation": """
SELECT n.n_name, r.r_name,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cent
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
""",
        "rel_forecast_revenue": """
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cent,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07
  AND l_quantity < 24
""",
        "rel_promo_revenue": """
WITH j AS (
  SELECT CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
              AS BIGINT) AS cent,
         COALESCE(p.p_type = 'PROMO', FALSE) AS is_promo
  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
), s AS (
  SELECT SUM(CASE WHEN is_promo THEN cent ELSE 0 END) AS pr, SUM(cent) AS tot
  FROM j
)
SELECT CAST(pr AS BIGINT) AS promo_cent, CAST(tot AS BIGINT) AS total_cent,
       CAST((pr * 10000) // GREATEST(tot, 1) AS BIGINT) AS promo_share_e4
FROM s
""",
        "rel_large_orders": """
WITH q AS (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300
)
SELECT c.c_name, o.o_orderkey,
       CAST(epoch_us(o.o_orderdate) AS BIGINT) AS odate_us,
       CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS total_price_cent,
       q.total_qty
FROM q
JOIN orders o ON o.o_orderkey = q.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
        "rel_returned_customers": """
WITH rev AS (
  SELECT o.o_custkey,
         SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                  AS BIGINT)) AS cent
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
    AND o.o_orderdate < TIMESTAMP '1996-10-01'
    AND l.l_returnflag = 'R'
  GROUP BY 1
), top AS (
  SELECT o_custkey, cent FROM rev
  ORDER BY cent DESC, o_custkey LIMIT 20
)
SELECT c.c_custkey, c.c_name, CAST(t.cent AS BIGINT) AS revenue_cent
FROM top t JOIN customer c ON c.c_custkey = t.o_custkey
""",
        "class_balanced_sample": f"""
WITH a AS (
  SELECT doc_id, lang, xor(doc_id % 4294967296, 78084107) AS a0 FROM documents
), r1 AS (
  SELECT doc_id, lang, {_J1_COLS} FROM a
), b AS (
  SELECT doc_id, lang, xor({_J1_OUT}, (doc_id // 4294967296) % 4294967296) AS a1 FROM r1
), r2 AS (
  SELECT doc_id, lang, {_J2_COLS} FROM b
), ranked AS (
  SELECT doc_id, lang, CAST({_J2_OUT} AS BIGINT) AS h,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY {_J2_OUT}, doc_id) AS rn
  FROM r2
)
SELECT doc_id, lang, h FROM ranked WHERE rn <= 50
""",
        "lang_confusion": r"""
WITH c AS (
  SELECT lang,
    len(regexp_extract_all(lower(text), '\b(the|and|of|is|for|with)\b')) AS c_en,
    len(regexp_extract_all(lower(text), '\b(le|la|les|et|des|une)\b')) AS c_fr,
    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|mit)\b')) AS c_de,
    len(regexp_extract_all(lower(text), '\b(el|los|las|es|una|para)\b')) AS c_es
  FROM documents
)
SELECT lang,
  CASE WHEN c_en = 0 AND c_fr = 0 AND c_de = 0 AND c_es = 0 THEN 'und'
       WHEN c_en >= c_fr AND c_en >= c_de AND c_en >= c_es THEN 'en'
       WHEN c_fr >= c_de AND c_fr >= c_es THEN 'fr'
       WHEN c_de >= c_es THEN 'de'
       ELSE 'es' END AS lang_pred,
  CAST(COUNT(*) AS BIGINT) AS n_docs
FROM c GROUP BY 1, 2
""",
        "term_scrub": """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '\\b(the|a|customer)\\b')))
            AS BIGINT) AS n_hits,
       CAST(SUM(length(regexp_replace(text, '\\b(the|a|customer)\\b', '', 'g')))
            AS BIGINT) AS scrubbed_chars
FROM documents GROUP BY 1
""",
        "quality_top_percent": """
WITH s AS (
  SELECT lang, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok
  FROM documents
), h AS (
  SELECT tok AS score, COUNT(*) AS n FROM s GROUP BY 1
), c AS (
  SELECT score, SUM(n) OVER (ORDER BY score) AS cum FROM h
), th AS (
  SELECT MIN(score) AS t FROM c
  WHERE cum >= (SELECT (90 * COUNT(*) + 99) // 100 FROM s)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS sum_tokens
FROM s WHERE tok > (SELECT t FROM th)
GROUP BY 1
""",
        "events_windowed_dedup": """
WITH lagged AS (
  SELECT event_type, ts,
         LAG(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN prev IS NULL
                     OR epoch_us(ts) - epoch_us(prev) > 60000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM lagged GROUP BY 1
""",
        "events_grid_smooth": """
WITH g AS (
  SELECT user_id % 32 AS gx, CAST(hour(ts) AS BIGINT) AS gy,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
)
SELECT a.gx, a.gy, a.c AS n_events,
       CAST(SUM(b.c) AS BIGINT) AS smooth3x3
FROM g a JOIN g b
  ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
GROUP BY 1, 2, 3
""",
        "rel_revenue_rollup": """
WITH base AS (
  SELECT n.n_name, CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
         CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
              AS BIGINT) AS cent
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
)
SELECT COALESCE(n_name, 'ALL') AS n_name,
       COALESCE(l_year, -1) AS l_year,
       SUM(cent) AS revenue_cent
FROM base
GROUP BY GROUPING SETS ((n_name, l_year), (n_name), (l_year), ())
""",
        "rel_discounted_revenue": """
SELECT COALESCE(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100
                               + 0.5) AS BIGINT)), 0) AS revenue_cent,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
        "rel_yearly_top_supplier": """
WITH per AS (
  SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year, l_suppkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                  AS BIGINT)) AS rev
  FROM lineitem GROUP BY 1, 2
), ranked AS (
  SELECT l_year, l_suppkey, rev,
         ROW_NUMBER() OVER (PARTITION BY l_year
                            ORDER BY rev DESC, l_suppkey) AS rn
  FROM per
)
SELECT l_year, l_suppkey AS s_suppkey, CAST(rev AS BIGINT) AS revenue_cent
FROM ranked WHERE rn = 1
""",
        "rel_order_gap_histogram": """
WITH lagged AS (
  SELECT o_custkey, o_orderdate,
         LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
)
SELECT (epoch_us(o_orderdate) - epoch_us(prev)) // 86400000000 AS gap_days,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM lagged WHERE prev IS NOT NULL
GROUP BY 1
""",
        "rel_spend_deciles": """
WITH pcu AS (
  SELECT o_custkey,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS spend
  FROM orders GROUP BY 1
), h AS (
  SELECT spend, CAST(COUNT(*) AS BIGINT) AS n FROM pcu GROUP BY 1
), c AS (
  SELECT spend, SUM(n) OVER (ORDER BY spend) AS cum FROM h
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total FROM pcu
), d AS (
  SELECT CAST(r AS BIGINT) AS decile FROM range(1, 10) AS tbl(r)
)
SELECT d.decile, (d.decile * t.total + 9) // 10 AS rank,
       MIN(c.spend) AS threshold_cent
FROM d, t, c
WHERE c.cum >= (d.decile * t.total + 9) // 10
GROUP BY 1, 2
""",
        "events_session_ids": """
WITH l AS (
  SELECT event_id, user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT event_id, user_id,
       SUM(CASE WHEN prev IS NULL
                OR epoch_us(ts) - epoch_us(prev) > 1800000000
                THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
FROM l
""",
        "events_type_p90_exact": """
WITH v AS (
  SELECT event_type,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS e6
  FROM events
), h AS (
  SELECT event_type, e6, CAST(COUNT(*) AS BIGINT) AS n
  FROM v GROUP BY 1, 2
), c AS (
  SELECT event_type, e6, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY e6) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS tot
  FROM h
)
SELECT event_type, CAST(MAX(tot) AS BIGINT) AS n_events,
       CAST(MIN(e6) AS BIGINT) AS p90_e6
FROM c WHERE cum >= (90 * tot + 99) // 100
GROUP BY 1
""",
        "events_value_median_exact": """
WITH v AS (
  SELECT CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS e6 FROM events
), h AS (
  SELECT e6, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1
), c AS (
  SELECT e6, SUM(n) OVER (ORDER BY e6) AS cum FROM h
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total FROM v
)
SELECT t.total AS n_events, MIN(c.e6) AS median_e6
FROM t, c WHERE c.cum >= (t.total + 1) // 2
GROUP BY 1
""",
        "rel_blame_supplier": """
WITH w AS (
  SELECT l_orderkey, l_suppkey, l_shipdate,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY l_shipdate DESC, l_suppkey) AS rn
  FROM lineitem
), blame AS (
  SELECT w.l_suppkey AS s_suppkey
  FROM w JOIN orders o ON o.o_orderkey = w.l_orderkey
  WHERE w.rn = 1
    AND epoch_us(w.l_shipdate) > epoch_us(o.o_orderdate) + 90 * 86400000000
)
SELECT s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_blamed
FROM blame GROUP BY 1
ORDER BY n_blamed DESC, s_suppkey LIMIT 10
""",
        "rel_nation_trade_balance": """
WITH v AS (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                  AS BIGINT)) AS revenue_cent
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
    AND s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2
)
SELECT nation, SUM(e) AS export_cent, SUM(i) AS import_cent,
       SUM(e) - SUM(i) AS balance_cent
FROM (
  SELECT supp_nation AS nation, revenue_cent AS e, 0 AS i FROM v
  UNION ALL
  SELECT cust_nation, 0, revenue_cent FROM v
) GROUP BY 1
""",
        "rel_market_share": """
WITH rev AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS l_year, s.s_nationkey,
         SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                  AS BIGINT)) AS cent
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
  GROUP BY 1, 2
)
SELECT rev.l_year, sn.n_name AS supp_nation,
       CAST(rev.cent AS BIGINT) AS revenue_cent,
       CAST(rev.cent * 10000 // SUM(rev.cent) OVER (PARTITION BY rev.l_year)
            AS BIGINT) AS share_e4
FROM rev JOIN nation sn ON sn.n_nationkey = rev.s_nationkey
""",
        "rel_sales_opportunity": """
WITH avgpos AS (
  SELECT SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS s,
         COUNT(*) AS n
  FROM customer WHERE CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) > 0
), recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-06-01'
)
SELECT n.n_name AS cust_nation, CAST(COUNT(*) AS BIGINT) AS n_cust,
       SUM(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS sum_bal_cent
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey, avgpos
WHERE CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) * avgpos.n > avgpos.s
  AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
GROUP BY 1
""",
        "rel_volume_shipping": """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT)) AS revenue_cent
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
  AND s.s_nationkey <> c.c_nationkey
GROUP BY 1, 2, 3
""",
        "rel_product_profit": """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT)
           - CAST(FLOOR(p.p_retailprice * 100 + 0.5) AS BIGINT)
             * CAST(FLOOR(l.l_quantity + 0.5) AS BIGINT)) AS profit_cent
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY 1, 2
""",
        "rel_promo_suppliers": """
WITH pairs AS (
  SELECT l_partkey, l_suppkey,
         SUM(CASE WHEN l_shipdate >= TIMESTAMP '1995-01-01'
                   AND l_shipdate < TIMESTAMP '1996-01-01'
                  THEN CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
                  ELSE 0 END) AS q95,
         SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS qall
  FROM lineitem
  WHERE l_partkey IN
        (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY 1, 2
)
SELECT s.s_name, n.n_name
FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM pairs WHERE 2 * q95 > qall)
""",
        "rel_small_qty_revenue": """
WITH stats AS (
  SELECT l_partkey AS pk, CAST(COUNT(*) AS BIGINT) AS cnt,
         SUM(CAST(l_quantity AS BIGINT)) AS sq
  FROM lineitem GROUP BY 1
)
SELECT COALESCE(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)), 0)
         AS revenue_cent,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN stats ON stats.pk = l.l_partkey
WHERE p.p_brand = 'Brand#11'
  AND 5 * CAST(l.l_quantity AS BIGINT) * stats.cnt < stats.sq
""",
        "rel_important_parts": """
WITH pp AS (
  SELECT l_partkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                  AS BIGINT)) AS value_cent
  FROM lineitem GROUP BY 1
)
SELECT l_partkey, value_cent FROM pp
WHERE value_cent * 10000 > 1 * (SELECT SUM(value_cent) FROM pp)
""",
        "rel_min_balance_supplier": """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), j AS (
  SELECT ps.l_partkey, ps.l_suppkey, s.s_acctbal
  FROM ps JOIN supplier s ON s.s_suppkey = ps.l_suppkey
), m AS (
  SELECT l_partkey, MIN(s_acctbal) AS mn FROM j GROUP BY 1
), w AS (
  SELECT j.l_partkey, MIN(j.l_suppkey) AS s_suppkey
  FROM j JOIN m ON j.l_partkey = m.l_partkey AND j.s_acctbal = m.mn
  GROUP BY 1
)
SELECT w.l_partkey AS p_partkey, w.s_suppkey,
       CAST(FLOOR(m.mn * 100 + 0.5) AS BIGINT) AS acctbal_cent
FROM w JOIN m USING (l_partkey)
""",
        "rel_customer_order_counts": """
WITH pc AS (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM pc GROUP BY 1
""",
        # cohort retention triangle: first-order-month cohorts x months since
        # watermark late-arrival accounting (arrival order = event_id;
        # watermark = running max event-time minus 10 min)
        "events_tumbling_lateness": """
WITH a AS (
  SELECT ts, event_id, value,
         epoch_us(ts) + (event_id * 2654435761) % 4294967296 % 1800000000 AS arr
  FROM events
), s AS (
  SELECT ts, value,
         (epoch_us(ts) // 3600000000) * 3600000000 AS window_us,
         MAX(epoch_us(ts)) OVER (ORDER BY arr, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_max
  FROM a
), c AS (
  SELECT window_us,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v_e6,
         CASE WHEN wm_max IS NULL
               OR wm_max - 600000000 < window_us + 3600000000 THEN 0
              WHEN wm_max - 600000000 >=
                   window_us + 3600000000 + 300000000 THEN 2
              ELSE 1 END AS st
  FROM s
)
SELECT window_us,
       CAST(SUM(CASE WHEN st = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
       CAST(SUM(CASE WHEN st = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_late_accepted,
       CAST(SUM(CASE WHEN st = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(COALESCE(SUM(CASE WHEN st <= 1 THEN v_e6 END), 0) AS BIGINT)
           AS accepted_sum_micro
FROM c GROUP BY 1
""",
        "events_watermark_late": """
WITH a AS (
  SELECT ts, event_id,
         epoch_us(ts) + (event_id * 2654435761) % 4294967296 % 1800000000 AS arr
  FROM events
), s AS (
  SELECT ts,
         MAX(ts) OVER (ORDER BY arr, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM a
)
SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_us,
       CAST(CASE WHEN wm IS NOT NULL
                  AND epoch_us(ts) < epoch_us(wm) - 600000000
                 THEN 1 ELSE 0 END AS BIGINT) AS is_late,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY 1, 2
""",
        "rel_cohort_retention": """
WITH o AS (
  SELECT o_custkey AS ck,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym
  FROM orders
),
f AS (SELECT ck, MIN(ym) AS fym FROM o GROUP BY 1)
SELECT f.fym AS cohort_ym, o.ym - f.fym AS months_since,
       CAST(COUNT(DISTINCT o.ck) AS BIGINT) AS n_customers
FROM o JOIN f USING (ck) GROUP BY 1, 2
""",
        # within/cross-source identical-text duplicate pair matrix
        "dup_source_matrix": """
WITH g AS (
  SELECT text, source, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(SUM(CASE WHEN a.source = b.source
                     THEN a.c * (a.c - 1) // 2
                     ELSE a.c * b.c END) AS BIGINT) AS dup_pairs
FROM g a JOIN g b ON a.text = b.text AND a.source <= b.source
GROUP BY 1, 2
""",
        "rel_monthly_growth": """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), l AS (
  SELECT month, rev,
         LAG(rev) OVER (ORDER BY month) AS prev
  FROM m
)
SELECT CAST(epoch_us(month) AS BIGINT) AS month_us,
       CAST(rev AS BIGINT) AS revenue_cent,
       CAST(COALESCE((rev - prev) * 10000 // GREATEST(prev, 1), 0) AS BIGINT)
         AS growth_e4
FROM l
""",
        "rel_linestatus_priority": """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
""",
        "rel_parts_supplier_count": """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1, 2, 3
""",
        "rel_running_totals": """
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS BIGINT)
         AS running_total_cent
FROM orders
""",
        "events_user_gaps": """
WITH g AS (
  SELECT user_id,
         CAST(epoch_us(ts) - lag(epoch_us(ts))
              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
           AS gap_us
  FROM events
)
SELECT user_id,
       CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM g WHERE gap_us IS NOT NULL GROUP BY 1
""",
        "events_props_hist": """
SELECT event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_value_e4
FROM events GROUP BY 1, 2
""",
        "events_value_zscore": """
WITH e4t AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS x
  FROM events
), st AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x * x) AS BIGINT) AS q
  FROM e4t GROUP BY 1
)
SELECT e.event_id, e.event_type,
       CAST(FLOOR((e.x * st.n - st.s) * 1000000
                  / sqrt(CAST(st.n AS DOUBLE) * CAST(st.q AS DOUBLE)
                         - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE))
                  + 0.5)
            AS BIGINT) AS z_e6
FROM e4t e JOIN st USING (event_type)
""",
        "events_hourly_anomaly": """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), w AS (
  SELECT a.event_type, a.hour, a.n,
         CAST(COUNT(b.hour) AS BIGINT) AS base_n,
         CAST(COALESCE(SUM(b.n), 0) AS BIGINT) AS base_sum,
         CAST(COALESCE(SUM(b.n * b.n), 0) AS BIGINT) AS base_sumsq
  FROM h a LEFT JOIN h b
    ON a.event_type = b.event_type
   AND b.hour >= a.hour - INTERVAL 24 HOUR AND b.hour < a.hour
  GROUP BY 1, 2, 3
)
SELECT event_type, hour AS window_start, n AS n_events,
       base_n, base_sum, base_sumsq
FROM w
WHERE base_n > 0 AND (n * base_n - base_sum) > 0
  AND (n * base_n - base_sum) * (n * base_n - base_sum)
      > 9 * (base_n * base_sumsq - base_sum * base_sum)
""",
        "events_type_transitions": """
WITH o AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
), p AS (
  SELECT event_type AS prev_type, nxt AS next_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
), t AS (
  SELECT prev_type, SUM(n) AS tot FROM p GROUP BY 1
)
SELECT p.prev_type, p.next_type, p.n,
       CAST(p.n * 1000000 // t.tot AS BIGINT) AS prob_e6
FROM p JOIN t USING (prev_type)
""",
        "events_retention": """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), f AS (
  SELECT user_id, MIN(day) AS cohort FROM ud GROUP BY 1
)
SELECT f.cohort AS cohort_day,
       CAST(date_diff('day', f.cohort, ud.day) AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ud JOIN f USING (user_id) GROUP BY 1, 2
""",
        "doc_chunks": r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
  FROM documents
), c AS (
  SELECT doc_id, n,
         unnest(range(0, CASE WHEN n = 0 THEN 0
                              ELSE (GREATEST(n - 32, 1) + 95) // 96 END))
           AS chunk_id
  FROM t
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id * 96 AS BIGINT) AS tok_start,
       CAST(LEAST(128, n - chunk_id * 96) AS BIGINT) AS n_tokens
FROM c
""",
        "events_value_histogram": """
SELECT event_type, CAST(FLOOR(value / 10.0) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
""",
        "events_distinct_users_by_type": """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
""",
        "events_percent_rank": """
SELECT event_id, event_type,
       CAST(FLOOR(percent_rank() OVER (PARTITION BY event_type ORDER BY value)
                  * 1000000 + 0.5) AS BIGINT) AS pct_e6
FROM events
""",
        "events_funnel": """
WITH a AS (SELECT user_id, MIN(ts) ta FROM events WHERE event_type = 'view' GROUP BY 1),
b AS (SELECT e.user_id, MIN(e.ts) tb FROM events e JOIN a USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > a.ta GROUP BY 1),
c AS (SELECT e.user_id, MIN(e.ts) tc FROM events e JOIN b USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > b.tb GROUP BY 1)
SELECT u.user_id,
       CAST(CASE WHEN c.user_id IS NOT NULL THEN 3
                 WHEN b.user_id IS NOT NULL THEN 2
                 WHEN a.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN a USING (user_id) LEFT JOIN b USING (user_id)
LEFT JOIN c USING (user_id)
""",
        "top_terms_by_lang": """
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
),
c AS (
  SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS n
  FROM tok WHERE term <> '' GROUP BY 1, 2
),
r AS (
  SELECT lang, term, n,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY n DESC, term) AS BIGINT) AS rank
  FROM c
)
SELECT lang, term, n, rank FROM r WHERE rank <= 5
""",
        "lang_id": r"""
WITH c AS (
  SELECT doc_id,
    len(regexp_extract_all(lower(text), '\b(the|and|of|is|for|with)\b')) AS c_en,
    len(regexp_extract_all(lower(text), '\b(le|la|les|et|des|une)\b')) AS c_fr,
    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|mit)\b')) AS c_de,
    len(regexp_extract_all(lower(text), '\b(el|los|las|es|una|para)\b')) AS c_es
  FROM documents
)
SELECT doc_id,
  CASE WHEN c_en = 0 AND c_fr = 0 AND c_de = 0 AND c_es = 0 THEN 'und'
       WHEN c_en >= c_fr AND c_en >= c_de AND c_en >= c_es THEN 'en'
       WHEN c_fr >= c_de AND c_fr >= c_es THEN 'fr'
       WHEN c_de >= c_es THEN 'de'
       ELSE 'es' END AS lang_pred
FROM c
""",
        "events_attribution_window": """
WITH e AS (SELECT * FROM events)
SELECT a.event_id, a.user_id,
  CAST(COUNT(b.event_id) AS BIGINT) AS n_prior,
  CAST(COALESCE(SUM(CAST(FLOOR(b.value * 1000000 + 0.5) AS BIGINT)), 0)
       AS BIGINT) AS sum_value_micro
FROM e a LEFT JOIN e b
  ON b.user_id = a.user_id
 AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts < a.ts
WHERE a.event_type = 'purchase'
GROUP BY 1, 2
""",
        "geo_neighbor_density": f"""
WITH p AS (SELECT osm_id,
    CAST(FLOOR(centroid_x * 1000000 + 0.5) AS BIGINT) AS cx,
    CAST(FLOOR(centroid_y * 1000000 + 0.5) AS BIGINT) AS cy
  FROM {b})
SELECT a.osm_id, CAST(COUNT(b.osm_id) AS BIGINT) AS n_neighbors
FROM p a LEFT JOIN p b
  ON b.osm_id <> a.osm_id
 AND b.cx >= a.cx - 500000000 AND b.cx <= a.cx + 500000000
 AND b.cy >= a.cy - 500000000 AND b.cy <= a.cy + 500000000
GROUP BY 1
""",
        "dsir_select": """
WITH t AS (
  SELECT doc_id, source,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
), agg AS (
  SELECT w,
    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
    CAST(COUNT(*) AS BIGINT) AS c_all
  FROM t GROUP BY 1
), tot AS (
  SELECT SUM(ct) AS tt, SUM(c_all) - SUM(ct) AS tr, COUNT(*) AS v FROM agg
)
SELECT t.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tok,
  CAST(SUM(CAST(FLOOR(LN((agg.ct + 1.0) / (tot.tt + tot.v)) * 1000000 + 0.5)
                AS BIGINT)
         - CAST(FLOOR(LN((agg.c_all - agg.ct + 1.0) / (tot.tr + tot.v))
                      * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS dsir_e6,
  CAST(CAST(SUM(CAST(FLOOR(LN((agg.ct + 1.0) / (tot.tt + tot.v))
                           * 1000000 + 0.5) AS BIGINT)
              - CAST(FLOOR(LN((agg.c_all - agg.ct + 1.0) / (tot.tr + tot.v))
                           * 1000000 + 0.5) AS BIGINT)) > 0 AS BIGINT)
       AS BIGINT) AS kept
FROM t JOIN agg USING (w) CROSS JOIN tot
GROUP BY 1
""",
        "ccnet_ppl_buckets": """
WITH t AS (
  SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') AS a
  FROM documents
), ix AS (
  SELECT doc_id, lang, a, unnest(range(1, len(a))) AS i FROM t
), bg AS (
  SELECT doc_id, lang, a[i] AS w1, a[i + 1] AS w2 FROM ix
), bc AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2
), uc AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY 1
), v AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uc
), s AS (
  SELECT bg.doc_id AS doc_id, any_value(bg.lang) AS lang,
         CAST(SUM(CAST(FLOOR(ln((bc.c2 + 1.0) / (uc.c1 + v.v)) * 1000000 + 0.5)
                       AS BIGINT)) AS BIGINT) AS logprob_e6
  FROM bg JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN v
  GROUP BY 1
), h AS (
  SELECT lang, logprob_e6 AS lp, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY 1, 2
), c AS (
  SELECT lang, lp, SUM(n) OVER (PARTITION BY lang ORDER BY lp) AS cum,
         SUM(n) OVER (PARTITION BY lang) AS tot FROM h
), th AS (
  SELECT lang,
         MIN(CASE WHEN cum >= (33 * tot + 99) // 100 THEN lp END) AS t33,
         MIN(CASE WHEN cum >= (67 * tot + 99) // 100 THEN lp END) AS t67
  FROM c GROUP BY 1
)
SELECT s.doc_id, s.lang, s.logprob_e6,
  CASE WHEN s.logprob_e6 <= th.t33 THEN 'tail'
       WHEN s.logprob_e6 <= th.t67 THEN 'middle'
       ELSE 'head' END AS bucket
FROM s JOIN th USING (lang)
""",
        "rel_skyline_orders": """
WITH o AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cent,
         o_orderdate
  FROM orders
), g AS (
  SELECT price_cent, MAX(o_orderdate) AS gmax FROM o GROUP BY 1
), r AS (
  SELECT price_cent, gmax,
         MAX(gmax) OVER (ORDER BY price_cent DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pmax
  FROM g
)
SELECT a.o_orderkey, a.price_cent, a.o_orderdate
FROM o a JOIN r USING (price_cent)
WHERE a.o_orderdate = r.gmax AND (r.pmax IS NULL OR a.o_orderdate > r.pmax)
""",
        "rel_basket_pairs": """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, n_orders,
       CAST(row_number() OVER (ORDER BY n_orders DESC, part_a, part_b)
            AS BIGINT) AS rank
FROM p ORDER BY n_orders DESC, part_a, part_b LIMIT 20
""",
        "events_pps_sample": _pps_sample_sql(),
        "events_type_value_corr": """
WITH e AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS y
  FROM events
), a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx,
         SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx,
         SUM(y * y) AS syy
  FROM e GROUP BY 1
)
SELECT event_type, n,
  CAST(FLOOR(CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    THEN CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
    ELSE 0 END * 1000000 + 0.5) AS BIGINT) AS corr_e6
FROM a
""",
        "source_lang_pmi": """
WITH c AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
), s AS (SELECT source, SUM(n) AS cs FROM c GROUP BY 1),
l AS (SELECT lang, SUM(n) AS cl FROM c GROUP BY 1),
t AS (SELECT SUM(n) AS total FROM c)
SELECT c.source, c.lang, c.n,
  CAST(FLOOR(LN(CAST(c.n * t.total AS DOUBLE) / (s.cs * l.cl))
             * 1000000 + 0.5) AS BIGINT) AS pmi_e6
FROM c JOIN s USING (source) JOIN l USING (lang) CROSS JOIN t
""",
        # CDC: cut before 0-based window index i (1-based pos = i+1 > 1)
        # when the 8-byte rolling hash ≡ 0 mod 64 — same windowed SUM(b·pw)
        # as doc_fingerprint; chunk identity is the exact substring
        "cdc_chunk_dedup": """
WITH p AS (
  SELECT * FROM (VALUES
    (0, CAST(74051159531521793 AS HUGEINT)),
    (1, CAST(288136807515649 AS HUGEINT)),
    (2, CAST(1121154893057 AS HUGEINT)),
    (3, CAST(4362470401 AS HUGEINT)),
    (4, CAST(16974593 AS HUGEINT)),
    (5, CAST(66049 AS HUGEINT)),
    (6, CAST(257 AS HUGEINT)),
    (7, CAST(1 AS HUGEINT))) AS p(j, pw)
), c AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         CAST(ord(substr(text, CAST(i AS INT), 1)) AS HUGEINT) AS b,
         CAST(length(text) AS BIGINT) AS L
  FROM documents, unnest(range(1, length(text) + 1)) AS u(i)
), h AS (
  SELECT doc_id, i - j AS pos,
         SUM(b * pw) % 18446744073709551616 AS m
  FROM c CROSS JOIN p
  WHERE i - j >= 1 AND i - j <= L - 7
  GROUP BY 1, 2
), cuts AS (
  SELECT doc_id, pos FROM h WHERE m % 64 = 0 AND pos > 1
), bounds AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT doc_id, pos FROM cuts
    UNION ALL SELECT doc_id, 1 FROM documents
    UNION ALL SELECT doc_id, length(text) + 1 FROM documents)
), spans AS (
  SELECT doc_id, pos AS s,
         LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS e
  FROM bounds
), ck AS MATERIALIZED (
  SELECT b.doc_id, substr(d.text, CAST(b.s AS INT), CAST(b.e - b.s AS INT)) AS chunk
  FROM spans b JOIN documents d USING (doc_id) WHERE b.e IS NOT NULL
), dd AS (
  SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM ck GROUP BY 1
), fin AS (
  SELECT ck.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(CASE WHEN dd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks,
         CAST(COALESCE(SUM(CASE WHEN dd.nd >= 2 THEN length(ck.chunk) END), 0)
             AS BIGINT) AS shared_chars
  FROM ck JOIN dd USING (chunk)
  GROUP BY 1
)
-- LEFT JOIN from documents: an empty-text doc has zero chunks but must
-- still appear as (0, 0, 0) — the engine's convention (ADVICE r4)
SELECT d.doc_id, CAST(COALESCE(f.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(COALESCE(f.n_shared_chunks, 0) AS BIGINT) AS n_shared_chunks,
       CAST(COALESCE(f.shared_chars, 0) AS BIGINT) AS shared_chars
FROM documents d LEFT JOIN fin f ON f.doc_id = d.doc_id
""",
        "dup_span_coverage": """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
  FROM documents
), ix AS (
  SELECT doc_id, a, unnest(range(1, len(a) - 1)) AS i FROM t
), g AS (
  SELECT doc_id, a[i] || chr(31) || a[i+1] || chr(31) || a[i+2] AS w FROM ix
), c AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS tot FROM g GROUP BY 1
), d AS (
  SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
         CAST(SUM(CASE WHEN c.tot >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
  FROM g JOIN c USING (w) GROUP BY 1
)
SELECT doc_id, n_windows, n_dup AS n_dup_windows,
       CAST((n_dup * 1000000) // n_windows AS BIGINT) AS dup_frac_e6
FROM d
""",
        "curriculum_rank": """
SELECT doc_id, n_chars,
       CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT)
         AS rank
FROM documents
""",
        "geo_range_join_sample": _range_join_sample_sql(b),
        "rle_run_stats": f"""
WITH b AS (SELECT osm_id, COALESCE(roof_type, chr(1)) AS v FROM {b}),
o AS (SELECT v, LAG(v) OVER (ORDER BY osm_id) AS prev,
             row_number() OVER (ORDER BY osm_id) AS rn FROM b)
SELECT 'roof_type' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN rn = 1 OR v <> prev THEN 1 ELSE 0 END) AS BIGINT)
         AS runs_storage_order,
       CAST(COUNT(DISTINCT v) AS BIGINT) AS runs_value_order,
       CAST(SUM(CASE WHEN rn = 1 OR v <> prev THEN 1 ELSE 0 END) * 1000000
            // COUNT(DISTINCT v) AS BIGINT) AS permute_gain_e6
FROM o
""",
        "source_token_entropy": """
WITH t AS (
  SELECT source,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
), c AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1, 2
)
SELECT source, CAST(SUM(c) AS BIGINT) AS n_tok,
       CAST(COUNT(*) AS BIGINT) AS n_vocab,
       CAST(SUM(c * CAST(FLOOR(LN(c) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_c_lnc_e6,
       CAST(FLOOR(LN(SUM(c)) * 1000000 + 0.5) AS BIGINT) AS ln_total_e6
FROM c GROUP BY 1
""",
        "rel_rfm_segments": _rfm_sql(),
        "events_weighted_join_sample": _weighted_join_sample_sql(),
        "source_vocab_overlap": """
WITH t AS (
  SELECT DISTINCT source, w FROM (
    SELECT source,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
    FROM documents)
), s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY 1),
p AS (
  SELECT a.source AS sa, b.source AS sb, CAST(COUNT(*) AS BIGINT) AS c
  FROM t a JOIN t b ON a.w = b.w AND a.source < b.source GROUP BY 1, 2
)
SELECT sa AS source_a, sb AS source_b, c AS n_common, x.n AS n_a, y.n AS n_b,
       CAST(c * 1000000 // x.n AS BIGINT) AS containment_a_e6,
       CAST(c * 1000000 // (x.n + y.n - c) AS BIGINT) AS jaccard_e6
FROM p JOIN s x ON x.source = sa JOIN s y ON y.source = sb
""",
        "events_decayed_score": """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(FLOOR(value * EXP(-(( EPOCH_US(TIMESTAMP '2024-02-01')
                                      - EPOCH_US(ts)) / 86400000000.0) / 7.0)
                      * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
    AS decayed_value_e6
FROM events GROUP BY 1
""",
        "curation_matrix": _CURATION_MATRIX_SQL,
        "events_type_winsorized": """
WITH v AS (
  SELECT event_type, CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS e6
  FROM events
), h AS (
  SELECT event_type, e6, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1, 2
), c AS (
  SELECT event_type, e6, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY e6) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS tot FROM h
), th AS (
  SELECT event_type,
         MIN(CASE WHEN cum >= (1 * tot + 99) // 100 THEN e6 END) AS lo,
         MIN(CASE WHEN cum >= (99 * tot + 99) // 100 THEN e6 END) AS hi
  FROM c GROUP BY 1
)
SELECT v.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(th.lo) AS BIGINT) AS lo_e6,
       CAST(MAX(th.hi) AS BIGINT) AS hi_e6,
       CAST(SUM(LEAST(GREATEST(v.e6, th.lo), th.hi)) AS BIGINT)
         AS winsorized_sum_e6
FROM v JOIN th USING (event_type) GROUP BY 1
""",
        "rel_revenue_concentration": """
WITH s AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cent
  FROM orders GROUP BY 1
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
th AS (
  SELECT MIN(v) AS thr FROM (
    SELECT cent AS v, SUM(CAST(1 AS BIGINT)) OVER (ORDER BY cent) AS cum
    FROM s) x, n
  WHERE cum >= n.n - ((n.n + 9) // 10) + 1
)
SELECT n.n AS n_customers, CAST(th.thr AS BIGINT) AS threshold_cent,
       CAST(SUM(CASE WHEN s.cent >= th.thr THEN 1 ELSE 0 END) AS BIGINT)
         AS top_customers,
       CAST(SUM(CASE WHEN s.cent >= th.thr THEN s.cent ELSE 0 END) AS BIGINT)
         AS top_cent,
       CAST(SUM(s.cent) AS BIGINT) AS total_cent,
       CAST(SUM(CASE WHEN s.cent >= th.thr THEN s.cent ELSE 0 END) * 1000000
            // SUM(s.cent) AS BIGINT) AS share_e6
FROM s, n, th GROUP BY 1, 2
""",
        "rel_spend_gini": """
WITH s AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cent
  FROM orders GROUP BY 1
), r AS (SELECT cent, row_number() OVER (ORDER BY cent) AS rn FROM s)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cent) AS BIGINT) AS total_cent,
       CAST(SUM(rn * cent) AS BIGINT) AS rank_weighted_cent,
       CAST((2 * SUM(rn * cent) - (COUNT(*) + 1) * SUM(cent)) * 1000000
            // (COUNT(*) * SUM(cent)) AS BIGINT) AS gini_e6
FROM r
""",
        "lang_length_drift": """
WITH c AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
), vals AS (SELECT DISTINCT v FROM c),
l AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nt FROM c GROUP BY 1),
cdf AS (
  SELECT l.lang, vals.v, l.nt,
         CAST(COALESCE((SELECT SUM(n) FROM c
                        WHERE c.lang = l.lang AND c.v <= vals.v), 0)
              AS BIGINT) AS cum
  FROM l CROSS JOIN vals)
SELECT a.lang AS lang_a, b.lang AS lang_b,
       CAST(MAX(a.nt) AS BIGINT) AS n_a, CAST(MAX(b.nt) AS BIGINT) AS n_b,
       CAST(MAX(ABS(a.cum * b.nt - b.cum * a.nt)) * 1000000
            // (MAX(a.nt) * MAX(b.nt)) AS BIGINT) AS ks_e6
FROM cdf a JOIN cdf b ON a.v = b.v AND a.lang < b.lang
GROUP BY 1, 2
""",
        "events_daily_cusum": """
WITH d AS (
  SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
), t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS tot,
                CAST(COUNT(*) AS BIGINT) AS nd FROM d),
c AS (
  SELECT day, n_events,
         CAST(SUM(n_events * t.nd - t.tot) OVER (ORDER BY day) AS BIGINT)
           AS cusum_scaled
  FROM d, t
), m AS (SELECT MAX(ABS(cusum_scaled)) AS mx FROM c),
p AS (SELECT MIN(day) AS pday FROM c, m WHERE ABS(c.cusum_scaled) = m.mx)
SELECT c.day, c.n_events, c.cusum_scaled,
       CAST(CASE WHEN c.day = p.pday THEN 1 ELSE 0 END AS BIGINT)
         AS is_changepoint
FROM c, p
""",
        "events_hourly_uniformity": """
WITH c AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), h AS (
  SELECT e.event_type, g.hour, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM c) e
  CROSS JOIN (SELECT unnest(range(0, 24)) AS hour) g
  LEFT JOIN c ON c.event_type = e.event_type AND c.hour = g.hour
), t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot FROM h GROUP BY 1)
SELECT h.event_type, CAST(MAX(t.tot) AS BIGINT) AS n,
       CAST(SUM((24 * h.n - t.tot) * (24 * h.n - t.tot)) AS BIGINT)
         AS chi2_scaled
FROM h JOIN t USING (event_type) GROUP BY 1
""",
        "rel_nation_spend_gini": """
WITH s AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cent
  FROM orders GROUP BY 1
), j AS (
  SELECT n.n_name, s.cent
  FROM s JOIN customer c ON c.c_custkey = s.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
), r AS (
  SELECT n_name, cent,
         row_number() OVER (PARTITION BY n_name ORDER BY cent) AS rn
  FROM j
)
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cent) AS BIGINT) AS total_cent,
       CAST((2 * SUM(rn * cent) - (COUNT(*) + 1) * SUM(cent)) * 1000000
            // (COUNT(*) * SUM(cent)) AS BIGINT) AS gini_e6
FROM r GROUP BY 1
""",
        "events_daily_trend": """
WITH d AS (
  SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), i AS (
  SELECT y, CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS x FROM d
), a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS d, SUM(x * y) AS sxy, SUM(x) AS sx,
         SUM(y) AS sy, SUM(x * x) AS sxx
  FROM i
)
SELECT d AS n_days, CAST(sy AS BIGINT) AS total_events,
       CAST(d * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(d * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(CASE WHEN (d * sxy - sx * sy) >= 0
                 THEN ((d * sxy - sx * sy) * 1000000) // (d * sxx - sx * sx)
                 ELSE -(((sx * sy - d * sxy) * 1000000 + (d * sxx - sx * sx)
                         - 1) // (d * sxx - sx * sx))
            END AS BIGINT) AS slope_e6
FROM a
""",
        "curation_funnel": f"""
WITH cm AS ({_CURATION_MATRIX_SQL})
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(q_keep) AS BIGINT) AS n_quality,
       CAST(SUM(dedup_keeper) AS BIGINT) AS n_keeper,
       CAST(SUM(contaminated) AS BIGINT) AS n_contaminated,
       CAST(SUM(dsir_kept) AS BIGINT) AS n_dsir,
       CAST(SUM(selected) AS BIGINT) AS n_selected
FROM cm
""",
        "rel_priority_segment_chi2": """
WITH j AS (
  SELECT o.o_orderpriority, c.c_mktsegment
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), cells AS (
  SELECT o_orderpriority, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
  FROM j GROUP BY 1, 2
), r AS (SELECT o_orderpriority, CAST(SUM(n) AS BIGINT) AS rn
         FROM cells GROUP BY 1),
cc AS (SELECT c_mktsegment, CAST(SUM(n) AS BIGINT) AS cn
       FROM cells GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells)
SELECT cells.o_orderpriority, cells.c_mktsegment, cells.n,
       CAST(r.rn * cc.cn AS BIGINT) AS expected_num,
       CAST(((t.total * cells.n - r.rn * cc.cn)
             * (t.total * cells.n - r.rn * cc.cn)
             * 1000000) // (t.total * r.rn * cc.cn) AS BIGINT)
         AS chi_term_e6
FROM cells JOIN r USING (o_orderpriority) JOIN cc USING (c_mktsegment)
CROSS JOIN t
""",
        "events_type_top_values": """
WITH v AS (
  SELECT event_type,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS value_micro
  FROM events
), c AS (
  SELECT event_type, value_micro, CAST(COUNT(*) AS BIGINT) AS n
  FROM v GROUP BY 1, 2
), r AS (
  SELECT event_type, value_micro, n,
         CAST(dense_rank() OVER (PARTITION BY event_type
                                 ORDER BY value_micro DESC) AS BIGINT)
           AS dense_rank
  FROM c
)
SELECT event_type, value_micro, n, dense_rank FROM r WHERE dense_rank <= 3
""",
        # session path analysis: same 30-min gap CTE as events_sessionize,
        # paths truncated to the first 8 events, deterministic (ts, event_id)
        # step order
        "events_session_paths": """
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), b AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM o
), s AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM b
), r AS (
  SELECT user_id, sess, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id, sess
                            ORDER BY ts, event_id) AS rn
  FROM s
), p AS (
  SELECT user_id, sess,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM r WHERE rn <= 8 GROUP BY 1, 2
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM p GROUP BY 1
""",
        "reservoir_sample": _reservoir_sample_sql(),
        "domain_mix": _domain_mix_sql(),
        "geo_distance_bands": _distance_bands_sql(),
    }

"""CLI — parity with the reference's commands
(``/root/reference/main.ts:19-116``: ``pack-textures | serve | seed-b3dm |
generate-tileset``, ``--tile_coord``, ``--projection mercator|ecef``).

Usage:
    python -m osm_data_3d_tiles_ray seed-b3dm --sf 0.01 --out /tmp/seed
    python -m osm_data_3d_tiles_ray generate-tileset --out /tmp/seed --projection ecef
    python -m osm_data_3d_tiles_ray serve-tile --tile_coord 16/33600/23400 --out /tmp/cache --sf 0.001
    python -m osm_data_3d_tiles_ray pack-textures --out /tmp/frames.parquet

The CLI owns its Ray session (guarded init; the driver-contract module
``__ray_entry__`` never initializes Ray).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    """Attach to the ambient Ray cluster when launched via ``ray job
    submit`` (RAY_ADDRESS / auto-detection — the north rule's launch
    path against fixed N-node clusters); fall back to a local session
    for standalone CLI runs.  A hardcoded ``address="local"`` here would
    silently spin a one-node Ray INSIDE the cluster job."""
    import os

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS")
        try:
            ray.init(address=addr or "auto", include_dashboard=False)
        except ConnectionError:
            ray.init(address="local", include_dashboard=False)
    return ray


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="osm_data_3d_tiles_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    seed = sub.add_parser("seed-b3dm", help="resumable batch seed of all tiles")
    seed.add_argument("--sf", type=float, default=0.001)
    seed.add_argument("--out", required=True)
    seed.add_argument("--projection", choices=["mercator", "ecef", "lambert93"], default="mercator")
    seed.add_argument(
        "--format",
        choices=["parquet", "b3dm"],
        default="parquet",
        help="parquet = resumable partitioned seed layout; b3dm = one spec-layout .b3dm file per tile",
    )

    gts = sub.add_parser("generate-tileset", help="(re)build the tileset JSON tree")
    gts.add_argument("--out", required=True, help="a seed output directory")
    gts.add_argument("--projection", choices=["mercator", "ecef", "lambert93"], default="mercator")

    srv = sub.add_parser("serve-tile", help="one tile on demand (cache or compute)")
    srv.add_argument("--tile_coord", required=True, help="z/x/y (z must be 16)")
    srv.add_argument("--out", required=True, help="cache directory")
    srv.add_argument("--sf", type=float, default=0.001)
    srv.add_argument(
        "--seed_dir",
        default=None,
        help="committed seed output; a miss reads only the tile's z12 fragment",
    )

    dmn = sub.add_parser("serve", help="HTTP tile daemon (reference serve.ts surface)")
    dmn.add_argument("--sf", type=float, default=0.001)
    dmn.add_argument("--host", default="127.0.0.1")
    dmn.add_argument("--port", type=int, default=8947)
    dmn.add_argument("--cache", default="/tmp/osm3d_http_cache")
    dmn.add_argument("--export_dir", default=None, help="pre-generated b3dm/tileset directory")
    dmn.add_argument("--seed_dir", default=None, help="seed partition index for miss lookups")

    pt = sub.add_parser("pack-textures", help="emit the atlas frame dict parquet")
    pt.add_argument("--out", required=True)

    wst = sub.add_parser(
        "write-subtrees",
        help="implicit-tiling .subtree files + implicit root tileset.json",
    )
    wst.add_argument("--sf", type=float, default=0.001)
    wst.add_argument("--out", required=True)

    rq = sub.add_parser(
        "run-query",
        help="run any registered pipeline (see --list) over an sf dir and write parquet",
    )
    rq.add_argument("name", nargs="?", help="queries() key, e.g. tf_idf, dedup_exact")
    rq.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    rq.add_argument("--out", default=None, help="output parquet dir (default: print row count)")
    rq.add_argument("--list", action="store_true", help="list available query names")

    args = p.parse_args(argv)

    if args.cmd == "pack-textures":
        import os

        if args.out.endswith(".parquet"):
            from .tables.atlas import write_frame_dict_parquet

            write_frame_dict_parquet(args.out)
            print(json.dumps({"written": args.out}))
        else:
            from .tables.atlas_png import pack_textures_png

            written = pack_textures_png(args.out)
            print(json.dumps({"written": written}))
        return 0

    ray = _ray_session()
    import ray.data

    from .synth.generator import ensure_synth

    try:
        if args.cmd == "run-query":
            import importlib.util
            import os

            spec = importlib.util.spec_from_file_location(
                "__ray_entry__",
                os.path.join(os.path.dirname(os.path.dirname(__file__)), "__ray_entry__.py"),
            )
            entry = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(entry)
            qs = entry.queries()
            if args.list or not args.name:
                print(json.dumps(sorted(qs)))
                return 0
            if args.name not in qs:
                print(f"unknown query {args.name!r}; see --list", file=sys.stderr)
                return 2
            res = qs[args.name](args.sf_dir)
            import pandas as pd
            import pyarrow as pa

            if isinstance(res, ray.data.Dataset):
                if args.out:
                    res.write_parquet(args.out)
                    print(json.dumps({"query": args.name, "out": args.out}))
                else:
                    print(json.dumps({"query": args.name, "rows": res.count()}))
            else:
                t = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
                if args.out:
                    import pyarrow.parquet as pq

                    os.makedirs(args.out, exist_ok=True)
                    pq.write_table(t, os.path.join(args.out, f"{args.name}.parquet"))
                    print(json.dumps({"query": args.name, "out": args.out}))
                else:
                    print(json.dumps({"query": args.name, "rows": t.num_rows}))
        elif args.cmd == "seed-b3dm":
            from .pipelines.buildings import export_b3dm, seed_tiles

            root = ensure_synth(args.sf)
            if args.format == "b3dm":
                n = export_b3dm(
                    ray.data.read_parquet(str(root / "documents")),
                    args.out,
                    projection=args.projection,
                )
                print(json.dumps({"tiles_written": n, "format": "b3dm"}))
                return 0
            m = seed_tiles(
                ray.data.read_parquet(str(root / "documents")),
                args.out,
                projection=args.projection,
            )
            print(
                json.dumps(
                    {
                        "partitions": m["n_partitions"],
                        "tiles": m["rows_out"],
                        "vertices": m["vertices"],
                    }
                )
            )
        elif args.cmd == "write-subtrees":
            from .pipelines.geo import q_subtree_avail
            from .stages.subtree import write_subtrees

            root = ensure_synth(args.sf)
            m = write_subtrees(q_subtree_avail(str(root)), args.out)
            print(
                json.dumps(
                    {
                        "subtrees": m["n_roots"],
                        "tiles": m["rows_out"],
                        "out": args.out,
                    }
                )
            )
        elif args.cmd == "generate-tileset":
            import pandas as pd

            from .geom.transforms import cell_to_tile
            from .sources.lance import read_dataset
            from .stages.tileset import build_tileset_tree, write_tileset

            stats = read_dataset(
                args.out, columns=["cell_id", "batch_length", "vertex_count", "max_z"]
            ).to_pandas()
            z, tx, ty = cell_to_tile(stats["cell_id"].to_numpy().astype("uint64"))
            stats["tile_z"] = z
            stats["tile_x"] = tx
            stats["tile_y"] = ty
            tree = build_tileset_tree(stats, projection=args.projection)
            write_tileset(tree, args.out)
            print(json.dumps({"tileset_nodes": len(tree)}))
        elif args.cmd == "serve":
            from .pipelines.http_serve import serve_forever

            root = ensure_synth(args.sf)
            serve_forever(
                ray.data.read_parquet(str(root / "documents")),
                args.cache,
                export_dir=args.export_dir,
                seed_dir=args.seed_dir,
                host=args.host,
                port=args.port,
            )
        elif args.cmd == "serve-tile":
            from .pipelines.serve import get_or_build_tile

            z, x, y = (int(v) for v in args.tile_coord.split("/"))
            if z != 16:
                print("only z16 tiles are served", file=sys.stderr)
                return 2
            root = ensure_synth(args.sf)
            stats: dict = {}
            payload = get_or_build_tile(
                ray.data.read_parquet(str(root / "documents")),
                x,
                y,
                args.out,
                seed_dir=args.seed_dir,
                stats=stats,
            )
            if payload is None:
                print(json.dumps({"tile": args.tile_coord, "status": 404}))
                return 4
            print(json.dumps({"tile": args.tile_coord, "bytes": len(payload), **stats}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())

"""Memory-bandwidth ceiling probe (scaling-protocol evidence).

Measures how per-process throughput degrades as independent worker
processes are added, with ZERO shared state, no Ray, no shuffle:

* ``triad``: STREAM-style numpy triad (a = b + 0.5*c over 64 MiB arrays)
  — pure DRAM bandwidth.
* ``workload``: the flagship per-batch kernel (parse_documents + Build3D
  over a fixed 2000-doc shard) — the actual compute mix.

Each worker runs alone in its own process pinned workload for ``--secs``
seconds; we report per-process and aggregate rates at P ∈ {1, 4, 8, 16,
32}.  If aggregate triad GB/s saturates well below 32 processes, the
machine's memory system — not the engine — caps the 8→32 Ray scaling
pair, and a real 4N-node cluster (which adds DRAM channels with nodes)
would not see the same ceiling.  Output: one JSON line per P.

Usage: python tools/membw_probe.py [--secs 6] [--procs 1,4,8,16,32]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time


def _triad_worker(secs: float, q: mp.Queue) -> None:
    import numpy as np

    n = 8 * 1024 * 1024  # 64 MiB per array ×3 → far beyond LLC
    b = np.random.default_rng(0).random(n)
    c = np.random.default_rng(1).random(n)
    a = np.empty_like(b)
    # warmup
    np.add(b, 0.5 * c, out=a)
    t_end = time.time() + secs
    iters = 0
    while time.time() < t_end:
        np.multiply(c, 0.5, out=a)
        np.add(a, b, out=a)
        iters += 1
    # bytes moved per iter: read b, read c, write a (×2 passes) ≈ 5 arrays
    gb = iters * 5 * n * 8 / 1e9
    q.put(gb / secs)


def _workload_worker(secs: float, q: mp.Queue) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from osm_data_3d_tiles_ray.stages.build3d import Build3D
    from osm_data_3d_tiles_ray.stages.parse import parse_documents
    from osm_data_3d_tiles_ray.synth.generator import generate_shard

    docs, _ = generate_shard(3, 2000)
    build = Build3D()
    parsed = parse_documents(docs, keep_spans=False)
    build(parsed)  # warmup
    t_end = time.time() + secs
    done = 0
    while time.time() < t_end:
        build(parse_documents(docs, keep_spans=False))
        done += 2000
    q.put(done / secs)


def _run(kind: str, nproc: int, secs: float) -> dict:
    worker = _triad_worker if kind == "triad" else _workload_worker
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=worker, args=(secs, q)) for _ in range(nproc)]
    t0 = time.time()
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    unit = "GB/s" if kind == "triad" else "docs/s"
    return {
        "probe": kind,
        "procs": nproc,
        "per_proc": round(sum(rates) / len(rates), 2),
        "aggregate": round(sum(rates), 2),
        "unit": unit,
        "wall": round(time.time() - t0, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=6.0)
    ap.add_argument("--procs", default="1,4,8,16,32")
    ap.add_argument("--kinds", default="triad,workload")
    args = ap.parse_args()
    for kind in args.kinds.split(","):
        base = None
        for p in (int(x) for x in args.procs.split(",")):
            r = _run(kind, p, args.secs)
            if base is None:
                base = r["per_proc"]
            r["per_proc_vs_1"] = round(r["per_proc"] / base, 3)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    mp.set_start_method("spawn", force=True)
    main()

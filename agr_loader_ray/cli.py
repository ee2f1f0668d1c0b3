"""Job entry points — `ray job submit`-able CLI for the CDC engine.

The north rule runs replay "via ray job submit on a fixed multi-node
Ray cluster"; this module is that job script.  In a cluster submission
Ray is initialised by the job environment (``RAY_ADDRESS``), so we only
``ray.init`` when no session exists (the driver-contract rule: the
library never owns a session that someone else started).

    ray job submit -- python -m agr_loader_ray.cli replay \\
        --wal /data/wal --lake /data/lake --partitions 256
    python -m agr_loader_ray.cli tail --wal /data/wal --lake /data/lake
    python -m agr_loader_ray.cli compact --lake /data/lake --watermark 10000
    python -m agr_loader_ray.cli verify --lake /data/lake
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        # no address → Ray honors RAY_ADDRESS (the cluster address under
        # `ray job submit`; "local" in this sandbox)
        ray.init(include_dashboard=False, logging_level="ERROR")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="agr_loader_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    rp = sub.add_parser("replay", help="apply all uncommitted WAL epochs")
    rp.add_argument("--wal", required=True)
    rp.add_argument("--lake", required=True)
    rp.add_argument("--partitions", type=int, default=64)
    rp.add_argument("--compact-every", type=int, default=4)
    rp.add_argument("--upto-epoch", type=int, default=None)

    tp = sub.add_parser("tail", help="poll the WAL, applying sealed epochs")
    tp.add_argument("--wal", required=True)
    tp.add_argument("--lake", required=True)
    tp.add_argument("--partitions", type=int, default=64)
    tp.add_argument("--poll-interval", type=float, default=1.0)
    tp.add_argument("--idle-rounds", type=int, default=3)

    cp = sub.add_parser("compact", help="compact deltas; GC old tombstones")
    cp.add_argument("--lake", required=True)
    cp.add_argument("--watermark", type=int, default=None,
                    help="drop tombstones applied before this WAL offset")

    vp = sub.add_parser("verify", help="recompute lake checksums vs manifests")
    vp.add_argument("--lake", required=True)

    args = p.parse_args(argv)
    _ensure_ray()
    from .pipelines.engine import CdcEngine, verify_lake

    if args.cmd == "replay":
        eng = CdcEngine(args.lake, n_partitions=args.partitions,
                        compact_every=args.compact_every)
        r = eng.replay(args.wal, upto_epoch=args.upto_epoch)
        out = {"epochs": [e["epoch"] for e in r["epochs"]],
               "events_applied": r["events_applied"],
               "sec": round(r["sec"], 3),
               "events_per_sec": round(r["events_per_sec"], 1)}
    elif args.cmd == "tail":
        eng = CdcEngine(args.lake, n_partitions=args.partitions)
        out = eng.tail(args.wal, poll_interval=args.poll_interval,
                       idle_rounds=args.idle_rounds)
    elif args.cmd == "compact":
        eng = CdcEngine(args.lake)
        out = eng.compact(drop_tombstones_before_offset=args.watermark)
    else:
        out = verify_lake(args.lake)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

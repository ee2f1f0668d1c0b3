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

    sp = sub.add_parser("stitch", help="minor compaction: fold delta files "
                                       "per partition without rewriting bases")
    sp.add_argument("--lake", required=True)
    sp.add_argument("--min-deltas", type=int, default=2)

    gp = sub.add_parser("vacuum", help="retention GC below a snapshot window")
    gp.add_argument("--lake", required=True)
    gp.add_argument("--retain-epochs", type=int, default=1)

    xp = sub.add_parser("restore", help="roll the table back to an epoch "
                                        "(metadata-only)")
    xp.add_argument("--lake", required=True)
    xp.add_argument("--epoch", type=int, required=True)

    lp = sub.add_parser("clone", help="hardlink snapshot copy of the lake")
    lp.add_argument("--lake", required=True)
    lp.add_argument("--target", required=True)

    yp = sub.add_parser("sync", help="incrementally replicate to a clone")
    yp.add_argument("--lake", required=True)
    yp.add_argument("--target", required=True)

    up = sub.add_parser("purge", help="physically erase conversations "
                                      "(GDPR; follow with vacuum)")
    up.add_argument("--lake", required=True)
    up.add_argument("--conv-ids", required=True,
                    help="comma-separated conv_id values to erase")

    hp = sub.add_parser("history", help="DESCRIBE HISTORY: per-epoch "
                                        "operation lineage from the manifests")
    hp.add_argument("--lake", required=True)

    wp = sub.add_parser("savepoint", help="pin an epoch's snapshot against "
                                          "vacuum (omit --epoch for latest)")
    wp.add_argument("--lake", required=True)
    wp.add_argument("--epoch", type=int, default=None)
    wp.add_argument("--name", default=None)
    wp.add_argument("--release", action="store_true",
                    help="un-pin instead (requires --epoch)")

    qp = sub.add_parser("repartition", help="rewrite lake ownership to a "
                                            "new partition count")
    qp.add_argument("--lake", required=True)
    qp.add_argument("--new-partitions", type=int, required=True)

    kp = sub.add_parser("constraints", help="show or replace the lake's "
                                            "CHECK-constraint rule set")
    kp.add_argument("--lake", required=True)
    kp.add_argument("--set", dest="rules_json", default=None,
                    help="JSON list of constraint specs (replaces the set); "
                         "omit to print the current rules")

    dp = sub.add_parser("redrive", help="re-apply quarantined events that "
                                        "pass the current constraint set")
    dp.add_argument("--lake", required=True)

    fp = sub.add_parser("diff", help="partition-level content diff vs a "
                                     "replica (Merkle walk)")
    fp.add_argument("--lake", required=True)
    fp.add_argument("--other", required=True)

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
    elif args.cmd == "stitch":
        out = CdcEngine(args.lake).compact_deltas(min_deltas=args.min_deltas)
    elif args.cmd == "vacuum":
        out = CdcEngine(args.lake).vacuum(retain_epochs=args.retain_epochs)
    elif args.cmd == "restore":
        out = CdcEngine(args.lake).restore(args.epoch)
    elif args.cmd == "clone":
        out = CdcEngine(args.lake).clone_to(args.target)
    elif args.cmd == "sync":
        out = CdcEngine(args.lake).sync_to(args.target)
    elif args.cmd == "purge":
        import pyarrow as pa
        import pyarrow.compute as pc

        victims = pa.array([s for s in args.conv_ids.split(",") if s])

        def pred(t):
            return pc.is_in(t["conv_id"], value_set=victims)

        out = CdcEngine(args.lake).purge(pred)
    elif args.cmd == "history":
        from .pipelines.engine import lake_history

        out = {"history": lake_history(args.lake)}
    elif args.cmd == "savepoint":
        eng = CdcEngine(args.lake)
        if args.release:
            if args.epoch is None:
                p.error("--release requires --epoch")
            out = eng.release_savepoint(args.epoch)
        else:
            out = eng.savepoint(epoch=args.epoch, name=args.name)
    elif args.cmd == "repartition":
        out = CdcEngine(args.lake).repartition(args.new_partitions)
    elif args.cmd == "constraints":
        eng = CdcEngine(args.lake)
        out = (eng.set_constraints(json.loads(args.rules_json))
               if args.rules_json else eng.constraints_state())
    elif args.cmd == "redrive":
        out = CdcEngine(args.lake).redrive_quarantine()
    elif args.cmd == "diff":
        from .pipelines.engine import lake_diff

        out = lake_diff(args.lake, args.other)
    else:
        out = verify_lake(args.lake)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""The `ray job submit` CLI surface: replay → compact → verify round trip."""

import json
import os
import subprocess
import sys

from agr_loader_ray.wal.generator import WalSpec, generate_wal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    r = subprocess.run([sys.executable, "-m", "agr_loader_ray.cli", *args],
                       capture_output=True, text=True, cwd=REPO, check=True)
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_cli_replay_compact_verify(tmp_path):
    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_wal(wal, WalSpec(n_events=2000, n_convs=80, n_epochs=2, delete_frac=0.1))

    out = _run("replay", "--wal", wal, "--lake", lake, "--partitions", "8")
    assert out["epochs"] == [0, 1] and out["events_applied"] == 2000

    # idempotent: second replay skips everything
    out2 = _run("replay", "--wal", wal, "--lake", lake, "--partitions", "8")
    assert out2["events_applied"] == 0

    assert _run("compact", "--lake", lake)["compacted"] == 8
    v = _run("verify", "--lake", lake)
    assert v["ok"] and v["corrupt_partitions"] == []


def test_cli_lifecycle_commands(tmp_path):
    """stitch / restore / purge / vacuum / clone / sync / repartition via
    the job CLI (each subprocess is its own `ray job submit` analogue)."""
    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    clone = str(tmp_path / "clone")
    generate_wal(wal, WalSpec(n_events=2000, n_convs=80, n_epochs=3,
                              delete_frac=0.1))

    _run("replay", "--wal", wal, "--lake", lake, "--partitions", "4",
         "--compact-every", "100")
    assert _run("stitch", "--lake", lake)["stitched"] >= 1

    out = _run("restore", "--lake", lake, "--epoch", "1")
    assert out["restored_from"] == 1 and not out["noop"]
    _run("restore", "--lake", lake, "--epoch", "2")

    assert _run("clone", "--lake", lake, "--target", clone)["epochs"] == 3

    p = _run("purge", "--lake", lake, "--conv-ids",
             "conv-00000001,conv-00000002")
    assert p["purged_rows"] > 0
    assert _run("sync", "--lake", lake, "--target", clone)["epochs_shipped"] >= 1

    v = _run("vacuum", "--lake", lake, "--retain-epochs", "1")
    assert v["min_readable_epoch"] == 2

    r = _run("repartition", "--lake", lake, "--new-partitions", "8")
    assert r["n_partitions"] == 8
    assert _run("verify", "--lake", lake)["ok"]

    h = _run("history", "--lake", lake)["history"]
    assert h[-1]["epoch"] == 2 and h[-1]["readable"]
    assert any(op.startswith("purge") for op in h[-1]["operations"])

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

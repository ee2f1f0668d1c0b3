"""Skew handling: Zipf-distributed conversations (t3 tier, scaled down).

The engine's skew mechanism is structural (SURVEY A8 / §7.4): the
partition key is the FULL primary key (conv_id, turn_idx), so a hot
conversation's turns spread over all partitions, and the per-batch LWW
pre-fold collapses repeated updates to one survivor per key per block
before the shuffle.  These tests assert (a) correctness under skew and
(b) that the hot conversation's rows actually spread across partitions.
"""

import numpy as np
import pandas as pd
import pyarrow.dataset as pads

import ray.data

from agr_loader_ray.oracle import oracle_reduce
from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.pipelines.export import export_sorted
from agr_loader_ray.stages.partition import skew_stats
from agr_loader_ray.wal.generator import WalSpec, generate_wal

SPEC = WalSpec(n_events=30_000, n_convs=1_000, n_epochs=4, update_frac=0.25,
               delete_frac=0.05, zipf_a=1.2, out_of_order_frac=0.05, dup_ts_frac=0.02)


def test_skewed_replay_matches_oracle(tmp_lake, tmp_wal):
    generate_wal(tmp_wal, SPEC)
    eng = CdcEngine(tmp_lake, n_partitions=8)
    eng.replay(tmp_wal)
    got = export_sorted(tmp_lake).to_pandas().reset_index(drop=True)
    want = oracle_reduce(
        pads.dataset(tmp_wal, partitioning="hive").to_table().to_pandas()
    ).reset_index(drop=True)
    got = got[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)

    # hot conversation (zipf rank 1 = conv-00000000) spreads over partitions
    m = eng.manifest.read_epoch(eng.manifest.last_committed_epoch())
    rows_per_part = [info["rows"] for info in m["partitions"].values()]
    assert max(rows_per_part) < 3 * (sum(rows_per_part) / len(rows_per_part)), (
        "partition sizes too skewed — full-PK hashing should balance them"
    )


def test_skew_stats_finds_hot_conversation(tmp_wal):
    generate_wal(tmp_wal, SPEC)
    ds = ray.data.read_parquet(tmp_wal)
    top = skew_stats(ds, conv_col="conv_id", top_k=5)
    assert top.iloc[0]["conv_id"] == "conv-00000000"  # zipf head
    total = SPEC.n_events
    assert top.iloc[0]["changes"] > 0.01 * total  # genuinely hot


def test_hot_single_key_correct_and_bounded(tmp_lake, tmp_wal):
    """Extreme skew: few conversations × few turns → a handful of PKs
    receive almost all updates.  The per-block LWW pre-fold must collapse
    them before the exchange (at most one survivor per key per block),
    and the final state must still equal the oracle."""
    spec = WalSpec(n_events=40_000, n_convs=20, max_turns=4, n_epochs=4,
                   update_frac=0.6, delete_frac=0.05, zipf_a=1.05,
                   dup_ts_frac=0.1, out_of_order_frac=0.1)
    generate_wal(tmp_wal, spec)
    eng = CdcEngine(tmp_lake, n_partitions=8)
    eng.replay(tmp_wal)

    got = export_sorted(tmp_lake).to_pandas().reset_index(drop=True)
    assert len(got) <= 20 * 4  # keyspace bound: prefold collapsed 40k events
    want = oracle_reduce(
        pads.dataset(tmp_wal, partitioning="hive").to_table().to_pandas()
    ).reset_index(drop=True)
    got = got[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)

    # lake files stay small: per-epoch deltas bounded by the keyspace
    # (one winner per key per epoch), not by the 40k raw events
    m = eng.manifest.read_epoch(eng.manifest.last_committed_epoch())
    n_epochs = 4
    assert sum(i["rows"] for i in m["partitions"].values()) <= 20 * 4 * (n_epochs + 1)


def test_salted_topk_equals_unsalted():
    """Hot-key salted two-stage top-k ≡ direct per-key top-k on a
    Zipf-skewed key (one key holds ~60% of rows)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data
    from agr_loader_ray.stages.partition import salted_topk_per_key

    rng = np.random.default_rng(4)
    n = 20_000
    keys = np.where(rng.random(n) < 0.6, 7, rng.integers(0, 50, n))
    vals = rng.integers(0, 1_000_000, n)
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "v": pa.array(vals, pa.int64()),
                  "rid": pa.array(np.arange(n), pa.int64())})
    ds = ray.data.from_arrow(t)

    got = salted_topk_per_key(ds, "k", ["v", "rid"], [False, True], k=5,
                              hot_keys=[7], n_salt=8).to_pandas()
    want = (t.to_pandas().sort_values(["v", "rid"], ascending=[False, True])
            .groupby("k", sort=False).head(5))
    got = got.sort_values(["k", "v", "rid"], ascending=[True, False, True]).reset_index(drop=True)
    want = want.sort_values(["k", "v", "rid"], ascending=[True, False, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "v", "rid"]], want[["k", "v", "rid"]])

"""End-to-end corpus-cleaning pipeline tests."""

import os

import pyarrow.parquet as pq

from agr_loader_ray.pipelines.corpus import build_clean_corpus

SF = "/root/testdata/sf0.001"


def test_build_clean_corpus(tmp_path):
    out = str(tmp_path / "corpus")
    info = build_clean_corpus(SF, out, min_tokens=10)
    assert info["input_docs"] == 500
    assert 0 < info["final_docs"] <= info["after_exact_dedup"] <= info["input_docs"]
    assert info["final_docs"] == info["after_exact_dedup"] - info["near_dup_removed"]

    files = [f for f in os.listdir(info["path"]) if f.endswith(".parquet")]
    t = pq.read_table([os.path.join(info["path"], f) for f in files])
    assert t.num_rows == info["final_docs"]
    assert {"doc_id", "text", "n_tokens", "en_ratio"} <= set(t.schema.names)
    # survivors respect the quality floor
    import numpy as np
    assert (np.asarray(t["n_tokens"].to_numpy(zero_copy_only=False)) >= 10).all()

    # resume: second call is a manifest no-op
    info2 = build_clean_corpus(SF, out)
    assert info2 == info

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


def test_clean_corpus_distributed_branch_same_output(tmp_path, monkeypatch):
    """Forcing the distributed label-propagation branch produces the
    identical final corpus as the driver union-find branch."""
    import agr_loader_ray.pipelines.corpus as corpus_mod
    import ray.data

    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    sf = "/root/testdata/sf0.001"

    info_a = corpus_mod.build_clean_corpus(sf, out_a)
    monkeypatch.setattr(corpus_mod, "_PAIR_DRIVER_LIMIT", 0)
    info_b = corpus_mod.build_clean_corpus(sf, out_b)

    da = ray.data.read_parquet(info_a["path"]).to_pandas().sort_values("doc_id").reset_index(drop=True)
    db = ray.data.read_parquet(info_b["path"]).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert info_a["final_docs"] == info_b["final_docs"]
    assert (da["doc_id"] == db["doc_id"]).all()


def test_clean_corpus_with_decontamination(tmp_path):
    """benchmark_source drops (a) every benchmark doc and (b) every
    surviving training doc sharing a token 4-gram with the benchmark —
    cross-checked against a pure-pandas shingle scan of the output."""
    import numpy as np
    import pandas as pd

    out = str(tmp_path / "corpus")
    info = build_clean_corpus(SF, out, min_tokens=10, benchmark_source="src0")
    assert info["benchmark_excluded"] > 0
    assert info["contaminated_removed"] >= 0
    assert info["final_docs"] == (info["after_exact_dedup"]
                                  - info["near_dup_removed"]
                                  - info["benchmark_excluded"]
                                  - info["contaminated_removed"])

    files = [f for f in os.listdir(info["path"]) if f.endswith(".parquet")]
    t = pq.read_table([os.path.join(info["path"], f) for f in files])
    df = t.to_pandas()
    assert (df["source"] != "src0").all()

    # no surviving doc shares a 4-gram with the raw benchmark set
    raw = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["text", "source"])
    def grams(text):
        toks = text.split(" ")
        return {" ".join(toks[i:i + 4]) for i in range(len(toks) - 3)}
    bench = set()
    for txt in raw.loc[raw["source"] == "src0", "text"]:
        bench |= grams(txt)
    for txt in df["text"]:
        assert not (grams(txt) & bench)

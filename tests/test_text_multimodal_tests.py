"""Text-kernel exactness + multimodal plumbing tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from agr_loader_ray.stages.multimodal import DecodeImage, synth_media_table
from agr_loader_ray.stages.text import fingerprint_batch, token_quality_batch


def test_token_quality_matches_python():
    texts = ["a data row", "table value value a", "xyz", "one  two"]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)})
    out = token_quality_batch(t).to_pylist()
    stop = {"a", "data", "table", "row", "value"}
    for row, text in zip(out, texts):
        toks = text.split(" ")
        assert row["n_tokens"] == len(toks)
        assert row["n_chars_calc"] == len(text)
        assert row["stop_ratio"] == round(sum(w in stop for w in toks) / len(toks), 4)


def test_fingerprint_polynomial_exact():
    t = pa.table({"text": pa.array(["ab", "ba", "ab"])})
    out = fingerprint_batch(t)["fingerprint"].to_pylist()
    # h("ab") = 97*257 + 98
    assert out[0] == 97 * 257 + 98
    assert out[0] != out[1]
    assert out[0] == out[2]


def test_decode_image_stub_raises_without_fake():
    dec = DecodeImage()
    with pytest.raises(NotImplementedError):
        dec._decode(b"xxxxxxxx", 4, 4)


def test_multimodal_pipeline_with_fake_codec():
    tbl = synth_media_table(n=32)
    ds = ray.data.from_arrow(tbl)
    out = ds.map_batches(
        DecodeImage, fn_constructor_kwargs={"fake": True, "out_size": 8},
        batch_format="pyarrow", batch_size=8, concurrency=2,
    ).to_pandas()
    assert len(out) == 32
    assert all(len(f) == 8 for f in out["feature"])
    # deterministic: same payload -> same feature
    out2 = ray.data.from_arrow(tbl).map_batches(
        DecodeImage, fn_constructor_kwargs={"fake": True, "out_size": 8},
        batch_format="pyarrow", batch_size=8, concurrency=2,
    ).to_pandas()
    f1 = np.stack(out.sort_values("media_id")["feature"].to_numpy())
    f2 = np.stack(out2.sort_values("media_id")["feature"].to_numpy())
    np.testing.assert_array_equal(f1, f2)

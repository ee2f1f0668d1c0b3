"""Text-analysis stages for large-scale training-data pipelines.

Vectorized per-batch kernels over a ``text`` column: token counting,
quality scoring, language-ID heuristic, and rolling-hash document
fingerprinting.  All are stateless ``map_batches`` transforms except
LangId, which compiles its token regex once per actor (the reference's
pattern of loading helper state once per worker — SURVEY §2.3 T1).

Reference analogues: HTML-strip / text cleanup
(``/root/reference/src/etl/helpers/text_processing_helper.py:8-17``) and
regex field extraction (``/root/reference/src/etl/vep_etl.py:81-142``) —
generalized to the text operators a 100 TB document pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: tiny embedded stopword list for the heuristic scorers (deterministic,
#: matched exactly by the DuckDB oracles in pipelines/queries.py)
STOPWORDS = ("a", "data", "table", "row", "value")

_ENGLISH_MARKERS = frozenset(
    "the a an and or of to in is are was be on at it this that with for as".split()
)


def token_quality_batch(t: pa.Table, text_col: str = "text",
                        stopwords: tuple[str, ...] = STOPWORDS) -> pa.Table:
    """Per-doc token count, char count and stopword ratio (quality score).

    Tokenization = split on single space (mirrors the SQL oracle's
    ``string_split(text, ' ')`` exactly, empty tokens kept in the count).
    """
    toks = pc.split_pattern(t[text_col], " ")
    n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
    flat = pc.list_flatten(toks)
    is_stop = pc.is_in(flat, value_set=pa.array(stopwords))
    # per-row stop counts: reduce the flattened mask by list offsets
    counts = np.asarray(is_stop.cast(pa.int64()).to_numpy(zero_copy_only=False))
    lengths = np.asarray(n_tokens.to_numpy(zero_copy_only=False))
    ends = np.cumsum(lengths)
    csum = np.concatenate([[0], np.cumsum(counts)])
    stops = csum[ends] - csum[ends - lengths]
    out = {name: t[name] for name in t.column_names}
    out["n_tokens"] = n_tokens
    out["n_chars_calc"] = pc.cast(pc.utf8_length(t[text_col]), pa.int64())
    # exact integer hit count (a rounded ratio ties at half-ulp and then
    # differs between numpy banker's rounding and SQL half-away rounding)
    out["stop_hits"] = pa.array(stops.astype(np.int64))
    out["stop_ratio"] = pa.array(stops / np.maximum(lengths, 1), pa.float64())
    return pa.table(out)


class LangId:
    """Heuristic language ID: ratio of English-marker tokens.

    Actor-pool stage (``map_batches(LangId, concurrency=N)``): the token
    regex is compiled once per actor in ``__init__``.
    """

    def __init__(self, threshold: float = 0.05):
        self.threshold = threshold
        # marker value_set built once per actor
        self.markers = pa.array(sorted(_ENGLISH_MARKERS), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch["text"].combine_chunks() if isinstance(
            batch["text"], pa.ChunkedArray) else batch["text"]
        # token runs of [a-z'] == split on the complement, drop empties —
        # identical multiset to findall("[a-z']+"), fully vectorized
        lists = pc.split_pattern_regex(pc.utf8_lower(col), pattern="[^a-z']+")
        lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
        flat = pc.list_flatten(lists)
        offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts_all = np.diff(offsets)
        row_idx = np.repeat(np.arange(len(counts_all)), counts_all)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        marker = pc.is_in(flat, value_set=self.markers).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        tok_counts = np.bincount(row_idx[nonempty], minlength=n)
        marker_counts = np.bincount(row_idx[marker], minlength=n)
        # unrounded: identical int inputs → identical double → identical
        # threshold compare on the SQL-oracle side
        en_ratio = marker_counts / np.maximum(1, tok_counts)
        batch = batch.append_column("en_ratio", pa.array(en_ratio, pa.float64()))
        return batch.append_column(
            "pred_lang",
            pa.array(np.where(en_ratio > self.threshold, "en", "other"), pa.string()),
        )


def fingerprint_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit polynomial rolling-hash fingerprint per document.

    ``h = sum(cp[i] * B^(n-1-i)) mod 2^64`` with B=257 over the Unicode
    CODE POINTS (not UTF-8 bytes) — deterministic across processes and
    exactly mirrored by the DuckDB ``list_reduce`` Horner oracle
    (``unicode()`` yields code points, so the choice makes the gate
    correct for non-ASCII documents too).  Vectorized via a single
    UTF-32 decode per row.
    """
    col = t[text_col].combine_chunks()
    texts = col.to_pylist()
    bufs = [s.encode("utf-32-le") if s is not None else b"" for s in texts]
    lens = np.array([len(b) // 4 for b in bufs], dtype=np.int64)
    all_bytes = np.frombuffer(b"".join(bufs), dtype=np.uint32).astype(np.uint64)
    B = np.uint64(257)
    max_len = int(lens.max(initial=0)) + 1
    with np.errstate(over="ignore"):
        pows = np.empty(max_len, dtype=np.uint64)
        pows[0] = 1
        if max_len > 1:
            np.multiply.accumulate(np.full(max_len - 1, B), out=pows[1:], dtype=np.uint64)
        # weight of byte at local position p in a doc of length L is B^(L-1-p):
        # computed for ALL docs at once via offset arithmetic, then one
        # segment-sum (reduceat) — no per-document loop
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        if len(all_bytes):
            row_idx = np.repeat(np.arange(len(lens)), lens)
            local = np.arange(len(all_bytes), dtype=np.int64) - starts[row_idx]
            weighted = all_bytes * pows[lens[row_idx] - 1 - local]
            # reduceat only at NON-EMPTY docs' starts: clamping an
            # empty trailing doc's start to len-1 would split the
            # previous doc's last element into the empty segment
            nz = lens > 0
            out = np.zeros(len(lens), dtype=np.uint64)
            out[nz] = np.add.reduceat(weighted, starts[nz])
        else:
            out = np.zeros(len(lens), dtype=np.uint64)
    res = {name: t[name] for name in t.column_names}
    res["fingerprint"] = pa.array(out.astype(np.int64))
    return pa.table(res)


BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(col) -> "pa.ChunkedArray":
    """BPE-style pretokenizer token count (GPT-2-ish classes: contraction
    suffixes, letter runs, digit runs, punctuation runs) — one vectorized
    ``count_substring_regex`` pass, no tokenizer state."""
    import pyarrow.compute as pc

    return pc.cast(pc.count_substring_regex(col, pattern=BPE_PRETOKEN_RE), pa.int64())


def greedy_pack_bins(tok: np.ndarray, budget: int) -> np.ndarray:
    """Greedy sequential bin packing: accumulate docs in order; a doc
    that would overflow ``budget`` starts a new bin (an oversized doc
    gets its own bin).  Returns the 0-based bin id per doc.

    O(n_bins) iterations, each one C-speed ``searchsorted`` on the token
    cumsum — no per-doc Python.  Equivalent to the sequential
    definition: ``cum + n <= budget → same bin, else new bin with
    cum = n`` (the recursive-CTE oracle in pipelines/text_queries.py).
    """
    tok = np.asarray(tok, dtype=np.int64)
    n = len(tok)
    bins = np.zeros(n, dtype=np.int64)
    if n == 0:
        return bins
    cum = np.cumsum(tok)
    start, b, base = 0, 0, 0
    while start < n:
        j = int(np.searchsorted(cum, base + budget, side="right"))
        if j <= start:  # oversized doc: its own bin
            j = start + 1
        bins[start:j] = b
        b += 1
        base = int(cum[j - 1])
        start = j
    return bins


def hash_embed_texts(texts: list, dim: int = 16) -> np.ndarray:
    """Deterministic feature-hashing text embedding: signed character-
    trigram counts hashed into ``dim`` buckets, L2-normalized float64.

    A stand-in for a model embedder (the image-decode precedent,
    stages/multimodal.py: no ML libs in this container, so the FEATURE
    step is a deterministic fake while the Ray plumbing — batch shape,
    actor signature, output layout — is real); deterministic across
    processes, which is what makes incremental-index-vs-rebuild
    equality testable.  Fully vectorized: one UTF-32 decode per row,
    trigram hashes / bucket scatter via numpy on the concatenated
    code-point buffer — no per-document loop.  Empty/None docs embed to
    the zero vector.
    """
    bufs = [s.encode("utf-32-le") if s else b"" for s in texts]
    lens = np.array([len(b) // 4 for b in bufs], dtype=np.int64)
    n = len(texts)
    out = np.zeros((n, dim), dtype=np.float64)
    cps = np.frombuffer(b"".join(bufs), dtype=np.uint32).astype(np.uint64)
    if len(cps):
        with np.errstate(over="ignore"):
            B = np.uint64(1000003)
            tri = np.zeros(len(cps), dtype=np.uint64)
            if len(cps) >= 3:
                tri[:-2] = (cps[:-2] * B + cps[1:-1]) * B + cps[2:]
            # splitmix64-style finalizer for bucket/sign dispersion
            h = tri + np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(30); h *= np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(27); h *= np.uint64(0x94D049BB133111EB)
            h ^= h >> np.uint64(31)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        row_idx = np.repeat(np.arange(n), lens)
        local = np.arange(len(cps), dtype=np.int64) - starts[row_idx]
        valid = local <= lens[row_idx] - 3  # trigram fits inside its doc
        bucket = (h[valid] % np.uint64(dim)).astype(np.int64)
        sign = 1.0 - 2.0 * ((h[valid] >> np.uint64(32)) & np.uint64(1)).astype(np.float64)
        np.add.at(out.reshape(-1), row_idx[valid] * dim + bucket, sign)
    norms = np.linalg.norm(out, axis=1)
    nz = norms > 0
    out[nz] /= norms[nz, None]
    return out

"""Exact DuckDB oracles for the sketch operators (MinHash-LSH, SimHash,
LSH-verified Jaccard).

The sketches are seed-derived: every permutation parameter, multiplier
and power is a deterministic constant, so the whole signature pipeline
is expressible in SQL by inlining those constants and running the same
wrap-mod-2^64 arithmetic in HUGEINT.  These oracles are therefore full
independent SQL reimplementations of the operators — typed-hash exact,
not recall-dependent:

- shingle hash  = Σ cp[i+j]·F^j  (mod 2^64) over code points, k=5
- minhash sig   = min over shingles of ((a·h mod 2^64) + b mod 2^64) mod P
- band hash     = fold over r rows: bh ← (bh·F mod 2^64) XOR sig
- simhash sig   = per-bit shingle majority, 4×16-bit chunk banding
- verified pair = LSH candidate ∧ exact distinct-shingle Jaccard ≥ t

Mirrors ``stages/dedup.py`` (MinHasher/SimHasher/minhash_lsh_candidates/
simhash_near_dup_pairs/verify_pairs_jaccard) constant for constant.
Documents shorter than k are INCLUDED on both sides: the Python
fallback for sub-k docs is the same code-point polynomial evaluated
over the doc's full (shorter) length, so the oracle reproduces it with
k-1 guarded terms — no ``length(text) >= k`` exclusion remains in the
minhash family.
"""

from __future__ import annotations

import numpy as np

_MASK = "18446744073709551615"  # 2^64 - 1: x & _MASK == x mod 2^64 for
# non-negative x — HUGEINT `%` is a 128-bit division (~70x slower than the
# bitwise AND on the 16M-row signature projection)
_PRIME = "2305843009213693951"  # 2^61 - 1
_F = 1099511628211


def _fpows(k: int) -> list[int]:
    """F^j mod 2^64 for j in 0..k-1 (numpy wrap, same as MinHasher)."""
    with np.errstate(over="ignore"):
        p = np.power(np.uint64(_F), np.arange(k, dtype=np.uint64))
    return [int(x) for x in p]


def _shingle_ctes(k: int = 5, source: str = "documents") -> str:
    """Shared CTE prefix: docs → per-window code-point polynomial hash.

    ``source``: table or CTE name the documents come from (the
    clean_corpus oracle points this at its filtered/deduped stage)."""
    pows = _fpows(k)
    terms = " + ".join(
        f"unicode(substring(text, i + {j}, 1))::HUGEINT * {pows[j]}"
        for j in range(k)
    )
    # sub-k docs: ONE window — the same polynomial over the doc's full
    # (shorter) length; out-of-range positions contribute 0 (guarded —
    # DuckDB unicode('') is -1, not 0).  Empty text hashes to 0, exactly
    # like the Python fallback.
    short_terms = " + ".join(
        f"CASE WHEN length(text) >= {j + 1} THEN "
        f"unicode(substring(text, {j + 1}, 1))::HUGEINT * {pows[j]} "
        f"ELSE 0::HUGEINT END"
        for j in range(k - 1)
    )
    return f"""
    docs AS (
      SELECT doc_id, text FROM {source}
    ),
    shp AS (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - {k - 1}, 1))) AS i
      FROM docs
    ),
    shh AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN length(text) >= {k} THEN ({terms}) & {_MASK}
                  ELSE ({short_terms}) & {_MASK} END AS h
      FROM shp
    )"""


def _minhash_pair_ctes(num_perm: int = 64, bands: int = 16, k: int = 5,
                       seed: int = 42, max_bucket: int = 64,
                       source: str = "documents") -> str:
    """CTE chain ending in ``cand(id_a, id_b)`` — the LSH candidate pairs."""
    from ..stages.dedup import MinHasher

    mh = MinHasher(num_perm=num_perm, k=k, seed=seed)
    r = num_perm // bands
    a_lst = "[" + ", ".join(str(int(x)) for x in mh.a) + "]"
    b_lst = "[" + ", ".join(str(int(x)) for x in mh.b) + "]"
    # band fold, unrolled over the r rows of each band:
    # bh = 0; for each row: bh = (bh*F mod 2^64) xor sig  →  first row is sig
    fold = "ss[1]"
    for j in range(2, r + 1):
        fold = f"xor((({fold} * {_F}) & {_MASK}), ss[{j}])"
    return f"""{_shingle_ctes(k, source=source)},
    hm AS (
      -- h < 2^64: the mod-P reduce runs in UBIGINT (64-bit division)
      SELECT doc_id, h::UBIGINT % {_PRIME} AS hp FROM shh
    ),
    perms AS MATERIALIZED (
      -- materialized: otherwise the list literals are rebuilt per joined row
      SELECT i AS p, ({a_lst}::HUGEINT[])[i] AS pa, ({b_lst}::HUGEINT[])[i] AS pb
      FROM (SELECT unnest(generate_series(1, {num_perm})) AS i)
    ),
    sig AS (
      -- numpy wraps a*h and +b at 2^64 before the mod-P reduce; mirror it
      SELECT doc_id, p,
             min(((((pa * hp) & {_MASK}) + pb) & {_MASK})::UBIGINT
                 % {_PRIME})::HUGEINT AS s
      FROM hm CROSS JOIN perms GROUP BY doc_id, p
    ),
    bsig AS (
      SELECT doc_id, (p - 1) // {r} AS band, list(s ORDER BY p) AS ss
      FROM sig GROUP BY doc_id, (p - 1) // {r}
    ),
    bh AS MATERIALIZED (
      SELECT doc_id, band, {fold} AS bhv FROM bsig
    ),
    bsize AS (
      SELECT band, bhv, count(*) AS n FROM bh GROUP BY band, bhv
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bh a
      JOIN bh b ON a.band = b.band AND a.bhv = b.bhv AND a.doc_id < b.doc_id
      JOIN bsize s ON s.band = a.band AND s.bhv = a.bhv
      WHERE s.n <= {max_bucket}
    )"""


def minhash_near_dup_sql(num_perm: int = 64, bands: int = 16, k: int = 5,
                         seed: int = 42, max_bucket: int = 64) -> str:
    return f"""
    WITH {_minhash_pair_ctes(num_perm, bands, k, seed, max_bucket)}
    SELECT id_a, id_b FROM cand
    """


def minhash_verified_pairs_sql(threshold: float = 0.5, num_perm: int = 64,
                               bands: int = 16, k: int = 5, seed: int = 42,
                               max_bucket: int = 64) -> str:
    """LSH candidates ∩ exact distinct-shingle Jaccard ≥ threshold."""
    return f"""
    WITH {_minhash_pair_ctes(num_perm, bands, k, seed, max_bucket)},
    dsh AS MATERIALIZED (
      SELECT DISTINCT doc_id, h FROM shh
    ),
    sizes AS (
      SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id
    ),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS c
      FROM cand c
      JOIN dsh a ON a.doc_id = c.id_a
      JOIN dsh b ON b.doc_id = c.id_b AND b.h = a.h
      GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b,
           CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= {threshold}
    """


def simhash_near_dup_sql(k: int = 5, max_hamming: int = 3) -> str:
    pow16 = "[" + ", ".join(str(1 << (16 * c)) for c in range(4)) + "]"
    return f"""
    WITH {_shingle_ctes(k)},
    nsh AS (
      SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id
    ),
    bitc AS (
      -- per (doc, bit): count of shingle hashes with that bit set
      SELECT doc_id, k,
             count(*) FILTER (((h::UBIGINT >> k) & 1) = 1) AS c1
      FROM (SELECT doc_id, h, unnest(generate_series(0, 63)) AS k FROM shh)
      GROUP BY doc_id, k
    ),
    sig AS MATERIALIZED (
      -- bit set iff the majority vote is positive: 2*c1 > n_shingles
      SELECT b.doc_id,
             CAST(sum(CASE WHEN 2 * b.c1 > nsh.n
                           THEN (1::UBIGINT << b.k)::HUGEINT ELSE 0::HUGEINT END)
                  AS HUGEINT) AS sg
      FROM bitc b JOIN nsh ON nsh.doc_id = b.doc_id
      GROUP BY b.doc_id
    ),
    buck AS MATERIALIZED (
      SELECT doc_id, sg, c, (sg // ({pow16}::HUGEINT[])[c + 1]) % 65536 AS chash
      FROM (SELECT doc_id, sg, unnest(generate_series(0, 3)) AS c FROM sig)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sg::UBIGINT, b.sg::UBIGINT)) AS BIGINT) AS hamming
    FROM buck a
    JOIN buck b ON a.c = b.c AND a.chash = b.chash AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sg::UBIGINT, b.sg::UBIGINT)) <= {max_hamming}
    """


# ---------------------------------------------------------------------------
# ANN oracles: the hyperplane matrix / centroid choice is deterministic, so
# the bucketing + pruning + exact-cosine-top-k pipeline is SQL-expressible.
# ---------------------------------------------------------------------------
def ann_lsh_topk_sql(dim: int = 64, n_planes: int = 6, probe_hamming: int = 2,
                     k: int = 10, seed: int = 42) -> str:
    """Mirror of ``lsh_bucketed_topk``: inlines the seed-42 hyperplane
    matrix (full float64 repr round-trips exactly through the SQL parser),
    computes each vector's sign-pattern bucket, prunes to buckets within
    ``probe_hamming`` of the query's, then exact cosine top-k.  ``dim``
    must match the embeddings table (fixture: 64)."""
    from ..stages.similarity import HyperplaneLSH

    planes = HyperplaneLSH(dim, n_planes, seed).planes  # (dim, n_planes)
    bucket_terms = " + ".join(
        "CASE WHEN list_dot_product(v, [{}]) > 0 THEN {} ELSE 0 END".format(
            ", ".join(repr(float(x)) for x in planes[:, j]), 1 << j)
        for j in range(n_planes)
    )
    return f"""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    bucketed AS MATERIALIZED (
      SELECT vec_id, v, ({bucket_terms}) AS bucket FROM base
    ),
    qb AS (
      SELECT bucket AS b, v AS qv FROM bucketed WHERE vec_id = 0
    )
    SELECT t.vec_id, round(list_cosine_similarity(t.v, qb.qv), 6) AS sim
    FROM bucketed t, qb
    WHERE t.vec_id <> 0
      AND bit_count(xor(t.bucket::BIGINT, qb.b::BIGINT)) <= {probe_hamming}
    ORDER BY sim DESC, t.vec_id
    LIMIT {k}
    """


def ann_ivf_topk_sql(n_cells: int = 16, n_probe: int = 6, k: int = 10) -> str:
    """Mirror of ``ivf_topk`` with deterministic centroids = the embedding
    vectors of vec_id 1..n_cells (cell c ⇔ vec_id c+1).  Assignment is
    argmin distance (ties → lowest cell, both sides); only the n_probe
    cells nearest the query are scanned; exact cosine top-k inside."""
    return f"""
    WITH cents AS MATERIALIZED (
      SELECT vec_id - 1 AS cell, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id BETWEEN 1 AND {n_cells}
    ),
    base AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id <> 0
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT b.vec_id, c.cell,
               row_number() OVER (PARTITION BY b.vec_id
                                  ORDER BY list_distance(b.v, c.cv), c.cell) AS rn
        FROM base b CROSS JOIN cents c) t
      WHERE rn = 1
    ),
    qv AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ),
    probe AS (
      SELECT cell FROM (
        SELECT c.cell, row_number() OVER (ORDER BY list_distance(c.cv, qv.qv),
                                          c.cell) AS rn
        FROM cents c, qv) t
      WHERE rn <= {n_probe}
    )
    SELECT b.vec_id, round(list_cosine_similarity(b.v, qv.qv), 6) AS sim
    FROM base b
    JOIN assign a ON a.vec_id = b.vec_id
    JOIN probe p ON p.cell = a.cell
    CROSS JOIN qv
    ORDER BY sim DESC, b.vec_id
    LIMIT {k}
    """


# ---------------------------------------------------------------------------
# Multimodal oracles: synth payload bytes come from a multiplicative-hash
# formula (stages/multimodal._hash_bytes), so decode → integer feature
# extraction is byte-exactly recomputable in SQL with no media input —
# the gate proves the codec/slicing inverted the encoder exactly.
# ---------------------------------------------------------------------------
_HASH_A = 6364136223846793005


def multimodal_image_sql(n: int = 256, seed: int = 42, size: int = 16) -> str:
    """Mirror of synth_media_table → png_encode → DecodeImage(real):
    pixel(m, i) = ((A·((m+seed)·65536 + i + 1)) mod 2^64 >> 24) % 256."""
    npx = size * size
    return f"""
    WITH px AS (
      SELECT m, i,
             ((({_HASH_A}::HUGEINT * ((m + {seed}) * 65536 + i + 1))
               & {_MASK})::UBIGINT >> 24)::BIGINT % 256 AS p
      FROM (SELECT unnest(generate_series(0, {n - 1})) AS m)
      CROSS JOIN (SELECT unnest(generate_series(0, {npx - 1})) AS i)
    )
    SELECT m AS media_id,
           CAST(sum(p) AS BIGINT) AS px_sum,
           CAST(sum(p * (i + 1)) AS BIGINT) AS px_checksum,
           count(*) AS n_px
    FROM px GROUP BY m
    """


def multimodal_audio_sql(n: int = 128, samples: int = 8000) -> str:
    """Mirror of synth_audio_hash_table → DecodeAudioPCM integer features:
    s(m, t) = hash16(m·samples + t) - 32768; sumsq = Σ s², zc_count =
    sign flips (s < 0 vs previous)."""
    return f"""
    WITH samp AS (
      SELECT m, t,
             ((({_HASH_A}::HUGEINT * (m * {samples} + t + 1))
               & {_MASK})::UBIGINT >> 24)::BIGINT % 65536 - 32768 AS s
      FROM (SELECT unnest(generate_series(0, {n - 1})) AS m)
      CROSS JOIN (SELECT unnest(generate_series(0, {samples - 1})) AS t)
    )
    SELECT m AS media_id,
           count(*) AS n_samples,
           CAST(sum(s * s) AS BIGINT) AS sumsq,
           CAST(count(*) FILTER (prev IS NOT NULL AND (s < 0) <> (prev < 0))
                AS BIGINT) AS zc_count
    FROM (SELECT m, s, lag(s) OVER (PARTITION BY m ORDER BY t) AS prev FROM samp)
    GROUP BY m
    """


def multimodal_frames_sql(n: int = 32, seed: int = 42, n_frames: int = 24,
                          frame_bytes: int = 1024, every_k: int = 8,
                          max_frames: int = 8) -> str:
    """Mirror of synth_video_table → SampleFrames → frame_checksums:
    byte(m, j) = hash8((m+seed)·2^24 + j); sampled frames are every_k-th
    up to max_frames; weights are 1-based within-frame positions."""
    lim = min(n_frames, every_k * max_frames)
    picks = "[" + ", ".join(str(i) for i in range(0, lim, every_k)) + "]::BIGINT[]"
    return f"""
    WITH fb AS (
      SELECT m, fi, t,
             ((({_HASH_A}::HUGEINT * ((m + {seed}) * 16777216
                                      + fi * {frame_bytes} + t + 1))
               & {_MASK})::UBIGINT >> 24)::BIGINT % 256 AS b
      FROM (SELECT unnest(generate_series(0, {n - 1})) AS m)
      CROSS JOIN (SELECT unnest({picks}) AS fi)
      CROSS JOIN (SELECT unnest(generate_series(0, {frame_bytes - 1})) AS t)
    )
    SELECT m AS media_id, fi AS frame_idx,
           CAST(sum(b) AS BIGINT) AS frame_sum,
           CAST(sum(b * (t + 1)) AS BIGINT) AS frame_checksum,
           count(*) AS frame_len
    FROM fb GROUP BY m, fi
    """


def multimodal_resize_sql(n: int = 128, seed: int = 42, size: int = 16,
                          factor: int = 2) -> str:
    """Mirror of synth_media_table → png_encode → ResizeImage: both the
    nearest-neighbor gather (pixel at (ry·f, rx·f)) and the 2×2 block-sum
    pool, recomputed from the generative hash formula
    pixel(m, i) = ((A·((m+seed)·65536 + i + 1)) mod 2^64 >> 24) % 256."""
    out = size // factor
    px = (f"((({_HASH_A}::HUGEINT * ((m + {seed}) * 65536 + {{idx}} + 1))"
          f" & {_MASK})::UBIGINT >> 24)::BIGINT % 256")
    return f"""
    WITH g AS (
      SELECT m, ry, rx, (ry * {out} + rx) AS j
      FROM (SELECT unnest(generate_series(0, {n - 1})) AS m)
      CROSS JOIN (SELECT unnest(generate_series(0, {out - 1})) AS ry)
      CROSS JOIN (SELECT unnest(generate_series(0, {out - 1})) AS rx)),
    near AS (
      SELECT m, j,
             {px.format(idx=f"(ry * {factor} * {size} + rx * {factor})")} AS p
      FROM g),
    poolpx AS (
      SELECT m, j,
             {px.format(idx=f"((ry * {factor} + dy) * {size} + rx * {factor} + dx)")} AS p
      FROM g
      CROSS JOIN (SELECT unnest(generate_series(0, {factor - 1})) AS dy)
      CROSS JOIN (SELECT unnest(generate_series(0, {factor - 1})) AS dx)),
    poolsum AS (
      SELECT m, j, CAST(sum(p) AS BIGINT) AS b FROM poolpx GROUP BY m, j)
    SELECT nn.media_id, nn.rz_sum, nn.rz_checksum, pp.pool_checksum,
           nn.n_px_out
    FROM (SELECT m AS media_id, CAST(sum(p) AS BIGINT) AS rz_sum,
                 CAST(sum(p * (j + 1)) AS BIGINT) AS rz_checksum,
                 count(*) AS n_px_out
          FROM near GROUP BY m) nn
    JOIN (SELECT m AS media_id, CAST(sum(b * (j + 1)) AS BIGINT) AS pool_checksum
          FROM poolsum GROUP BY m) pp USING (media_id)
    ORDER BY media_id
    """


def multimodal_augment_sql(n: int = 128, seed: int = 42, size: int = 16,
                           brightness: int = 40) -> str:
    """Mirror of synth_media_table → png_encode → AugmentImage: flip /
    center-crop / brightness proofs recomputed from the generative
    pixel formula (same hash as multimodal_resize_sql)."""
    q, c = size // 4, size // 2
    px = (f"((({_HASH_A}::HUGEINT * ((m + {seed}) * 65536 + (y * {size} + x) + 1))"
          f" & {_MASK})::UBIGINT >> 24)::BIGINT % 256")
    return f"""
    WITH g AS (
      SELECT m, y, x, {px} AS v
      FROM (SELECT unnest(generate_series(0, {n - 1})) AS m)
      CROSS JOIN (SELECT unnest(generate_series(0, {size - 1})) AS y)
      CROSS JOIN (SELECT unnest(generate_series(0, {size - 1})) AS x))
    SELECT m AS media_id,
           CAST(sum(v * (y * {size} + ({size} - 1 - x) + 1)) AS BIGINT)
             AS flip_checksum,
           CAST(sum(CASE WHEN y BETWEEN {q} AND {q + c - 1}
                          AND x BETWEEN {q} AND {q + c - 1}
                         THEN v ELSE 0 END) AS BIGINT) AS crop_sum,
           CAST(sum(CASE WHEN y BETWEEN {q} AND {q + c - 1}
                          AND x BETWEEN {q} AND {q + c - 1}
                         THEN v * ((y - {q}) * {c} + (x - {q}) + 1)
                         ELSE 0 END) AS BIGINT) AS crop_checksum,
           CAST(sum(least(v + {brightness}, 255)) AS BIGINT) AS bright_sum,
           CAST(count(*) AS BIGINT) AS n_px
    FROM g GROUP BY m
    """


def multimodal_audio_windows_sql(n: int = 64, samples: int = 8000,
                                 win: int = 1024) -> str:
    """Mirror of synth_audio_hash_table → FrameAudioWindows: per
    (clip, window) exact integer energy and peak over full windows."""
    nw = samples // win
    return f"""
    WITH samp AS (
      SELECT m, t,
             ((({_HASH_A}::HUGEINT * (m * {samples} + t + 1))
               & {_MASK})::UBIGINT >> 24)::BIGINT % 65536 - 32768 AS s
      FROM (SELECT unnest(generate_series(0, {n - 1})) AS m)
      CROSS JOIN (SELECT unnest(generate_series(0, {nw * win - 1})) AS t)
    )
    SELECT m AS media_id, CAST(t // {win} AS BIGINT) AS window_idx,
           CAST(sum(s * s) AS BIGINT) AS energy,
           CAST(max(abs(s)) AS BIGINT) AS peak
    FROM samp GROUP BY 1, 2 ORDER BY 1, 2
    """


def clean_corpus_sql(min_tokens: int = 10, num_perm: int = 64,
                     bands: int = 16, k: int = 5, seed: int = 42,
                     max_bucket: int = 64) -> str:
    """Full SQL reimplementation of ``pipelines/corpus.build_clean_corpus``
    (no decontam stage): quality filter → langid filter → exact dedup
    (min doc_id per normalized text) → MinHash-LSH candidate pairs →
    connected components (recursive closure, min label) → drop
    non-minimal members.  Every float is the same int/int division the
    Ray kernels run; the LSH stage reuses the gate-proven
    ``_minhash_pair_ctes`` pointed at the deduped stage.  Mirrors
    stages/text.token_quality_batch + LangId, corpus.survivors_part and
    stages/dedup.resolve_duplicate_groups (group = component min)."""
    markers = ("'the','a','an','and','or','of','to','in','is','are',"
               "'was','be','on','at','it','this','that','with','for','as'")
    return f"""
    WITH RECURSIVE raw AS (
      SELECT doc_id, text, source,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 x -> x IN ('a','data','table','row','value'))) AS stop_hits
      FROM documents),
    q AS (
      SELECT doc_id, text, source, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(stop_hits AS DOUBLE) / greatest(1, n_tokens) AS stop_ratio
      FROM raw WHERE n_tokens >= {min_tokens}),
    l AS (
      SELECT *,
             CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z'']+'),
                                  x -> x IN ({markers}))) AS DOUBLE)
             / greatest(1, len(regexp_extract_all(lower(text), '[a-z'']+')))
               AS en_ratio
      FROM q),
    en AS (SELECT * FROM l WHERE en_ratio > 0.05),
    ex AS (
      SELECT doc_id, text, source, n_tokens, stop_ratio, en_ratio FROM (
        SELECT *, row_number() OVER (
          PARTITION BY lower(regexp_replace(text, '^\\s+|\\s+$', '', 'g'))
          ORDER BY doc_id) AS rn
        FROM en) t WHERE rn = 1),
    {_minhash_pair_ctes(num_perm, bands, k, seed, max_bucket, source="ex")},
    ed AS (
      SELECT id_a AS u, id_b AS v FROM cand
      UNION ALL SELECT id_b, id_a FROM cand),
    clo AS (
      SELECT u AS node, v AS r FROM ed
      UNION
      SELECT c.node, e.v FROM clo c JOIN ed e ON c.r = e.u),
    grp AS (SELECT node, least(node, min(r)) AS g FROM clo GROUP BY node),
    drops AS (SELECT node FROM grp WHERE g < node)
    SELECT ex.doc_id, ex.text, ex.source, ex.n_tokens, ex.stop_ratio,
           ex.en_ratio
    FROM ex LEFT JOIN drops d ON d.node = ex.doc_id
    WHERE d.node IS NULL
    """

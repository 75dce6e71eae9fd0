"""Deduplication operators for training-data pipelines.

Exact dedup, MinHash+LSH near-dup pairing, and SimHash signatures —
all built from JVM-side Catalyst expressions (split / transform /
aggregate / array_min / md5) so the hot path never crosses into
Python, and all hashing is md5-derived so a SQL oracle can reproduce
results bit-for-bit (Spark `conv(substr(md5(x),1,15),16,10)` ==
DuckDB `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`).

Scale notes (10^12 docs):
  * signatures are fixed-width per doc -> shuffle-light;
  * LSH candidate generation is a self-equi-join on (band, band_hash)
    — Spark hash-partitions it; hot buckets (boilerplate dups) are
    exactly the skew AQE skew-join handles;
  * exact-verify runs only on candidate pairs (tiny vs N^2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

N_HASHES = 16
BANDS = 4
ROWS_PER_BAND = 4
SHINGLE_K = 3


def hash64(col: Column, seed: int | str = 0) -> Column:
    """Deterministic 60-bit hash of a string column (md5 prefix).
    Oracle-equivalent: CAST('0x' || substr(md5(seed || ':' || x), 1, 15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col).cast("binary")), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str, seed: int | str = 0) -> str:
    """The DuckDB-side twin of hash64 (for oracle construction)."""
    return f"CAST(concat('0x', substr(md5(concat('{seed}:', {expr})), 1, 15)) AS BIGINT)"


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def shingles_col(tokens: Column, k: int = SHINGLE_K) -> Column:
    """k-token shingles (distinct); short docs collapse to one shingle."""
    joined = F.array_join(tokens, " ")
    windows = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (k - 1)),
        lambda i: F.array_join(F.slice(tokens, i, k), " "),
    )
    return F.array_distinct(F.when(F.size(tokens) < k, F.array(joined)).otherwise(windows))


def _hasher(seed: int):
    """One-arg lambda factory (a 2-param lambda would be treated by
    Spark HOFs as (element, index) — the index would silently replace
    the seed)."""
    return lambda s: hash64(s, seed)


def minhash_signature(shingles: Column, n_hashes: int = N_HASHES) -> Column:
    """Array of n_hashes min-hashes of the shingle set."""
    return F.array(*[F.array_min(F.transform(shingles, _hasher(k))) for k in range(n_hashes)])


def with_minhash(
    df: DataFrame, text_col: str = "text", out_col: str = "minhash", k: int = SHINGLE_K
) -> DataFrame:
    sh = shingles_col(tokens_col(F.col(text_col)), k)
    return df.withColumn("_shingles", sh).withColumn(out_col, minhash_signature(F.col("_shingles")))


def lsh_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    shingle_col: str = "_shingles",
    threshold: float = 0.5,
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """MinHash-LSH candidate pairs + exact Jaccard verification.

    Classic banding: a pair becomes a candidate iff it agrees on ALL
    rows of at least one band; candidates are then verified with the
    exact Jaccard of the distinct shingle sets. Output:
    (a, b, jaccard) with a < b, one row per pair (distinct across
    bands). Deterministic end to end.
    """
    cand = lsh_candidates(sigs, id_col, sig_col, bands, rows_per_band)
    # shingles re-join by id AFTER candidate generation: the band-hash
    # shuffle carries only (band, bh, id) — at 10^12 docs the shingle
    # arrays (~document-sized) would otherwise ride through the
    # heaviest exchange twice (round-2 verdict shuffle-diet item)
    sh = sigs.select(F.col(id_col).alias("_sid_"), F.col(shingle_col).alias("_ssh_"))
    cand = (
        cand.join(sh.select(F.col("_sid_").alias("a"), F.col("_ssh_").alias("sa")), "a")
        .join(sh.select(F.col("_sid_").alias("b"), F.col("_ssh_").alias("sb")), "b")
    )
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = F.size(F.array_union("sa", "sb")).cast("double")
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """Banding candidate pairs (a, b) with a < b — ids only. The
    shingle payload deliberately never enters this subplan (see
    lsh_pairs); tests assert the property on the plan."""
    band_arr = F.array(
        *[
            F.md5(
                F.concat_ws(",", *[F.element_at(sig_col, b * rows_per_band + r + 1) for r in range(rows_per_band)]).cast("binary")
            )
            for b in range(bands)
        ]
    )
    e = sigs.select(F.col(id_col).alias("_id_"), F.posexplode(band_arr).alias("band", "bh"))
    left = e.select(F.col("band"), F.col("bh"), F.col("_id_").alias("a"))
    right = e.select(F.col("band"), F.col("bh"), F.col("_id_").alias("b"))
    return (
        left.join(right, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text, keeping
    the smallest id (deterministic winner)."""
    return df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_md5")).agg(
        F.min(id_col).alias("kept_id"), F.count(F.lit(1)).alias("dup_n")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    k: int = SHINGLE_K,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join with AllPairs/PPJoin-style
    prefix filtering (Bayardo et al., WWW'07; Xiao et al., WWW'08).

    Unlike MinHash-LSH (probabilistic candidates) this is EXACT: the
    output is precisely every pair with Jaccard(shingles_a,
    shingles_b) >= threshold, but candidate generation is still an
    inverted-index equi-join, never an all-pairs product:

      1. shingle each doc into distinct k-token n-grams (Catalyst);
      2. order every doc's shingles by GLOBAL rarity — ascending
         (doc-frequency, shingle) is a strict total order;
      3. index only each doc's PREFIX: the first n - ceil(t*n) + 1
         shingles. Any pair with J >= t has overlap >= ceil(t*n) on
         both sides, so its globally-rarest common shingle sits
         inside BOTH prefixes — joining prefix-to-prefix is lossless;
      4. length filter: J >= t forces t*|b| <= |a| (and vice versa);
      5. exact verify on the surviving candidates by re-joining the
         full shingle sets by id (ids-only through the heavy shuffle,
         same diet as lsh_pairs).

    At 10^12 docs the prefix index is the scale lever: rare shingles
    lead the order, so inverted-index buckets stay small and hot
    boilerplate n-grams (huge doc-frequency) fall OUT of most
    prefixes instead of fanning out quadratically. Output
    (a, b, jaccard), a < b, deterministic.
    """
    from pyspark.sql import Window

    t = float(threshold)
    sh = df.select(
        F.col(id_col).alias("_jid_"),
        shingles_col(tokens_col(F.col(text_col)), k).alias("_jsh_"),
    )
    ex = sh.select("_jid_", F.size("_jsh_").alias("n"), F.explode("_jsh_").alias("s"))
    freq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df_"))
    w = Window.partitionBy("_jid_").orderBy(F.col("df_").asc(), F.col("s").asc())
    ranked = ex.join(freq, "s").select(
        "_jid_", "n", "s", F.row_number().over(w).alias("pos")
    )
    prefix_len = F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1
    pref = ranked.filter(F.col("pos") <= prefix_len).select("s", "_jid_", "n")
    left = pref.select("s", F.col("_jid_").alias("a"), F.col("n").alias("na"))
    right = pref.select("s", F.col("_jid_").alias("b"), F.col("n").alias("nb"))
    cand = (
        left.join(right, "s")
        .filter(
            (F.col("a") < F.col("b"))
            & (F.col("na") >= F.lit(t) * F.col("nb"))
            & (F.col("nb") >= F.lit(t) * F.col("na"))
        )
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    full = sh.select(F.col("_jid_"), F.col("_jsh_"))
    cand = (
        cand.join(full.select(F.col("_jid_").alias("a"), F.col("_jsh_").alias("sa")), "a")
        .join(full.select(F.col("_jid_").alias("b"), F.col("_jsh_").alias("sb")), "b")
    )
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = F.size(F.array_union("sa", "sb")).cast("double")
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= t)
        .select("a", "b", "jaccard")
    )


def simhash(tokens: Column, bits: int = 32, seed: int | str = "sim") -> Column:
    """SimHash signature: per bit, the sign of sum over token hashes
    of (+1 / -1); bit set iff the sum is >= 0. Pure Catalyst."""
    h = F.transform(tokens, lambda t: hash64(t, seed))

    def _bit_acc(b: int):
        return lambda a, x: a + F.when(F.shiftright(x, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)

    acc = []
    for b in range(bits):
        s = F.aggregate(h, F.lit(0).cast("long"), _bit_acc(b))
        acc.append(F.when(s >= 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long")))
    out = acc[0]
    for c in acc[1:]:
        out = out + c
    return out


def simhash_sql(text_expr: str, bits: int = 32, seed: int | str = "sim") -> str:
    """DuckDB twin of simhash() for oracle construction."""
    h = f"list_transform(string_split_regex(trim({text_expr}), '\\s+'), t -> {hash64_sql('t', seed)})"
    terms = []
    for b in range(bits):
        s = f"list_sum(list_transform({h}, x -> CASE WHEN (x >> {b}) & 1 = 1 THEN 1 ELSE -1 END))"
        terms.append(f"(CASE WHEN {s} >= 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def hamming_pairs(
    sigs: DataFrame, id_col: str = "doc_id", sig_col: str = "simhash", max_dist: int = 3, bits: int = 32, chunks: int = 4
) -> DataFrame:
    """SimHash near-dup pairs: block on signature chunks (a pair within
    hamming distance d < chunks must agree on >=1 chunk — pigeonhole),
    then verify exact hamming distance via bit_count(xor)."""
    w = bits // chunks
    chunk_arr = F.array(
        *[F.shiftright(F.col(sig_col), i * w).bitwiseAND(F.lit((1 << w) - 1)) for i in range(chunks)]
    )
    e = sigs.select(F.col(id_col).alias("_id_"), F.col(sig_col).alias("_sig_"), F.posexplode(chunk_arr).alias("ci", "cv"))
    left = e.select("ci", "cv", F.col("_id_").alias("a"), F.col("_sig_").alias("siga"))
    right = e.select("ci", "cv", F.col("_id_").alias("b"), F.col("_sig_").alias("sigb"))
    cand = (
        left.join(right, ["ci", "cv"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "siga", "sigb")
        .dropDuplicates(["a", "b"])
    )
    dist = F.bit_count(F.col("siga").bitwiseXOR(F.col("sigb")))
    return cand.withColumn("hamming", dist.cast("bigint")).filter(F.col("hamming") <= max_dist).select("a", "b", "hamming")


def substring_dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
) -> DataFrame:
    """Exact substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — the ExactSubstr
    variant): find every maximal span of >= min_len characters that
    occurs at two or more (doc, offset) positions in the corpus
    (cross-doc AND self-repetition, as in the paper). Pipelines clip
    or drop these spans before training.

    Distributed shape (the paper's single-node suffix array replaced
    by a shuffle formulation):
      1. explode every length-L character window as (id, offset,
         md5(window)) — hash only, never the window text, so the
         shuffle payload is ~16 bytes/window;
      2. groupBy(hash) count >= 2 -> the duplicated window set
         (map-side partial aggregation applies; boilerplate skew is
         AQE skew-join territory);
      3. re-join to tag each doc's duplicated offsets;
      4. merge runs of consecutive offsets into maximal spans with
         the gaps-and-islands trick (offset - row_number() is
         constant within a run) — one partitionBy(id) window, no
         driver involvement.
    Duplication is decided on md5 equality (collision odds ~2^-128,
    the paper's own hashed variant does the same).

    Output: (id, span_start, span_end) — 1-based inclusive character
    positions of each maximal duplicated span.
    """
    from pyspark.sql import Window

    L = int(min_len)
    t = F.col(text_col)
    wins = (
        df.where(F.length(t) >= L)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.length(t) - (L - 1))).alias("o"),
            t.alias("_t"),
        )
        .select(
            id_col,
            "o",
            F.md5(F.substring(F.col("_t"), F.col("o"), F.lit(L)).cast("binary")).alias("h"),
        )
    )
    dup_h = wins.groupBy("h").count().where(F.col("count") >= 2).select("h")
    dup_offs = wins.join(dup_h, "h").select(id_col, "o")
    w = Window.partitionBy(id_col).orderBy("o")
    islands = dup_offs.withColumn("grp", F.col("o") - F.row_number().over(w))
    return (
        islands.groupBy(id_col, "grp")
        .agg(
            F.min("o").cast("long").alias("span_start"),
            (F.max("o") + (L - 1)).cast("long").alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )


def substring_dup_spans_sql(
    id_expr: str, text_expr: str, min_len: int = 20, table: str = "documents"
) -> str:
    """DuckDB twin of substring_dup_spans (identical window hashing
    and islands merge)."""
    L = int(min_len)
    return (
        f"WITH w AS (SELECT {id_expr} AS id, unnest(generate_series(1, length({text_expr}) - {L - 1})) AS o, "
        f"{text_expr} AS t FROM {table} WHERE length({text_expr}) >= {L}), "
        f"h AS (SELECT id, o, md5(substr(t, CAST(o AS INTEGER), {L})) AS hh FROM w), "
        "d AS (SELECT hh FROM h GROUP BY hh HAVING count(*) >= 2), "
        "x AS (SELECT id, o FROM h JOIN d USING (hh)), "
        "i AS (SELECT id, o, o - row_number() OVER (PARTITION BY id ORDER BY o) AS grp FROM x) "
        f"SELECT id AS doc_id, CAST(MIN(o) AS BIGINT) AS span_start, CAST(MAX(o) + {L - 1} AS BIGINT) AS span_end "
        "FROM i GROUP BY id, grp"
    )


# ---------------------------------------------------------------------------
# corpus-level segment (line) dedup — the CCNet / RefinedWeb "remove
# lines duplicated across many documents" pass, over fixed k-token
# segments (the driver corpus has no newlines; a real corpus would
# pass its line splitter's output through the same machinery)


def segments_col(tokens: Column, k: int) -> Column:
    """Non-overlapping k-token segments in document order (the last
    segment may be shorter). Pure Catalyst."""
    n_seg = F.ceil(F.size(tokens) / F.lit(float(k))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(tokens, i * k + 1, k), " "),
    )


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 4,
    min_df: int = 2,
) -> DataFrame:
    """Corpus-wide segment dedup: drop every occurrence of a segment
    that appears in >= min_df DISTINCT documents (boilerplate
    removal), keep the rest in order. Returns
    (doc_id, clean_text, n_segs, n_dropped).

    Shuffle diet (10^12 docs): the document-frequency count ships
    (seg_hash, doc_id) pairs ONLY — 16 bytes, never segment text; the
    distinct + groupBy are both map-side combinable. The drop
    decision re-joins to each doc as a sorted index LIST (one small
    array per affected doc), and the text is re-segmented JVM-side
    from the original row — document text never crosses a shuffle.
    Hash collisions (60-bit md5 prefix) merge segments for df
    purposes; the SQL oracle hashes identically so the decision
    replicates bit-for-bit.
    """
    # NULL text coalesces to '' (one empty segment, same as the SQL
    # twin) — a bare NULL would ride through as _segs NULL, and
    # F.size(NULL) = -1 would surface as n_segs = -1
    toks = tokens_col(F.coalesce(F.col(text_col), F.lit("")))
    base = df.select(F.col(id_col).alias("_id"), segments_col(toks, seg_tokens).alias("_segs"))
    ex = base.select(
        "_id", F.posexplode("_segs").alias("_idx", "_seg")
    ).select("_id", "_idx", hash64(F.col("_seg"), "segdedup").alias("_h"))
    seg_df = (
        ex.select("_h", "_id").distinct().groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
    )
    hot = seg_df.filter(F.col("_df") >= min_df).select("_h")
    dropped = (
        ex.join(hot, "_h")
        .groupBy("_id")
        .agg(F.sort_array(F.collect_list("_idx")).alias("_drop"))
    )
    out = base.join(dropped, "_id", "left")
    drop = F.coalesce(F.col("_drop"), F.array().cast("array<int>"))
    kept = F.filter(
        F.transform(
            F.col("_segs"),
            lambda s, i: F.when(F.exists(drop, lambda d: d == i), F.lit(None)).otherwise(s),
        ),
        lambda s: s.isNotNull(),
    )
    return out.select(
        F.col("_id").alias(id_col),
        F.array_join(kept, " ").alias("clean_text"),
        F.size("_segs").cast("bigint").alias("n_segs"),
        F.size(drop).cast("bigint").alias("n_dropped"),
    )


def segment_dedup_sql(
    id_expr: str = "doc_id",
    text_expr: str = "text",
    seg_tokens: int = 4,
    min_df: int = 2,
    table: str = "documents",
) -> str:
    """DuckDB twin of segment_dedup (identical hashing + decisions)."""
    k = int(seg_tokens)
    h = hash64_sql("s", "segdedup")
    return (
        f"WITH tok AS (SELECT {id_expr} AS id, "
        f"string_split_regex(trim(COALESCE({text_expr}, '')), '\\s+') AS toks FROM {table}), "
        f"seg AS (SELECT id, i AS idx, array_to_string(toks[(i*{k}+1):(i*{k}+{k})], ' ') AS s, "
        f"len(toks) AS n_toks FROM tok, unnest(generate_series(0, CAST(ceil(len(toks)/{k}.0) AS INT)-1)) AS t(i)), "
        f"hh AS (SELECT id, idx, {h} AS h FROM seg), "
        "dfc AS (SELECT h FROM (SELECT DISTINCT h, id FROM hh) GROUP BY h HAVING COUNT(*) >= "
        f"{int(min_df)}), "
        "keepers AS (SELECT hh.id, hh.idx FROM hh LEFT JOIN dfc ON hh.h = dfc.h WHERE dfc.h IS NULL), "
        "reass AS (SELECT k2.id, string_agg(seg.s, ' ' ORDER BY k2.idx) AS clean_text, COUNT(*) AS n_kept "
        "FROM keepers k2 JOIN seg ON seg.id = k2.id AND seg.idx = k2.idx GROUP BY k2.id), "
        "tot AS (SELECT id, COUNT(*) AS n_segs FROM seg GROUP BY id) "
        f"SELECT CAST(tot.id AS BIGINT) AS doc_id, COALESCE(reass.clean_text, '') AS clean_text, "
        "CAST(tot.n_segs AS BIGINT) AS n_segs, "
        "CAST(tot.n_segs - COALESCE(reass.n_kept, 0) AS BIGINT) AS n_dropped "
        "FROM tot LEFT JOIN reass ON tot.id = reass.id"
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership (broadcast bitmap) — cross-corpus dedup /
# decontamination without joining the corpus: the membership side
# compresses to an m-bit bitmap carried as a plain Catalyst literal,
# so the probe is pure whole-stage-codegen bit arithmetic


BLOOM_M = 1 << 16  # bits
BLOOM_K = 3  # hash functions


def bloom_positions(col: Column, m: int = BLOOM_M, k: int = BLOOM_K) -> list[Column]:
    """k bit positions for a key (md5-derived, oracle-replicable)."""
    return [F.pmod(hash64(col, f"bloom{i}"), F.lit(m)).cast("int") for i in range(k)]


def bloom_position_sql(expr: str, i: int, m: int = BLOOM_M) -> str:
    """DuckDB twin of bloom_positions[i]."""
    return f"({hash64_sql(expr, f'bloom{i}')} % {int(m)})"


def bloom_build_words(
    keys: DataFrame, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> list[int]:
    """Build the bitmap as m/64 signed 64-bit words. The only driver
    materialization is the DISTINCT bit-position list (<= m ints —
    bounded by the filter geometry, independent of corpus size; same
    broadcast class as IVF centroids)."""
    pos_cols = bloom_positions(F.col("_k"), m, k)
    pos = (
        keys.select(F.col(key_col).alias("_k"))
        .select(F.explode(F.array(*pos_cols)).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * (m // 64)
    for r in pos:
        p = int(r["p"])
        words[p // 64] |= 1 << (p % 64)
    # two's-complement into signed range (Spark LongType literals)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_member_col(
    col: Column, words: list[int], m: int = BLOOM_M, k: int = BLOOM_K
) -> Column:
    """TRUE iff all k bits are set — 'probably a member'; never a
    false negative. Pure Catalyst: element_at into the literal word
    array + getbit (two's-complement bit indexing, so the signed
    round-trip of bloom_build_words is transparent)."""
    warr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = F.lit(True)
    for p in bloom_positions(col, m, k):
        word = F.element_at(warr, (p / F.lit(64)).cast("int") + 1)
        cond = cond & (F.getbit(word, F.pmod(p, F.lit(64))) == 1)
    return cond

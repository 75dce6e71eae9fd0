"""Text-analysis operators for training-data pipelines: token
counting, quality signals, language-ID heuristic, and winnowing
document fingerprints. All pure Catalyst expressions (split /
transform / aggregate / length arithmetic) — no Python in the hot
path — and all deterministic so SQL oracles replicate them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from gdal_spark.dedup import hash64, hash64_sql

# marker words per language for the n-gram-free langid heuristic;
# order = deterministic tie-break (first wins on equal score)
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of"]),
    ("es", ["la", "el", "de"]),
    ("de", ["der", "die", "und"]),
    ("fr", ["le", "les", "et"]),
    ("zh", ["shi", "de2", "he"]),
]


def token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+")).cast("long")


def occurrences(text: Column, word: str) -> Column:
    """Count of whitespace-delimited occurrences of `word` (padded
    non-overlapping replace trick — identical in any SQL engine)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return ((F.length(padded) - F.length(F.regexp_replace(padded, needle, ""))) / len(needle)).cast("long")


def lang_id(text: Column) -> Column:
    """argmax of marker-word scores, first-listed language wins ties
    (deterministic fold-left: later lang replaces only on strictly
    greater score)."""
    scores = [(lang, sum_scores(text, words)) for lang, words in LANG_MARKERS]
    expr = F.lit(LANG_MARKERS[0][0])
    cur = scores[0][1]
    for lang, sc in scores[1:]:
        expr = F.when(sc > cur, F.lit(lang)).otherwise(expr)
        cur = F.greatest(sc, cur)
    return expr


def sum_scores(text: Column, words: list[str]) -> Column:
    out = occurrences(text, words[0])
    for w in words[1:]:
        out = out + occurrences(text, w)
    return out


def lang_id_sql(text_expr: str) -> str:
    """DuckDB twin of lang_id (fold-left argmax, same tie-break)."""

    def occ(word: str) -> str:
        pad = f"(' ' || {text_expr} || ' ')"
        needle = f" {word} "
        return f"CAST((length({pad}) - length(replace({pad}, '{needle}', ''))) / {len(needle)} AS BIGINT)"

    scores = {lang: "(" + " + ".join(occ(w) for w in words) + ")" for lang, words in LANG_MARKERS}
    langs = list(scores)
    expr = f"'{langs[0]}'"
    cur = scores[langs[0]]
    for lang in langs[1:]:
        expr = f"(CASE WHEN {scores[lang]} > {cur} THEN '{lang}' ELSE {expr} END)"
        cur = f"GREATEST({scores[lang]}, {cur})"
    return expr


def quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality metrics: token count, mean token length x100
    (integer — oracle-exact), stopword count, alnum ratio x1000."""
    t = F.col(text_col)
    toks = token_count(t)
    nospace = F.regexp_replace(t, r"\s", "")
    stop = sum_scores(t, ["the", "a", "of", "and"])
    return df.withColumn("n_tokens", toks).withColumn(
        "mean_token_len_x100", (F.length(nospace) * 100 / toks).cast("long")
    ).withColumn("n_stopwords", stop)


def repetition_signals(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models", Table A1 repetition filters), adapted
    to single-line documents: word-level duplicate fraction,
    most-frequent-word count, and the character coverage of the
    most-covering word 2-gram. The standard pre-training filters drop
    documents above thresholds on exactly these statistics.

    Outputs are integer fixed-point (x1000) so the DuckDB oracle
    (repetition_signals_sql) replays them bit-exactly:
      - n_words
      - dup_word_frac_x1000  = floor((n - n_distinct) * 1000 / n)
      - top_word_count       = occurrences of the most frequent word
      - top2_cover_x1000     = floor(max over distinct 2-grams of
                               (count * len(gram)) * 1000 / len(text))
        (overlapping occurrences counted, as in the Gopher filter's
        n-gram character-fraction approximation)

    Pure Catalyst array expressions — no Python in the plan. The
    per-row cost is O(distinct_words x n) JVM comparisons; rows are
    independent, so the operator scales linearly with no shuffle.
    """
    t = F.col(text_col)
    staged = df.withColumn("_ws", F.split(F.trim(t), r"\s+"))
    ws = F.col("_ws")
    n = F.size(ws)
    nd = F.size(F.array_distinct(ws))
    topw = F.array_max(
        F.transform(F.array_distinct(ws), lambda w: F.size(F.filter(ws, lambda x: x == w)))
    )
    # consecutive word 2-grams via aligned slices (no index lambdas)
    grams = F.zip_with(
        F.slice(ws, F.lit(1), n - 1),
        F.slice(ws, F.lit(2), n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    staged = staged.withColumn("_gs", grams)
    gs = F.col("_gs")
    cover = F.array_max(
        F.transform(
            F.array_distinct(gs),
            lambda g: F.size(F.filter(gs, lambda x: x == g)) * F.length(g),
        )
    )
    return staged.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.floor((n - nd) * 1000 / n).cast("long").alias("dup_word_frac_x1000"),
        topw.cast("long").alias("top_word_count"),
        F.coalesce(F.floor(cover * 1000 / F.length(t)), F.lit(0)).cast("long").alias("top2_cover_x1000"),
    )


def repetition_signals_sql(id_expr: str, text_expr: str, table: str = "documents") -> str:
    """DuckDB twin of repetition_signals (same fixed-point math)."""
    return (
        f"WITH w AS (SELECT {id_expr} AS id, string_split_regex(trim({text_expr}), '\\s+') AS ws, "
        f"length({text_expr}) AS tl FROM {table}), "
        "d AS (SELECT id, ws, tl, len(ws) AS n, len(list_distinct(ws)) AS nd FROM w), "
        "g AS (SELECT id, ws, tl, n, nd, "
        "list_transform(generate_series(1, n - 1), i -> ws[i] || ' ' || ws[i + 1]) AS gs FROM d) "
        "SELECT id AS doc_id, CAST(n AS BIGINT) AS n_words, "
        "CAST(floor((n - nd) * 1000 / n) AS BIGINT) AS dup_word_frac_x1000, "
        "CAST(list_max(list_transform(list_distinct(ws), w2 -> len(list_filter(ws, x -> x = w2)))) AS BIGINT) AS top_word_count, "
        "CAST(COALESCE(floor(list_max(list_transform(list_distinct(gs), g2 -> len(list_filter(gs, x -> x = g2)) * length(g2))) * 1000 / tl), 0) AS BIGINT) AS top2_cover_x1000 "
        "FROM g"
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03): hash all
    character k-grams, take the min hash of every sliding window of
    `window` k-grams, emit the distinct minima. The standard
    plagiarism/near-dup fingerprint; here as pure array expressions.

    Output: (id, fp) exploded — one row per distinct fingerprint.
    """
    t = F.col(text_col)
    n_grams = F.length(t) - (k - 1)
    grams = F.transform(F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))), lambda i: F.substring(t, i, k))
    # materialize each stage as a projected column: Catalyst does NOT
    # common-subexpression-eliminate inside lambdas, so referencing the
    # hash array expression from the sliding-window transform would
    # recompute ALL md5s per window (O(n^2) blowup)
    staged = df.withColumn("_hs", F.transform(grams, lambda g: hash64(g, "win")))
    n_win = F.size(F.col("_hs")) - (window - 1)
    minima = F.when(
        n_win <= 0, F.array(F.array_min("_hs"))
    ).otherwise(
        F.transform(F.sequence(F.lit(1), n_win), lambda j: F.array_min(F.slice(F.col("_hs"), j, window)))
    )
    staged = staged.withColumn("_mins", minima)
    return staged.select(F.col(id_col), F.explode(F.array_distinct("_mins")).alias("fp"))


def winnow_fingerprints_sql(id_expr: str, text_expr: str, k: int = 8, window: int = 4) -> str:
    """DuckDB twin of winnow_fingerprints (same k-gram/window math)."""
    grams = (
        f"list_transform(generate_series(1, GREATEST(length({text_expr}) - {k - 1}, 1)), "
        f"i -> substr({text_expr}, i, {k}))"
    )
    hashes = f"list_transform({grams}, g -> {hash64_sql('g', 'win')})"
    return (
        f"WITH h AS (SELECT {id_expr} AS id, {hashes} AS hs FROM documents), "
        f"m AS (SELECT id, CASE WHEN len(hs) - {window - 1} <= 0 THEN [list_min(hs)] "
        f"ELSE list_transform(generate_series(1, len(hs) - {window - 1}), j -> list_min(hs[j:j+{window - 1}])) END AS mins FROM h) "
        f"SELECT id AS doc_id, unnest(list_distinct(mins)) AS fp FROM m"
    )


# ---------------------------------------------------------------------------
# deterministic global shuffle (training-order randomization)

_SHUF_P = 2147483647  # 2^31 - 1 (Mersenne prime; minstd modulus)
_SHUF_A = 48271  # minstd_rand multiplier


def _minstd_mix(x: Column, seed: int) -> Column:
    """Two rounds of the minstd LCG over the id (+seed), entirely in
    BIGINT arithmetic that cannot overflow ((p-1)*48271 < 2^47) and is
    bit-identical in Spark and DuckDB — a seeded pseudo-random but
    DETERMINISTIC permutation key. Collisions (ids congruent mod p)
    break by id, so the order stays total and reproducible."""
    h = ((x % _SHUF_P + _SHUF_P) % _SHUF_P + seed % _SHUF_P) % _SHUF_P
    h = h * _SHUF_A % _SHUF_P
    h = h * _SHUF_A % _SHUF_P
    return h


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    out_col: str = "shuffle_seq",
    nbuckets: int = 1024,
) -> DataFrame:
    """Seeded deterministic global shuffle: every row gets a dense rank
    0..n-1 under a pseudo-random total order keyed by
    minstd(id, seed) — the training-pipeline primitive for epoch-order
    randomization (same seed => same order on any cluster size;
    different seed => a different permutation).

    Scale shape: the permutation key is pure Catalyst; the global rank
    reuses dense_seq (operators/vector_sort.py) — arithmetic key-range
    buckets + per-bucket row_number + a broadcast offset join, never a
    single-partition window. One shuffle total (the rank exchange),
    exactly what a range-partitioned sort costs. To SORT the data by
    the permutation (e.g. before a sharded write), follow with
    repartitionByRange(out_col) — the ordering key is already
    uniformly distributed, so ranges balance."""
    from gdal_spark.operators.vector_sort import dense_seq

    keyed = df.withColumn("_shuf", _minstd_mix(F.col(id_col).cast("bigint"), seed))
    out = dense_seq(keyed, "_shuf", id_col, out_col=out_col, nbuckets=nbuckets)
    return out.drop("_shuf")


def minstd_mix_sql(id_expr: str, seed: int) -> str:
    """DuckDB/ANSI replay of _minstd_mix for oracles."""
    p, a = _SHUF_P, _SHUF_A
    h0 = f"((({id_expr}) % {p} + {p}) % {p} + {seed % p}) % {p}"
    h1 = f"(({h0}) * {a}) % {p}"
    return f"(({h1}) * {a}) % {p}"


def weighted_interleave(
    sources: list[DataFrame],
    weights: list[float],
    id_col: str = "doc_id",
    seed: int = 0,
    out_col: str = "interleave_seq",
    src_col: str = "source_id",
    nbuckets: int = 1024,
) -> DataFrame:
    """Deterministic weighted interleaving of N corpora into one
    training order: source i's k-th document (under its own seeded
    global_shuffle permutation) sits at virtual position (k+1)/w_i, so
    a weight-0.7 source appears ~7/3 as often as a weight-0.3 source
    at every prefix of the stream — the standard mixture-sampling
    order, made reproducible (same seeds + weights => same sequence on
    any cluster size).

    All sources must share a schema. Scale shape: per-source
    permutation keys are pure Catalyst; ONE dense_seq pass ranks the
    union (range buckets + broadcast offsets, no single-partition
    window). Ties ((k+1)/w exactly equal across sources — guaranteed
    at equal weights) break by (source index, id), so the order stays
    total."""
    if len(sources) != len(weights) or not sources:
        raise ValueError("sources and weights must be same-length and non-empty")
    if any(w <= 0 for w in weights):
        raise ValueError("weights must be positive")
    tagged = []
    for i, (df, w) in enumerate(zip(sources, weights)):
        s = global_shuffle(df, id_col=id_col, seed=seed + i, out_col="_sseq",
                           nbuckets=nbuckets)
        tagged.append(
            s.withColumn(src_col, F.lit(i))
            .withColumn("_ikey", (F.col("_sseq") + F.lit(1)).cast("double") / F.lit(float(w)))
        )
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    from gdal_spark.operators.vector_sort import dense_seq

    u = u.withColumn("_tie", F.struct(F.col(src_col), F.col(id_col)))
    # the outer dense_seq fires several driver actions (min/max agg,
    # bucket-count collect, final job); without a plan cut each one
    # re-executes every per-source shuffle pipeline — same repeated-
    # action pattern strtree_sort checkpoints
    u = u.localCheckpoint(eager=True)
    out = dense_seq(u, "_ikey", "_tie", out_col=out_col, nbuckets=nbuckets)
    return out.drop("_sseq", "_ikey", "_tie")


# ---------------------------------------------------------------------------
# PII scrubbing (the public email/IP/phone regex rule-set every released
# pipeline ships some variant of — e.g. Dolma's and ROOTS' scrubbers).
# Patterns stay in the Java-regex ∩ RE2 dialect (no lookaround, no
# backrefs) so the Spark plan and any DuckDB/Trino oracle apply
# bit-identical semantics.  The dialect intersection has NO shared
# zero-width word boundary — Java's \b is Unicode-aware (a letter like
# 'é' adjacent to a digit suppresses the boundary) while RE2's \b is
# ASCII-only, so 'é1.2.3.4' counts 0 in Spark and 1 in DuckDB if \b is
# used.  The patterns are therefore boundary-free: the documented
# deviation from \b-anchored rule-sets is that a PII-shaped substring
# inside a longer run also matches ('1.2.3.4567' redacts its first
# '1.2.3.456'; over-redaction, never under-redaction).

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+", "|||EMAIL|||"),
    ("ip", r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}", "|||IP_ADDRESS|||"),
    ("phone", r"[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}", "|||PHONE_NUMBER|||"),
]


def _sql_quote(s: str) -> str:
    """SQL string-literal escaping shared by every *_sql generator —
    a pattern or token carrying a quote must not break the oracle."""
    return s.replace("'", "''")


def pii_counts(text: Column) -> dict[str, Column]:
    """{kind: match count} — pure Catalyst regexp_count, zero shuffle."""
    t = F.coalesce(text, F.lit(""))
    return {
        name: F.regexp_count(t, F.lit(pat)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


def pii_redact(text: Column) -> Column:
    """Replace every PII match with its typed token, in PII_PATTERNS
    order (emails first so their digit runs can't half-match the
    phone/IP patterns)."""
    out = F.coalesce(text, F.lit(""))
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts_sql(text_expr: str) -> dict[str, str]:
    e = f"COALESCE({text_expr}, '')"
    return {
        name: f"CAST(len(regexp_extract_all({e}, '{_sql_quote(pat)}')) AS BIGINT)"
        for name, pat, _ in PII_PATTERNS
    }


def pii_redact_sql(text_expr: str) -> str:
    out = f"COALESCE({text_expr}, '')"
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{_sql_quote(pat)}', '{_sql_quote(repl)}', 'g')"
    return out


# ---------------------------------------------------------------------------
# BPE-ish pretokenizer count: the GPT-2 pretokenizer with its two
# lookahead-bearing whitespace alternatives collapsed into one plain
# whitespace run (RE2 — hence DuckDB and any oracle — has no
# lookahead; the collapse only changes how runs of 2+ spaces split,
# documented).  Whitespace is the EXPLICIT class [ \t\n\r\f\x0B], not
# \s: Java's \s includes vertical tab, RE2's does not, so a VT in the
# corpus would split pretokens differently across engines.

_WS = r" \t\n\r\f\x0B"
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^" + _WS + r"\p{L}\p{N}]+|[" + _WS + r"]+"
)


def bpe_token_count(text: Column) -> Column:
    """Pretoken count under BPE_PRETOKEN_PATTERN — the unit quality
    filters and token-budget accounting use, as opposed to the plain
    whitespace token_count above."""
    return F.regexp_count(F.coalesce(text, F.lit("")), F.lit(BPE_PRETOKEN_PATTERN)).cast(
        "long"
    )


def bpe_token_count_sql(text_expr: str) -> str:
    pat = _sql_quote(BPE_PRETOKEN_PATTERN)
    return (
        f"CAST(len(regexp_extract_all(COALESCE({text_expr}, ''), "
        f"'{pat}')) AS BIGINT)"
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    weight_col: str | None = None,
    text_col: str = "text",
    nbuckets: int = 1024,
) -> DataFrame:
    """GPT-style sequence packing: concatenate every document's tokens
    in a deterministic order (ascending id) and cut the stream into
    fixed windows of `seq_len` tokens — the standard pretraining
    batcher (each training sequence is completely full; documents
    spanning a boundary split across consecutive windows). Returns one
    row per (window, document-slice):

      window_id    0-based training-sequence index
      <id_col>     the contributing document
      slice_start  first token of the doc going into this window
      slice_end    one past the last token (doc-relative, so
                   slice_end - slice_start tokens ship)
      win_off      where the slice lands inside the window

    Every window except the last is exactly full by construction:
    SUM(slice_end - slice_start) GROUP BY window_id == seq_len.

    Scale shape: the only data-dependent state is the exclusive prefix
    sum of token counts in id order, computed the dense_seq way
    (operators/vector_sort.py:79) — arithmetic id-range buckets,
    per-bucket token totals cumsum'd on the driver (<= nbuckets rows),
    then a per-bucket running-sum window + broadcast offset join. One
    shuffle total, no single-partition window at any size; the
    window fan-out is a pure-Catalyst explode(sequence()). Window ids
    divide with integer `div`, not float `/` — at 2^53+ total tokens
    double division stops being exact and a document would silently
    land in the wrong training sequence.

    Ids must be UNIQUE and NON-NULL: the exclusive running sum is a
    ROWS-frame window ordered by id (its SQL twin likewise), so
    duplicate ids would make both engines' prefix sums
    tie-order-dependent; NULL-id rows are dropped before packing
    (a NULL id cannot place deterministically in the id order)."""
    from pyspark.sql import Window

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    df = docs
    if weight_col is None:
        df = df.withColumn("_w", token_count(F.col(text_col)))
        weight_col = "_w"
    d = df.select(
        F.col(id_col).cast("long").alias("_pid"),
        F.col(weight_col).cast("long").alias("_wt"),
    ).filter((F.col("_wt") > 0) & F.col("_pid").isNotNull())

    row = d.agg(F.min("_pid").alias("mn"), F.max("_pid").alias("mx")).first()
    if row is None or row.mn is None:
        spark = docs.sparkSession
        return spark.createDataFrame(
            [], f"window_id long, {id_col} long, slice_start long, "
                f"slice_end long, win_off long")
    mn, mx = int(row.mn), int(row.mx)
    span = mx - mn
    if span <= 0:
        bucket = F.lit(0)
    else:
        bucket = F.least(
            F.floor((F.col("_pid") - F.lit(mn)) * nbuckets / F.lit(span)).cast("int"),
            F.lit(nbuckets - 1),
        )
    b = d.withColumn("_bkt", bucket.cast("int"))
    totals = {
        r._bkt: r.t
        for r in b.groupBy("_bkt").agg(F.sum("_wt").alias("t")).collect()
    }
    off, offs = 0, []
    for k in sorted(totals):
        offs.append((k, off))
        off += int(totals[k])
    odf = F.broadcast(
        docs.sparkSession.createDataFrame(offs, "_bkt int, _off long")
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.col("_pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = (
        b.join(odf, "_bkt")
        .withColumn("_start", F.col("_off") + F.coalesce(F.sum("_wt").over(w), F.lit(0)))
        .withColumn("_end", F.col("_start") + F.col("_wt"))
    )
    L = int(seq_len)
    out = (
        staged.withColumn(
            "window_id",
            F.explode(F.sequence(
                F.expr(f"_start div {L}"), F.expr(f"(_end - 1) div {L}")
            )),
        )
        .withColumn("_wlo", F.col("window_id") * L)
        .select(
            "window_id",
            F.col("_pid").alias(id_col),
            (F.greatest("_wlo", "_start") - F.col("_start")).alias("slice_start"),
            (F.least(F.col("_wlo") + L, F.col("_end")) - F.col("_start")).alias("slice_end"),
            (F.greatest("_wlo", "_start") - F.col("_wlo")).alias("win_off"),
        )
    )
    return out


def pack_sequences_sql(seq_len: int, tokens_expr: str | None = None,
                       table: str = "documents", id_expr: str = "doc_id") -> str:
    """DuckDB replay of pack_sequences (same whitespace token count as
    token_stats' oracle; the prefix sum is one SQL window)."""
    w = tokens_expr or r"CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)"
    L = int(seq_len)
    return (
        f"WITH t AS (SELECT {id_expr} AS pid, {w} AS wt FROM {table}), "
        "p AS (SELECT pid, wt, CAST(COALESCE(SUM(wt) OVER (ORDER BY pid "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s "
        "FROM t WHERE wt > 0 AND pid IS NOT NULL), "
        "e AS (SELECT pid, s, CAST(s + wt AS BIGINT) AS e FROM p), "
        f"x AS (SELECT pid, s, e, UNNEST(generate_series(s // {L}, (e-1) // {L}))"
        " AS window_id FROM e) "
        "SELECT window_id, pid AS doc_id, "
        f"GREATEST(window_id * {L}, s) - s AS slice_start, "
        f"LEAST((window_id + 1) * {L}, e) - s AS slice_end, "
        f"GREATEST(window_id * {L}, s) - window_id * {L} AS win_off FROM x"
    )


def unigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50_000,
) -> DataFrame:
    """CCNet-shaped language-model quality filter (Wenzek et al. 2020
    train a 5-gram LM and drop high-perplexity documents; the unigram
    variant is the same two-pass corpus-trained signal): score every
    document by its mean token surprisal under the corpus's own
    unigram distribution.

    Engine-exact arithmetic: -log2 p(w) = log2 N' - log2 c'_w is
    integer-quantized as bitlen(N') - bitlen(c_w + 1) where bitlen is
    the binary-representation length (floor(log2 x) + 1, computed via
    bin() string length — exact in any engine, no float log whose last
    ulp could flip a fixed-point floor across engines). Add-one
    smoothing: out-of-vocabulary tokens score with c_w = 0.

    Output: (id, n_tokens, n_oov, surprisal_bits) — surprisal_bits =
    sum over tokens of the quantized surprisal; filter on
    surprisal_bits / n_tokens.

    Scale shape (100 TB): pass 1 is one map-side-combinable
    groupBy(word) count; the top-`vocab_size` vocabulary is a bounded
    TakeOrdered (count desc, word asc tie) and BROADCASTS — the corpus
    re-joins it map-side after an explode, and the per-doc groupBy
    ships only map-combined per-doc partials, never raw tokens. Two
    shuffles total (vocab count + per-doc fold), both on bounded or
    combinable keys."""
    # split of an empty/whitespace-only doc yields [''] — that phantom
    # zero-length string is NOT a token (bpe._initial_words applies
    # the same length > 0 rule): it must not enter the vocabulary,
    # the corpus total, or any doc's token count. The explode keeps
    # the phantom row (flagged _nz=false) so empty docs still report
    # n_tokens=0 instead of vanishing — no extra join needed.
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    nz_toks = F.filter(toks, lambda x: F.length(x) > 0)
    words = docs.select(F.explode(nz_toks).alias("_w"))
    counts = words.groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
    # N = total tokens, computed straight off the docs (one narrow
    # pass) — summing `counts` instead would re-execute the whole
    # word-count shuffle a second time just for a scalar
    total = docs.agg(F.sum(F.size(nz_toks)).alias("t")).first().t or 0
    if total == 0:
        return docs.select(
            F.col(id_col), F.lit(0).cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("n_oov"),
            F.lit(0).cast("long").alias("surprisal_bits"),
        )
    vocab = counts.orderBy(F.col("_c").desc(), F.col("_w").asc()).limit(vocab_size)
    nbits = len(bin(int(total))) - 2  # bitlen(N)
    per_tok = (
        docs.select(F.col(id_col).alias("_id"), F.explode(toks).alias("_w"))
        .join(F.broadcast(vocab), "_w", "left")
        .select(
            "_id",
            (F.length("_w") > 0).alias("_nz"),
            F.col("_c").isNull().cast("long").alias("_oov"),
            # bitlen(c+1) = length(bin(c+1)); OOV c=0 -> bitlen 1
            (F.lit(nbits) - F.length(F.bin(F.coalesce(F.col("_c"), F.lit(0)) + 1)))
            .cast("long").alias("_s"),
        )
    )
    return per_tok.groupBy("_id").agg(
        F.sum(F.col("_nz").cast("long")).alias("n_tokens"),
        F.sum(F.when(F.col("_nz"), F.col("_oov")).otherwise(F.lit(0))).alias("n_oov"),
        F.sum(F.when(F.col("_nz"), F.col("_s")).otherwise(F.lit(0))).alias("surprisal_bits"),
    ).select(
        F.col("_id").alias(id_col), "n_tokens", "n_oov", "surprisal_bits"
    )


def unigram_surprisal_sql(
    vocab_size: int = 50_000,
    table: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB replay of unigram_surprisal (same bitlen quantization)."""
    return (
        f"WITH w AS (SELECT {id_expr} AS id, "
        f"UNNEST(string_split_regex(trim({text_expr}), '\\s+')) AS tok FROM {table}), "
        "c AS (SELECT tok, COUNT(*) AS n FROM w WHERE length(tok) > 0 GROUP BY tok), "
        "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c), "
        f"v AS (SELECT tok, n FROM c ORDER BY n DESC, tok ASC LIMIT {vocab_size}) "
        "SELECT w.id AS doc_id, "
        "CAST(SUM(CASE WHEN length(w.tok) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tokens, "
        "CAST(SUM(CASE WHEN length(w.tok) > 0 AND v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov, "
        "CAST(SUM(CASE WHEN length(w.tok) > 0 THEN length(bin(CAST((SELECT t FROM tot) AS BIGINT))) "
        "- length(bin(CAST(COALESCE(v.n, 0) + 1 AS BIGINT))) ELSE 0 END) AS BIGINT) AS surprisal_bits "
        "FROM w LEFT JOIN v ON w.tok = v.tok GROUP BY w.id"
    )


def line_quality_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4/FineWeb-style line-level quality signals (Raffel et al. 2020
    §2.2's line rules; FineWeb/Gopher's bullet- and ellipsis-line
    fractions): per-document counts over newline-split lines —

      n_lines        lines after splitting on \\n
      n_end_punct    lines whose trimmed text ends in . ! ? or "
                     (C4 keeps only such lines)
      n_bullet       trimmed lines starting with -, * or • (Gopher
                     drops docs with >90%% bullet lines)
      n_ellipsis     trimmed lines ending in ... (Gopher >30%% rule)
      n_short        lines with fewer than 3 whitespace tokens (C4's
                     short-line rule)
      has_lorem      1 if the lowercased doc contains 'lorem ipsum'
      has_brace      1 if the doc contains '{' (C4's code filter)

    Counts stay integers (callers derive fractions) so the DuckDB twin
    is hash-exact. Pure Catalyst array expressions — no Python, no
    shuffle; rows are independent so the operator scales linearly."""
    t = F.col(text_col)
    staged = docs.withColumn("_ls", F.split(t, "\n"))
    ls = F.col("_ls")
    trimmed = F.transform(ls, lambda x: F.trim(x))
    endp = F.filter(
        trimmed,
        lambda x: x.endswith(".") | x.endswith("!") | x.endswith("?")
        | x.endswith('"'),
    )
    bullets = F.filter(
        trimmed,
        lambda x: x.startswith("-") | x.startswith("*") | x.startswith("•"),
    )
    ellipsis = F.filter(trimmed, lambda x: x.endswith("..."))
    short = F.filter(trimmed, lambda x: F.size(F.split(x, r"\s+")) < 3)
    return staged.select(
        F.col(id_col),
        F.size(ls).cast("long").alias("n_lines"),
        F.size(endp).cast("long").alias("n_end_punct"),
        F.size(bullets).cast("long").alias("n_bullet"),
        F.size(ellipsis).cast("long").alias("n_ellipsis"),
        F.size(short).cast("long").alias("n_short"),
        F.lower(t).contains("lorem ipsum").cast("long").alias("has_lorem"),
        t.contains("{").cast("long").alias("has_brace"),
    )


def line_quality_signals_sql(
    table: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB replay of line_quality_signals."""
    return (
        f"WITH l AS (SELECT {id_expr} AS id, {text_expr} AS t, "
        f"list_transform(string_split({text_expr}, chr(10)), x -> trim(x)) AS ls "
        f"FROM {table}) "
        "SELECT id AS doc_id, CAST(len(ls) AS BIGINT) AS n_lines, "
        "CAST(len(list_filter(ls, x -> x LIKE '%.' OR x LIKE '%!' "
        "OR x LIKE '%?' OR x LIKE '%\"')) AS BIGINT) AS n_end_punct, "
        "CAST(len(list_filter(ls, x -> x LIKE '-%' OR x LIKE '*%' "
        "OR x LIKE chr(8226) || '%')) AS BIGINT) AS n_bullet, "
        "CAST(len(list_filter(ls, x -> x LIKE '%...')) AS BIGINT) AS n_ellipsis, "
        "CAST(len(list_filter(ls, x -> len(string_split_regex(x, '\\s+')) < 3)) "
        "AS BIGINT) AS n_short, "
        "CAST(CASE WHEN lower(t) LIKE '%lorem ipsum%' THEN 1 ELSE 0 END AS BIGINT) AS has_lorem, "
        "CAST(CASE WHEN t LIKE '%{%' THEN 1 ELSE 0 END AS BIGINT) AS has_brace "
        "FROM l"
    )


def chunk_documents(
    docs: DataFrame,
    chunk_size: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking for embedding/retrieval
    pipelines: cut each document's characters into windows of
    `chunk_size` advancing by `chunk_size - overlap`, so consecutive
    chunks share `overlap` characters (the standard RAG chunker
    shape). Chunk k covers [k*step, k*step + chunk_size); windows
    start only while they contribute strictly-new content (start <
    len - overlap for non-first chunks), so the final chunk may be
    shorter but is never fully contained in its predecessor — with
    overlap > 0 a naive "start < len" rule would emit a trailing
    chunk of <= overlap chars that duplicates retrieval content.
    Empty documents produce no chunks.

    Output: (id, chunk_id, chunk_start, chunk_len, chunk_text).

    Pure Catalyst — explode(sequence()) + substring, no Python and no
    shuffle; chunk counts derive from length arithmetic with integer
    div (exact at any corpus size)."""
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if not 0 <= overlap < chunk_size:
        raise ValueError("overlap must be in [0, chunk_size)")
    step = chunk_size - overlap
    t = F.col(text_col)
    n = F.length(t)
    staged = docs.filter(n > 0).withColumn(
        "chunk_id",
        F.explode(F.sequence(
            F.lit(0),
            F.expr(f"greatest(length({text_col}) - 1 - {overlap}, 0) div {step}"),
        )),
    )
    start = F.col("chunk_id") * step
    return staged.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("chunk_start"),
        F.least(F.lit(chunk_size), F.length(t) - start).cast("long").alias("chunk_len"),
        F.substring(t, start + 1, chunk_size).alias("chunk_text"),
    )


def chunk_documents_sql(
    chunk_size: int,
    overlap: int = 0,
    table: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB replay of chunk_documents."""
    step = chunk_size - overlap
    return (
        f"WITH d AS (SELECT {id_expr} AS id, {text_expr} AS t FROM {table} "
        f"WHERE length({text_expr}) > 0), "
        "x AS (SELECT id, t, UNNEST(generate_series(0, "
        f"GREATEST(length(t) - 1 - {overlap}, 0) // {step})) AS chunk_id FROM d) "
        "SELECT id AS doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, "
        f"CAST(chunk_id * {step} AS BIGINT) AS chunk_start, "
        f"CAST(LEAST({chunk_size}, length(t) - chunk_id * {step}) AS BIGINT) AS chunk_len, "
        f"substr(t, CAST(chunk_id * {step} + 1 AS BIGINT), {chunk_size}) AS chunk_text "
        "FROM x"
    )


def dsir_importance_weights(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by the importance log-ratio of a TARGET distribution over a RAW
    one, both represented as hashed bag-of-words models — the paper's
    hashed n-gram generative importance weights.

    Engine-exact arithmetic: the feature hash is the first 8 hex
    digits of md5(token) mod n_buckets (md5 is identical in every
    engine — no Murmur/xxhash whose seeds differ), and the per-bucket
    log-ratio log p_target(f) - log p_raw(f) is integer-quantized as
    bitlen(target_count + 1) - bitlen(raw_count + 1) (the same
    bitlen-as-log2 rule as unigram_surprisal; both models share the
    denominator up to a corpus-constant shift that only translates
    every weight, so it is dropped). A document's weight is the sum of
    its token occurrences' bucket scores. Deterministic resampling =
    rank by (weight desc, id asc) and keep the head — the paper's
    Gumbel noise is a sampling detail orthogonal to the scoring.

    Returns (id, n_tokens, weight) for every document with at least
    one whitespace token.

    Scale shape (100 TB): pass 1 is one map-side-combinable
    groupBy(bucket) over token occurrences — at most n_buckets rows
    out, which BROADCAST back; pass 2 re-joins the exploded corpus
    map-side and folds per doc (map-combined partials only). Two
    bounded shuffles, no all-pairs anything — the same two-pass
    broadcast-model shape as unigram_surprisal."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: F.length(x) > 0
    )
    exploded = docs.select(
        F.col(id_col).alias("_id"),
        target.cast("boolean").alias("_tgt"),
        F.explode(toks).alias("_w"),
    ).withColumn(
        "_b",
        F.pmod(
            F.conv(F.substring(F.md5(F.encode(F.col("_w"), "UTF-8")), 1, 8), 16, 10)
            .cast("long"),
            F.lit(n_buckets),
        ),
    )
    counts = exploded.groupBy("_b").agg(
        F.sum(F.col("_tgt").cast("long")).alias("_tc"),
        F.count(F.lit(1)).alias("_rc"),
    )
    scores = counts.select(
        "_b",
        (
            F.length(F.bin(F.col("_tc") + 1)) - F.length(F.bin(F.col("_rc") + 1))
        ).cast("long").alias("_sc"),
    )
    return (
        exploded.join(F.broadcast(scores), "_b")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_sc").alias("weight"),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", "weight")
    )


def dsir_importance_weights_sql(
    target_pred: str = "lang = 'en'",
    n_buckets: int = 8192,
    table: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB replay of dsir_importance_weights (same md5-prefix hash,
    same bitlen quantization)."""
    return (
        f"WITH w AS (SELECT {id_expr} AS id, ({target_pred}) AS tgt, "
        f"UNNEST(string_split_regex(trim({text_expr}), '\\s+')) AS tok FROM {table}), "
        "t AS (SELECT id, tgt, CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) "
        f"% {n_buckets} AS b FROM w WHERE length(tok) > 0), "
        "c AS (SELECT b, SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tc, COUNT(*) AS rc "
        "FROM t GROUP BY b), "
        "s AS (SELECT b, CAST(length(bin(CAST(tc + 1 AS BIGINT))) "
        "- length(bin(CAST(rc + 1 AS BIGINT))) AS BIGINT) AS sc FROM c) "
        "SELECT t.id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
        "CAST(SUM(s.sc) AS BIGINT) AS weight "
        "FROM t JOIN s USING (b) GROUP BY t.id"
    )

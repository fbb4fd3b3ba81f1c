"""Text analysis operators over the `documents` table: tokenization,
language-ID heuristic, quality scoring, token counting, fingerprinting.

Everything stays inside whole-stage codegen (built-in higher-order
functions on arrays — no Python UDFs), so at 100 TB these are pure
map-side narrow transforms: no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: stopword list used by the quality heuristic (kept tiny + explicit so
#: the DuckDB oracle can repeat it verbatim)
STOPWORDS = ("the", "a", "of")

FP_MOD = 2_147_483_647  # 2^31-1, polynomial fingerprint modulus


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokens with empties dropped — the shared tokenizer for
    every text operator (mirrors list_filter(string_split(...)) in the
    DuckDB oracles)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), " "), lambda x: x != F.lit(""))


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("toks", tokens(text_col))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic. A real deployment swaps the rule
    for an n-gram profile model; the *shape* (narrow map, no shuffle) is
    identical. Deterministic so it is oracle-checkable."""
    t = F.col(text_col)
    pred = (
        F.when(F.length(F.trim(t)) == 0, F.lit("unknown"))
        .when(t.like("% the %") | t.like("the %") | t.like("% the"), F.lit("en"))
        .when(t.like("% data %") | t.like("data %"), F.lit("data-ish"))
        .otherwise(F.lit("other"))
    )
    return df.select(F.col("doc_id"), pred.alias("pred_lang"))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / stopword-ratio / token-length quality features + a binary
    keep flag — the standard pre-training corpus filter shape."""
    toks = tokens(text_col)
    n_tokens = F.size(toks).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_cnt = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("long")
    char_len = F.length(F.col(text_col)).cast("long")
    tok_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    stop_ratio = F.when(n_tokens > 0, stop_cnt.cast("double") / n_tokens.cast("double")).otherwise(
        F.lit(0.0)
    )
    avg_tok_len = F.when(n_tokens > 0, tok_chars.cast("double") / n_tokens.cast("double")).otherwise(
        F.lit(0.0)
    )
    keep = F.when((n_tokens >= 20) & (n_tokens <= 1000) & (stop_ratio < 0.5), F.lit(1)).otherwise(
        F.lit(0)
    ).cast("long")
    return df.select(
        F.col("doc_id"),
        n_tokens.alias("n_tokens"),
        char_len.alias("char_len"),
        stop_cnt.alias("stop_cnt"),
        stop_ratio.alias("stop_ratio"),
        avg_tok_len.alias("avg_tok_len"),
        keep.alias("keep"),
    )


def token_counts(
    df: DataFrame, text_col: str = "text", keep: list[str] | None = None
) -> DataFrame:
    """Whitespace token count + a BPE-ish regex token count (letter runs,
    digit runs, single other chars) — the cheap proxy for tokenizer cost
    used when sizing training corpora. `keep` carries extra columns
    through (e.g. n_chars for histogramming)."""
    t = F.col(text_col)
    ws = F.size(tokens(text_col)).cast("long")
    bpe = F.regexp_count(t, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")
    extra = [F.col(c) for c in (keep or [])]
    return df.select(
        F.col("doc_id"), ws.alias("ws_tokens"), bpe.alias("bpe_tokens"), *extra
    )


def _ngrams(toks: Column, n: int) -> Column:
    """Adjacent-token n-grams as an array column, built by CHAINED
    zip_with over shifted slices instead of transform + n indexed
    get()s: higher-order functions are interpreted (never whole-stage
    codegen'd), so per-element cost dominates — n-1 linear zips with
    one concat each measure ~3.5x faster than one transform doing n
    random accesses per element (round-13 profile: 4.0 s -> 1.2 s for
    the distinct-bigram pass at sf0.1; output verified identical
    corpus-wide FOR THE tokens() CONTRACT — see precondition below).

    PRECONDITION (ADVICE r13): elements must be non-NULL and non-empty,
    which every in-repo caller guarantees via tokens() (filters empty
    strings; split never yields NULL elements). A raw array column
    violating this diverges from the old transform+get form: n=1 passes
    NULL through where get-based concat_ws emitted "", and for n>=3 a
    NULL token is promoted to "" mid-chain, injecting an extra
    separator space (' c' vs 'c'). Normalize NULLs/empties before
    calling with arrays from any other source.

    zip_with null-pads the shorter side and concat_ws
    skips NULLs, so positions past size-j hold short grams — the final
    slice to the first size-n+1 entries drops exactly those. Guarded
    for <n tokens (the old sequence(0, size-n) would descend and emit
    bogus indices)."""
    size = F.size(toks)
    out = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(size - j, F.lit(0)))
        out = F.zip_with(out, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(
        size >= n,
        F.slice(out, 1, F.greatest(size - n + 1, F.lit(0))),
    ).otherwise(F.array().cast("array<string>"))


def _bigrams(toks: Column) -> Column:
    return _ngrams(toks, 2)


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition features (the Gopher-rules shape:
    duplicate-token and duplicate-n-gram fractions) + a keep flag.

    Everything is array math on the already-split token list — a narrow
    map with zero shuffle, so at 100 TB this runs at scan speed alongside
    quality_score in the same stage. The thresholds are corpus-tuned
    constants (real pipelines sweep them per-source)."""
    toks = tokens(text_col)
    n = F.size(toks).cast("long")
    uniq = F.size(F.array_distinct(toks)).cast("long")
    grams = _bigrams(toks)
    n2 = F.size(grams).cast("long")
    uniq2 = F.size(F.array_distinct(grams)).cast("long")
    dup_tok = F.when(
        n > 0, F.lit(1.0) - uniq.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))
    dup_2g = F.when(
        n2 > 0, F.lit(1.0) - uniq2.cast("double") / n2.cast("double")
    ).otherwise(F.lit(0.0))
    keep = ((dup_tok <= 0.6) & (dup_2g <= 0.05)).cast("long")
    return df.select(
        F.col("doc_id"),
        n.alias("n_tokens"),
        uniq.alias("uniq_tokens"),
        n2.alias("n_2grams"),
        uniq2.alias("uniq_2grams"),
        dup_tok.alias("dup_token_ratio"),
        dup_2g.alias("dup_2gram_ratio"),
        keep.alias("keep"),
    )


def boilerplate_ngrams(
    df: DataFrame,
    text_col: str = "text",
    min_docs: int = 2,
    top_k: int = 20,
) -> DataFrame:
    """Cross-document boilerplate detection: 3-gram shingles ranked by
    document frequency. The pipeline use is stripping headers/footers/
    license blocks that repeat across a crawl.

    Scale shape: per-doc *distinct* shingles (array_distinct before the
    explode, so a shingle counts once per doc and the explode volume is
    bounded by unique-shingles-per-doc), then one hash-partitioned
    count with map-side partial aggregation, then top-k via
    orderBy().limit() = TakeOrderedAndProject — no global-window
    single-partition sort."""
    tri = _ngrams(tokens(text_col), 3)
    exploded = df.select(F.explode(F.array_distinct(tri)).alias("gram"))
    freq = exploded.groupBy("gram").agg(F.count("*").cast("long").alias("doc_freq"))
    return (
        freq.where(F.col("doc_freq") >= min_docs)
        .orderBy(F.desc("doc_freq"), "gram")
        .limit(top_k)
    )


def boilerplate_score(
    df: DataFrame,
    k: int = 3,
    min_df: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-DOCUMENT boilerplate fraction (X210) — the decision signal
    boilerplate_ngrams' corpus-level ranking feeds: for every doc, the
    fraction of its distinct k-grams whose document frequency exceeds
    min_df (headers/footers/license blocks/navigation chrome repeat
    across a crawl; novel prose does not). A doc near 1.0 is template
    chrome and a drop candidate; the C4/RefinedWeb-style boilerplate
    filter keyed by a number instead of a blacklist.

    Scale shape: per-doc DISTINCT grams (explode bounded by unique-
    grams-per-doc), ONE hash-partitioned df census with map-side
    partial agg whose heavy-hitter-bounded hot set (<= total postings
    / min_df rows) is eagerly localCheckpoint'ed — the census subtree
    would otherwise ride inside the main branch and the corpus-sized
    gram explode would execute TWICE more than needed (the q20
    signature-reuse lesson: lambda-bearing subtrees defeat exchange
    reuse; measured 10.2 -> 2.1 s warm at sf0.1 with the pin + the
    parallelism guard below). The main branch is then
    ONE gram pass: left join against the tiny hot set, ONE per-doc
    groupBy counting both totals, LEFT join to the corpus so short
    docs (< k tokens) pass through at zero. Eager by contract, like
    jaccard_pairs' max_df census; the gram pin rides features._pin's
    FIFO-capped registry (release_pinned() drops it between batch
    runs), never a raw session-lifetime persist. Gram identity is
    md5_token_hash for oracle
    portability (the q205/q209 convention). Output: (id, n_grams,
    n_hot, boilerplate_frac) for EVERY input document.

    The explode+hash work runs BEFORE the first shuffle, so it
    inherits the SCAN's partitioning — a small-file corpus (one scan
    split) would hash every gram on one core while 31 idle (measured:
    6.4 s for 260k md5+conv on one task at sf0.1). The guard below
    round-robins the corpus up to the session's parallelism only when
    the scan is pathologically under-split; at 100 TB inputs carry
    thousands of splits and the branch never fires, so no corpus
    shuffle is added on the scale path."""
    from .dedup import md5_token_hash

    target = df.sparkSession.sparkContext.defaultParallelism
    nparts = df.rdd.getNumPartitions()
    if nparts < max(2, target // 4) and nparts < target:
        df = df.repartition(target)
    grams = (
        df.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(_ngrams(tokens(text_col), k))
            ).alias("_g"),
        )
        .select(id_col, md5_token_hash(F.col("_g")).alias("_h"))
    )
    # the gram table is read exactly twice (census, main branch) and
    # its subtree carries lambdas that defeat exchange reuse — pin it
    # so the tokenize+explode+md5 pass runs ONCE (the q20 signature
    # lesson; MEMORY_AND_DISK spills rather than recomputes). features.
    # _pin, not a raw persist: persist registers in the CacheManager,
    # which the ContextCleaner never reclaims, so repeated calls in a
    # long session would leak one corpus-sized cache per call — the
    # FIFO-capped pin registry exists for exactly this (code-review
    # r12). The hot build's eager checkpoint materializes it.
    from .features import _pin

    grams = _pin(grams)
    hot = (
        grams.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") > min_df)
        .select("_h", F.lit(1).alias("_hot"))
        .localCheckpoint(eager=True)
    )
    per = (
        grams.join(hot, "_h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count("_hot").cast("long").alias("n_hot"),
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_hot", F.lit(0)).cast("long").alias("n_hot"),
            (
                F.coalesce("n_hot", F.lit(0))
                / F.greatest(F.coalesce("n_grams", F.lit(0)), F.lit(1))
            )
            .cast("double")
            .alias("boilerplate_frac"),
        )
    )


def vocab_topk(
    df: DataFrame,
    k: int = 10,
    lang_col: str = "lang",
    text_col: str = "text",
    n_salts: int = 32,
) -> DataFrame:
    """Per-language top-k vocabulary: (lang, tok, freq, rnk) for the k
    most frequent tokens of each language, ties broken by token asc —
    the corpus-stats primitive behind stopword lists, tokenizer vocab
    sanity checks, and language-drift monitoring.

    Scale shape: explode -> one hash-partitioned (lang, tok) count with
    map-side combine, then top-k in TWO window phases: first within
    (lang, hash(tok) % n_salts) — n_salts parallel partitions per
    language — then a final rank over the surviving n_salts*k rows per
    language. A single window partitioned by lang alone would sort every
    language's entire vocabulary in ONE task (a few hot languages own
    most of a web corpus); the salted pre-phase bounds the final sort's
    input to n_salts*k rows regardless of vocabulary size."""
    w_doc = Window.partitionBy(lang_col, "_salt").orderBy(
        F.desc("freq"), F.col("tok")
    )
    w_lang = Window.partitionBy(lang_col).orderBy(F.desc("freq"), F.col("tok"))
    freq = (
        df.select(F.col(lang_col), F.explode(tokens(text_col)).alias("tok"))
        .groupBy(lang_col, "tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pre = (
        freq.withColumn("_salt", F.pmod(F.xxhash64("tok"), F.lit(n_salts)))
        .withColumn("_r", F.row_number().over(w_doc))
        .where(F.col("_r") <= k)
    )
    return (
        pre.withColumn("rnk", F.row_number().over(w_lang).cast("long"))
        .where(F.col("rnk") <= k)
        .select(lang_col, "tok", "freq", "rnk")
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k salient terms by tf x (N/df) weighting —
    keyword extraction / topic-drift monitoring over a training corpus.
    Output: (doc_id, tok, tf, weight, rnk), rnk 1..k per doc, ties
    broken by token asc.

    The inverse-document-frequency factor is the PLAIN RATIO N/df, not
    ln(N/df): tf*N and df are exact integers, so the weight is a single
    IEEE division that any engine reproduces bit-for-bit (ln() is
    correctly-rounded in one libm and 1-ulp in another, which would
    make the gate's value hash flaky). Ranking is unaffected: x -> ln x
    is monotone.

    Scale shape: explode -> one hash-partitioned (doc, tok) count with
    map-side combine; doc frequency is a second partial agg over the
    (doc, tok) pairs (already distinct by construction); N is a one-row
    aggregate cross-joined back (broadcast); the top-k window partitions
    by doc_id — per-doc vocabulary is bounded by document length, so no
    task ever sorts more than one document's terms (unlike per-language
    windows, which need vocab_topk's salted two-phase)."""
    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq")
    )
    n_docs = tf.select(id_col).distinct().agg(
        F.count(F.lit(1)).alias("_n_docs")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("weight"), F.col("tok"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "tok",
            "tf",
            (
                (F.col("tf") * F.col("_n_docs")).cast("double")
                / F.col("doc_freq").cast("double")
            ).alias("weight"),
        )
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select(id_col, "tok", "tf", "weight", "rnk")
    )


#: RE2-compatible patterns (no lookaround, no backreferences) so Spark's
#: Java regex and an external engine's RE2 replay the rewrite identically
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
LONGNUM_RE = "[0-9]{9,}"


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scrub emails and long digit runs (phone/account numbers) from a
    text column — the standard pre-training PII pass. Output:
    (doc_id, clean_text, n_emails, n_longnums).

    Long-number counting runs on the email-redacted text so digits
    inside an address are never double-counted. Pure codegen narrow map
    (regexp_replace/regexp_count), zero shuffle — at 100 TB this rides
    the same scan as quality_score. The test fixtures contain no PII
    (counts are 0 and text passes through — the gate still proves the
    rewrite is bit-stable cross-engine); pytest drives synthetic
    positives."""
    t = F.col(text_col)
    no_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    return df.select(
        F.col(id_col),
        F.regexp_replace(no_email, LONGNUM_RE, "<NUM>").alias("clean_text"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(no_email, F.lit(LONGNUM_RE)).cast("long").alias("n_longnums"),
    )


def contamination_flags(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing >=
    `min_overlap` distinct n-gram shingles with a benchmark/eval set —
    the standard pre-training leakage check.

    Scale shape: the benchmark side is small by construction (eval sets
    are KBs-MBs against a 100 TB corpus), so its distinct shingle set is
    BROADCAST and the overlap count is a broadcast hash join on the
    exploded corpus shingles — no shuffle of the corpus at all — followed
    by a partial-agg count per doc_id and a plain shuffle join back onto
    the (narrow) doc spine. The overlap aggregate is deliberately NOT
    broadcast: it has one row per contaminated document, which is
    data-dependent (common 3-grams in the eval set can flag a large
    fraction of the corpus) and could blow the broadcast limit."""
    tri = _ngrams(tokens(text_col), n)
    doc_grams = df.select(
        F.col("doc_id"), F.explode(F.array_distinct(tri)).alias("gram")
    )
    bench_tri = _ngrams(tokens(text_col), n)
    bench_grams = (
        benchmark.select(F.explode(F.array_distinct(bench_tri)).alias("gram"))
        .distinct()
    )
    overlap = (
        doc_grams.join(F.broadcast(bench_grams), "gram", "inner")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    return (
        df.select("doc_id")
        .join(overlap, "doc_id", "left")
        .select(
            F.col("doc_id"),
            F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")).alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_overlap)
            .cast("long")
            .alias("contaminated"),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive polynomial rolling hash over tokens (mod 2^31-1):
    doc-level fingerprint for fast container-level dedup. Per-token code
    = 37*ascii(first char) + len(token), folded left with acc*31."""
    toks = tokens(text_col)
    codes = F.transform(
        toks, lambda x: (F.ascii(x) * F.lit(37) + F.length(x)).cast("long")
    )
    fp = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(FP_MOD),
    )
    return df.select(F.col("doc_id"), fp.alias("fp"))


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """Corpus collocation mining: top_k adjacent-token bigrams by
    pointwise mutual information — the classic phrase-detection pass
    (word2vec's phrase step, n-gram LM pruning). PMI stays the rational
    p(xy)/(p(x)p(y)) = (c_xy * Nu * Nu) / (Nb * c_x * c_y): exact
    bigint products divided once into a double, engine-portable (ln is
    monotone, so ranking is unchanged). Output: (w1, w2, c_xy, pmi,
    rnk), highest PMI first, (w1, w2)-ordered on ties.

    Shape: one explode+groupBy each for unigram and bigram counts (both
    map-side partial aggs), two vocab-sized hash joins attaching word
    counts to surviving bigrams (min_count prunes the long tail BEFORE
    the joins), a one-row totals broadcast, and TakeOrderedAndProject
    for the top-k — no global sort, nothing quadratic."""
    t = df.select(tokens(text_col).alias("_t"))
    uni = (
        t.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        t.select(F.explode(_bigrams(F.col("_t"))).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    tot = uni.agg(F.sum("c").cast("long").alias("_nu")).crossJoin(
        bi.agg(F.sum("c_xy").cast("long").alias("_nb"))
    )
    split = F.split("bg", " ")  # tokens are space-split, so never contain one
    cand = bi.where(F.col("c_xy") >= min_count).select(
        F.get(split, 0).alias("w1"),
        F.get(split, 1).alias("w2"),
        F.col("c_xy"),
    )
    cx = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    cy = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    scored = (
        cand.join(cx, "w1")
        .join(cy, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            (
                (
                    F.col("c_xy").cast("double")
                    * F.col("_nu").cast("double")
                    * F.col("_nu").cast("double")
                )
                / (
                    F.col("_nb").cast("double")
                    * F.col("c_x").cast("double")
                    * F.col("c_y").cast("double")
                )
            ).alias("pmi"),
        )
    )
    order = [F.desc("pmi"), F.col("w1"), F.col("w2")]
    top = scored.orderBy(*order).limit(top_k)
    # non-removable constant partition key over the <=k survivors — a
    # bare literal (or hash*0) is optimized away and WindowExec then
    # warns about a global window (see similarity._ranked_topk)
    w = Window.partitionBy(F.pmod(F.xxhash64(F.col("w1")), F.lit(1))).orderBy(*order)
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def rarity_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-frequency document rarity: for each doc, the total and
    mean corpus-wide frequency of its tokens — a cheap unigram-LM
    stand-in (low mean frequency = rare/unusual doc; the tail end is
    OCR garbage and gibberish, the top end is boilerplate). The
    curriculum/filtering signal between raw text and a real LM scorer.
    Output: (doc_id, n_tokens, sum_freq, mean_freq); docs with zero
    tokens are excluded (no tokens -> no frequencies), matching the
    oracle.

    Scale shape: one explode + partial-agg count builds the vocabulary
    (one row per distinct token — vastly smaller than the token
    stream); the tokens join the vocab back WITHOUT a broadcast hint
    (vocab size is data-dependent; AQE promotes when it fits) — the
    join is never skew-bound because the vocab side holds exactly one
    row per token however hot the token is; then one groupBy(doc)
    folds integer sums. mean_freq is one division of exact longs, so
    it replays bit-identically in any engine (the q76 discipline)."""
    toks = (
        df.select(F.col("doc_id"), F.explode(tokens(text_col)).alias("tok"))
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    return (
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("freq").cast("long").alias("sum_freq"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_freq",
            (F.col("sum_freq").cast("double") / F.col("n_tokens").cast("double")).alias(
                "mean_freq"
            ),
        )
    )


def char_ngram_profile(
    df: DataFrame,
    n: int = 3,
    k: int = 20,
    lang_col: str = "lang",
    text_col: str = "text",
    n_salts: int = 32,
) -> DataFrame:
    """Per-language character-n-gram profile: (lang, gram, freq, rnk)
    for the k most frequent character n-grams of each language — the
    TRAINING side of n-gram language-ID (language_id applies a model;
    this builds one from labeled data). Ties break by gram asc.

    Scale shape mirrors vocab_topk exactly: one narrow map slices each
    doc into character n-grams with sequence+transform (no Python, no
    per-char explode — one array per doc), explode feeds a single
    hash-partitioned (lang, gram) count with map-side combine, and
    top-k runs in TWO window phases (salted pre-rank bounds the final
    per-language sort to n_salts*k rows however large the gram
    inventory gets)."""
    t = F.col(text_col)
    # substr with a dynamic start position needs the SQL lambda form
    # (the Python F.substring takes literal pos only)
    grams = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 0)),"
        f" i -> substr({text_col}, i, {n}))"
    )
    freq = (
        df.where(F.length(t) >= n)
        .select(F.col(lang_col), F.explode(grams).alias("gram"))
        .groupBy(lang_col, "gram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w_salt = Window.partitionBy(lang_col, "_salt").orderBy(
        F.desc("freq"), F.col("gram")
    )
    w_lang = Window.partitionBy(lang_col).orderBy(F.desc("freq"), F.col("gram"))
    pre = (
        freq.withColumn("_salt", F.pmod(F.xxhash64("gram"), F.lit(n_salts)))
        .withColumn("_r", F.row_number().over(w_salt))
        .where(F.col("_r") <= k)
    )
    return (
        pre.withColumn("rnk", F.row_number().over(w_lang).cast("long"))
        .where(F.col("rnk") <= k)
        .select(lang_col, "gram", F.col("freq").cast("long").alias("freq"), "rnk")
    )


def corpus_filter_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document filter VERDICT composing the pipeline's narrow
    quality gates — language (en), quality_score's keep rule, and
    repetition_stats' keep rule — into one row per doc with the
    individual flags, the combined keep, and the FIRST failing gate as
    a reason string (null when kept). The operational view a corpus
    curator reads before committing a filter config: which gate is
    responsible for how much loss.

    All three gates are narrow array/string math over the same token
    split, re-derived inline so the report is ONE codegen map over the
    scan — zero shuffles, zero joins, runs at scan speed at any corpus
    size (composing the three operators' DataFrames would cost two
    doc_id shuffles for identical output)."""
    t = F.col(text_col)
    toks = tokens(text_col)
    n = F.size(toks).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_cnt = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    stop_ratio = F.when(
        n > 0, stop_cnt.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))
    is_en = (
        t.like("% the %") | t.like("the %") | t.like("% the")
    ).cast("long")
    q_keep = (
        (n >= 20) & (n <= 1000) & (stop_ratio < 0.5)
    ).cast("long")
    uniq = F.size(F.array_distinct(toks)).cast("long")
    grams = _bigrams(toks)
    n2 = F.size(grams).cast("long")
    uniq2 = F.size(F.array_distinct(grams)).cast("long")
    dup_tok = F.when(
        n > 0, F.lit(1.0) - uniq.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))
    dup_2g = F.when(
        n2 > 0, F.lit(1.0) - uniq2.cast("double") / n2.cast("double")
    ).otherwise(F.lit(0.0))
    rep_keep = ((dup_tok <= 0.6) & (dup_2g <= 0.05)).cast("long")
    keep = ((is_en == 1) & (q_keep == 1) & (rep_keep == 1)).cast("long")
    reason = (
        F.when(is_en == 0, F.lit("lang"))
        .when(q_keep == 0, F.lit("quality"))
        .when(rep_keep == 0, F.lit("repetition"))
        .otherwise(F.lit(None).cast("string"))
    )
    return df.select(
        F.col("doc_id"),
        is_en.alias("is_en"),
        q_keep.alias("q_keep"),
        rep_keep.alias("rep_keep"),
        keep.alias("keep"),
        reason.alias("reason"),
    )


def source_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-corpus contamination report: for every pair of groups
    (sources, splits, snapshots), the Jaccard and containment overlap
    of their DISTINCT 3-gram shingle sets — the corpus-level view that
    tells you "wiki and web share 40% of their shingles" before you
    pick dedup thresholds or worry about eval leakage (the doc-level
    complement of contamination_flags).

    Scale shape: one explode to distinct (group, shingle) — the partial
    agg collapses within-group repeats map-side — then a self-join ON
    SHINGLE whose per-key fan-out is bounded by n_groups^2 (groups are
    few: sources/splits, not documents — this is NOT a doc-pair join),
    then a pair-count aggregate over n_groups^2 rows. The divisions
    happen once per group pair on exact bigint counts; double division
    of exact integers is correctly rounded identically in every IEEE
    engine. Output: (grp_a, grp_b, n_a, n_b, inter, jaccard,
    containment) with grp_a < grp_b."""
    from .dedup import SHINGLE_N, _shingle_expr

    gs = (
        df.select(
            F.col(group_col).alias("grp"), tokens(text_col).alias("toks")
        )
        .where(F.size("toks") >= SHINGLE_N)
        .select("grp", F.explode(_shingle_expr()).alias("sh"))
        .distinct()
    )
    per = gs.groupBy("grp").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = gs.alias("a"), gs.alias("b")
    inter = (
        a.join(b, "sh")
        .where(F.col("a.grp") < F.col("b.grp"))
        .groupBy(F.col("a.grp").alias("grp_a"), F.col("b.grp").alias("grp_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    pa = per.select(F.col("grp").alias("grp_a"), F.col("n_sh").alias("n_a"))
    pb = per.select(F.col("grp").alias("grp_b"), F.col("n_sh").alias("n_b"))
    union_sz = F.col("n_a") + F.col("n_b") - F.col("inter")
    return (
        inter.join(pa, "grp_a")
        .join(pb, "grp_b")
        .select(
            "grp_a",
            "grp_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("inter").cast("long").alias("inter"),
            (F.col("inter").cast("double") / union_sz.cast("double")).alias(
                "jaccard"
            ),
            (
                F.col("inter").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("containment"),
        )
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Inverted index build — the IR-side view of the corpus: one row
    per surviving token carrying document frequency, collection
    frequency, and the full posting list as SORTED "doc:tf" strings
    (strings because a sorted string array compares identically in
    every engine, where arrays of structs round-trip differently
    through pandas). min_df prunes hapax noise; max_df is the stop-list
    valve — ultra-common tokens are exactly where posting lists go
    quadratic-ish at 100 TB, and real indexes segment or stop them
    (document the cap, don't pretend the skew away).

    Scale shape: explode -> groupBy(token, doc) with map-side combine
    (collapses within-doc repeats BEFORE any shuffle) -> one
    groupBy(token). The collect_list per token is bounded by df(token),
    which max_df caps explicitly. Output: (token, doc_freq, coll_freq,
    postings)."""
    t = df.select(F.col(id_col).alias("_d"), F.explode(tokens(text_col)).alias("tok"))
    per_doc = t.groupBy("tok", "_d").agg(F.count(F.lit(1)).alias("tf"))
    idx = per_doc.groupBy("tok").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("tf").cast("long").alias("coll_freq"),
        F.sort_array(
            F.collect_list(
                F.concat(F.col("_d").cast("string"), F.lit(":"), F.col("tf"))
            )
        ).alias("postings"),
    )
    out = idx.where(F.col("doc_freq") >= min_df)
    if max_df is not None:
        out = out.where(F.col("doc_freq") <= max_df)
    return out.select(
        F.col("tok").alias("token"),
        F.col("doc_freq").cast("long").alias("doc_freq"),
        "coll_freq",
        "postings",
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    ks: tuple = (10, 100, 1000),
) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all token
    OCCURRENCES the top-k most frequent tokens cover, for each k — the
    first question of tokenizer/vocab sizing ("how big a vocab before
    coverage flattens?").

    Shape: one token-count groupBy (partial-aggregated; the only pass
    over raw text), a two-phase global rank over the vocabulary
    (features.global_rank — range-partitioned, no single-partition
    sort of the vocab), then ONE conditional aggregate per k — no
    cumulative-sum window over the vocabulary at all, because the
    curve is only sampled at len(ks) points. Totals ride in on a
    broadcast single-row cross join; coverage is one double division
    of exact longs. Output: (k, vocab_size, covered_tokens,
    total_tokens, coverage)."""
    from .features import global_rank

    counts = (
        df.select(F.explode(tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = global_rank(counts, [F.col("cnt").desc(), "tok"], "_rnk")
    totals = counts.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum("cnt").cast("long").alias("total_tokens"),
    )
    kdf = ranked.select(
        "cnt",
        "_rnk",
        F.explode(F.array(*[F.lit(int(k)).cast("long") for k in ks])).alias("k"),
    )
    per_k = kdf.groupBy("k").agg(
        F.sum(F.when(F.col("_rnk") <= F.col("k"), F.col("cnt")))
        .cast("long")
        .alias("covered_tokens")
    )
    return per_k.crossJoin(F.broadcast(totals)).select(
        "k",
        "vocab_size",
        "covered_tokens",
        "total_tokens",
        (
            F.col("covered_tokens").cast("double")
            / F.col("total_tokens").cast("double")
        ).alias("coverage"),
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    idf_mode: str = "ln",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k retrieval for a small query-term list — the lexical
    search baseline behind eval-set decontamination and quality-aware
    sampling. Per doc: score = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 -
    b + b*dl/avgdl)).

    idf_mode='ln' is standard BM25 (ln((N-df+.5)/(df+.5)+1)); 'rational'
    drops the ln — (N-df+.5)/(df+.5) — keeping per-term doc ordering
    (ln is monotone) while avoiding cross-engine libm drift, the q60
    discipline that makes the operator oracle-checkable. Rank order can
    differ between modes only across MULTI-term score sums.

    Determinism: per-term components are fixed expressions over exact
    ints and the score is an explicit left-associated addition in
    sorted-term order — both engines evaluate the identical IEEE
    expression tree, so even the double score hash-matches.

    Scale shape: per-term tf via array-filter size over the token
    array — a narrow codegen map, NO explode/shuffle of tokens; corpus
    stats (N, sum_dl, per-term df) are ONE single-row aggregate
    broadcast back; top-k plans as TakeOrderedAndProject. Cost is
    O(len(terms)) array passes per doc — right for query-sized term
    lists, not for all-terms scoring (use tfidf/inverted_index)."""
    ts = sorted(set(terms))
    if not ts:
        raise ValueError("bm25_topk needs at least one query term")
    toks = tokens(text_col)

    # one-arg closure per term: a two-parameter lambda (even via a
    # default arg) makes the HOF pass the array INDEX as the second
    # argument, silently comparing tokens against positions
    def _tf(term: str):
        return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("long")

    tf_cols = [_tf(t) for t in ts]
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("dl"),
        *[c.alias(f"_tf{i}") for i, c in enumerate(tf_cols)],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("dl").cast("long").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long"))
            .cast("long")
            .alias(f"_df{i}")
            for i in range(len(ts))
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sumdl").cast("double") / F.col("_n").cast("double")
    comps = []
    for i in range(len(ts)):
        dfreq = F.col(f"_df{i}")
        ratio = ((F.col("_n") - dfreq).cast("double") + F.lit(0.5)) / (
            dfreq.cast("double") + F.lit(0.5)
        )
        idf = F.log(ratio + F.lit(1.0)) if idf_mode == "ln" else ratio
        tf = F.col(f"_tf{i}").cast("double")
        denom = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b)
            + F.lit(b) * F.col("dl").cast("double") / avgdl
        )
        comps.append(idf * (tf * F.lit(k1 + 1.0)) / denom)
    score = comps[0]
    for c in comps[1:]:
        score = score + c
    return (
        j.select(id_col, "dl", score.alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), id_col)
        .limit(k)
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """The first BPE merge step, corpus-wide: count adjacent character
    pairs weighted by word frequency and return the top-k merge
    candidates — how tokenizer training decides its first merges.

    Shape: one word-count groupBy collapses the corpus to its
    vocabulary (the only pass over raw text); pair generation is a
    narrow transform over VOCAB rows (each word emits len-1 pairs
    carrying the word's frequency, so a word repeated a million times
    is processed once); one pair-sum groupBy and a distributed top-k
    (TakeOrderedAndProject). Iterating BPE = re-tokenizing with the
    merged symbol and re-running — each step is vocab-sized, not
    corpus-sized, after the first. Output: (pair, cnt)."""
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    pairs = (
        words.where(F.length("w") >= 2)
        .select(
            "wf",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.col("w").substr(i, F.lit(2)),
                )
            ).alias("pair"),
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wf").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(k)
    )


_BPE_SEP = "\x1f"

# bpe_train lineage bound: merges apply as chained lazy replaces over
# the checkpointed base vocabulary; a real checkpoint every this-many
# merges keeps the plan shallow at any num_merges (graph._TRUNC_EVERY's
# role in the components loop)
_BPE_TRUNC_EVERY = 5

# Size switch for the driver-local BPE merge loop (round 16, VERDICT
# r15 #5; the graph._CC_LOCAL_MAX_EDGES pattern): the distributed loop
# costs one argmax job + a 1-row collect PER MERGE — pure fixed cost
# when the encoded vocabulary is small. Vocabularies at or below this
# many rows are collected once (bounded by the cap; the encoded string
# is ~3x the word, so 2^16 rows is a few MB) and the SAME
# argmax-merge-recount loop runs in plain Python: identical pair
# counts (exact integer sums), identical (cnt desc, l, r) tie-break
# (Python's code-point string order == Spark's UTF8_BINARY byte
# order), identical greedy application (str.replace and F.replace are
# both leftmost-nonoverlapping on the doubled-separator encoding).
# Larger vocabularies take the distributed loop unchanged; at 100 TB
# the word vocabulary exceeds the cap and the local path is inert.
# Env-tunable; 0 disables.
import os as _os

_BPE_LOCAL_MAX_VOCAB = int(
    _os.environ.get("SPARKSYNC_BPE_LOCAL_MAX_VOCAB", str(1 << 16))
)


def _local_bpe_merges(
    rows, num_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Driver-local twin of bpe_train's distributed loop, operating on
    the SAME already-encoded (s, wf) vocabulary rows the distributed
    argmax would read — the encoding (char split, separator doubling,
    \\x1f word filter) stays on the Spark side, so Java-vs-Python
    character-splitting differences (UTF-16 units vs code points)
    cannot arise here. Parity is pinned by
    test_bpe_train_local_path_parity."""
    sep = _BPE_SEP
    dd = sep + sep
    vocab = [(s, int(wf)) for s, wf in rows]
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, num_merges + 1):
        counts: dict = {}
        for s, wf in vocab:
            syms = [x for x in s.split(dd) if x]
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + wf
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, left, right, left + right, cnt))
        pat = sep + left + dd + right + sep
        rep = sep + left + right + sep
        vocab = [(s.replace(pat, rep), wf) for s, wf in vocab]
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
) -> DataFrame:
    """The full BPE trainer loop (X226, VERDICT r14 #2 — X111's
    bpe_pair_counts computes ONE merge step; tokenizer training is the
    iterated argmax-merge-recount loop, the Sennrich/GPT-2 recipe):
    repeat `num_merges` times — count adjacent symbol pairs weighted by
    word frequency, pick the most frequent pair (ties by lexicographic
    (left, right), the mode_by_group tiebreak discipline), merge it
    greedily left-to-right in every word, recount. Output: the learned
    merge table (step, left_sym, right_sym, merged, cnt), `step`
    ascending — the artifact a tokenizer loads.

    Scale shape: ONE word-count groupBy collapses the corpus to its
    vocabulary (the only pass over raw text, same as bpe_pair_counts);
    every iteration then runs on VOCAB-sized data — a pair-explode +
    groupBy + argmax (a ONE-row driver collect, the n_sources-row
    handoff discipline) + a narrow literal string replace. The replaces
    accumulate as chained lazy projections over the ONE checkpointed
    base vocabulary (one Spark job per merge, round 15 — was argmax +
    an eager per-round checkpoint, two jobs); every _BPE_TRUNC_EVERY
    merges a real localCheckpoint (previous blocks explicitly released,
    the ext/graph.py iterative-loop pattern) truncates the chain, so
    lineage stays bounded at any merge count.

    Greedy-merge encoding (exactness, both engines): a word's symbol
    sequence is kept as a string with DOUBLED \\x1f separators at every
    boundary ("\\x1f\\x1fa\\x1f\\x1fb\\x1f\\x1f"); merging (a, b)
    replaces "\\x1fa\\x1f\\x1fb\\x1f" with "\\x1fab\\x1f". The search
    key takes exactly one separator from each flanking boundary and
    the replacement restores it, so adjacent occurrences never compete
    for a shared delimiter and the engine's leftmost-nonoverlapping
    replace() IS exact greedy BPE ("a a a a a" merging (a,a) gives
    [aa, aa, a] in both Spark and DuckDB — probed, not assumed). Words
    containing \\x1f are excluded (they would corrupt the encoding;
    the oracle applies the same filter). Symbols are Java chars on the
    Spark side — fine for the ASCII/BMP fixture text; non-BMP corpora
    would need a codepoint split on both engines."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    from .graph import _release_checkpoint

    sep = _BPE_SEP
    dd = sep + sep
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .where(~F.col("w").contains(sep))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    # lazy checkpoint + count (round 16, the dedup_report fusion): one
    # job materializes the vocabulary AND reports its size for the
    # local-loop switch below (the count cannot prune through the RDD
    # barrier, so the blocks hold both columns)
    vocab = words.select(
        F.concat(
            F.lit(dd),
            F.concat_ws(
                dd, F.filter(F.split("w", ""), lambda x: x != F.lit(""))
            ),
            F.lit(dd),
        ).alias("s"),
        "wf",
    ).localCheckpoint(eager=False)
    n_vocab = vocab.count()
    if 0 < _BPE_LOCAL_MAX_VOCAB and n_vocab <= _BPE_LOCAL_MAX_VOCAB:
        # driver-local loop: one collect of the (bounded) encoded
        # vocabulary replaces num_merges argmax jobs + 1-row collects
        rows = [(r[0], r[1]) for r in vocab.collect()]
        _release_checkpoint(vocab)
        return df.sparkSession.createDataFrame(
            _local_bpe_merges(rows, num_merges),
            "step int, left_sym string, right_sym string, merged string,"
            " cnt long",
        )
    merges: list[tuple[int, str, str, str, int]] = []
    # Fused loop (round 15, guide §1.2 fixed-cost trim): the merge
    # replace is a NARROW vocab-row projection, so instead of eagerly
    # checkpointing the merged vocabulary every round (one extra Spark
    # job per merge), the accumulated merges ride each argmax job as
    # chained lazy replace()s over the ONE checkpointed base — exactly
    # bpe_segment's chained-replace form, which is exact greedy merge
    # application in step order. One job per merge instead of two;
    # lineage is truncated by a real checkpoint every
    # _BPE_TRUNC_EVERY merges so plan depth stays bounded at any
    # num_merges. The argmax each step reads the identical
    # post-(step-1)-merges vocabulary either way — same merge table.
    cur, pending = vocab, 0
    try:
        for step in range(1, num_merges + 1):
            syms = F.filter(F.split("s", dd), lambda x: x != F.lit(""))
            pair_arr = F.when(
                F.size(syms) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(syms) - 1),
                    lambda i: F.struct(
                        F.element_at(syms, i).alias("l"),
                        F.element_at(syms, i + 1).alias("r"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
            best = (
                cur.select("wf", F.explode(pair_arr).alias("p"))
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("wf").cast("long").alias("cnt"))
                .orderBy(F.col("cnt").desc(), "l", "r")
                .limit(1)
                .collect()
            )
            if not best:
                break
            left, right, cnt = best[0].l, best[0].r, int(best[0].cnt)
            merges.append((step, left, right, left + right, cnt))
            cur = cur.select(
                F.replace(
                    F.col("s"),
                    F.lit(sep + left + dd + right + sep),
                    F.lit(sep + left + right + sep),
                ).alias("s"),
                "wf",
            )
            pending += 1
            if pending >= _BPE_TRUNC_EVERY and step < num_merges:
                nxt = cur.localCheckpoint(eager=True)
                _release_checkpoint(vocab)
                vocab, cur, pending = nxt, nxt, 0
    finally:
        _release_checkpoint(vocab)
    return df.sparkSession.createDataFrame(
        merges,
        "step int, left_sym string, right_sym string, merged string, cnt long",
    )


def bpe_segment(
    df: DataFrame,
    merges,
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned BPE merge table (X228 — bpe_train's other
    half): segment every vocabulary word with the trained merges and
    report its piece count — the artifact that tells you what the
    tokenizer DOES to your corpus (fertility per word, weighted by
    frequency) before you commit to it.

    `merges` is bpe_train's output DataFrame (consumed via a
    num_merges-row collect, the k-row handoff discipline) or a
    pre-collected [(left, right), ...] list in step order.

    Scale shape — the train/apply asymmetry is the point: training
    needs one Spark job per merge (each argmax depends on the previous
    merge), but APPLYING a frozen merge list is k chained literal
    replaces folded into ONE narrow projection — a single job with
    exactly one exchange (the word-count groupBy, plan-guarded), no
    iteration, no checkpoint (the HOF char-split runs interpreted, not
    codegen'd — measured, and irrelevant next to the scan: it touches
    vocab rows once). Same doubled-separator encoding as
    bpe_train, so chained replace() is exact greedy merge application
    in training order (how a BPE tokenizer encodes at inference).
    Output: (w, wf, n_pieces, pieces), pieces space-joined."""
    if hasattr(merges, "collect"):
        merges = [
            (r.left_sym, r.right_sym)
            for r in merges.orderBy("step").collect()
        ]
    sep = _BPE_SEP
    dd = sep + sep
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .where(~F.col("w").contains(sep))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("wf"))
    )
    s = F.concat(
        F.lit(dd),
        F.concat_ws(dd, F.filter(F.split("w", ""), lambda x: x != F.lit(""))),
        F.lit(dd),
    )
    for left, right in merges:
        s = F.replace(
            s,
            F.lit(sep + left + dd + right + sep),
            F.lit(sep + left + right + sep),
        )
    syms = F.filter(F.split(s, dd), lambda x: x != F.lit(""))
    return words.select(
        "w",
        "wf",
        F.size(syms).cast("long").alias("n_pieces"),
        F.concat_ws(" ", syms).alias("pieces"),
    )


def extract_matches(
    df: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Regex extraction TABLE: every match of `pattern` as its own row
    with its per-document occurrence index — the structured-extraction
    primitive (IDs, amounts, codes) that turns free text into joinable
    facts. regexp_extract_all + posexplode: a narrow codegen map, no
    shuffle; match order is appearance order, so the occurrence index
    replays in any engine. Keep patterns in the portable subset
    (character classes, quantifiers, anchors) — engine regex dialects
    diverge on exotica. The pattern rides the column-based
    regexp_extract_all (F.lit-bound), never an interpolated SQL string
    literal, so quotes/backslashes in a user pattern cannot break or
    inject into the expression. Output: (id, occurrence, match)."""
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
        ).alias("occurrence", "match"),
    ).select(
        id_col,
        F.col("occurrence").cast("long").alias("occurrence"),
        "match",
    )


def source_drift_l1(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-distribution drift per source: L1 distance between each
    source's token frequency distribution and the corpus-wide one —
    the monitor that flags a crawler gone off the rails before its
    text poisons a training mix.

    The sum of |p_s(t) - p(t)| is an order-dependent float fold if
    computed naively; here it is EXACT: with per-source totals T_s and
    corpus total T, each term is |cnt_s*T - cnt*T_s| (decimal(38,0),
    so 100 TB-scale token counts cannot wrap a long), the sum
    accumulates exactly, and ONE final division by T_s*T produces the
    distance. Tokens absent from a source still contribute (their
    cnt_s = 0 term is cnt*T_s), accounted without a join-back by the
    complement identity: sum over missing tokens of cnt*T_s =
    (T - seen_cnt)*T_s. Shape: one corpus token count, one per-source
    count, one vocab-sized join, group-cardinality output."""
    toks = df.select(
        F.col(group_col), F.explode(tokens(text_col)).alias("tok")
    )
    per_source = toks.groupBy(group_col, "tok").agg(
        F.count(F.lit(1)).alias("cnt_s")
    )
    corpus = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    totals_s = per_source.groupBy(group_col).agg(
        F.sum("cnt_s").cast("long").alias("_ts")
    )
    total = corpus.agg(F.sum("cnt").cast("long").alias("_t"))
    j = (
        per_source.join(corpus, "tok")
        .join(F.broadcast(totals_s), group_col)
        .crossJoin(F.broadcast(total))
    )
    # cross-products in decimal(38,0): cnt_s*T in longs would silently
    # wrap once corpus token counts near 2^63 / per-source totals
    dec = "decimal(38,0)"
    term = F.abs(
        F.col("cnt_s").cast(dec) * F.col("_t").cast(dec)
        - F.col("cnt").cast(dec) * F.col("_ts").cast(dec)
    )
    seen = j.groupBy(group_col, "_ts", "_t").agg(
        F.sum(term).alias("_seen_num"),
        F.sum(F.col("cnt").cast("long")).cast("long").alias("_seen_cnt"),
        F.count(F.lit(1)).cast("long").alias("vocab_seen"),
    )
    # unseen-token mass: every corpus token this source never emits
    num = F.col("_seen_num") + (
        (F.col("_t") - F.col("_seen_cnt")).cast(dec) * F.col("_ts").cast(dec)
    )
    return seen.select(
        group_col,
        "vocab_seen",
        (
            num.cast("double")
            / (F.col("_ts").cast("double") * F.col("_t").cast("double"))
        ).alias("l1_distance"),
    )


def vocab_growth_curve(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    every: int = 100,
) -> DataFrame:
    """Heaps'-law vocabulary growth: distinct tokens seen after
    ingesting docs 1..k (in id order), sampled every `every` docs —
    the curve that says when a corpus stops teaching a tokenizer new
    words. No running-distinct state: each token contributes at its
    FIRST document (one min aggregate per token), first-appearance
    counts aggregate per doc, and the running total runs over
    doc-cardinality counter rows (constant-hash partition, the
    global_rank offset trick). All integers — replays exactly.
    Output: (docs_ingested, vocab_size) at the sampled checkpoints."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    first = toks.groupBy("tok").agg(F.min(id_col).alias("_d"))
    per_doc = first.groupBy("_d").agg(
        F.count(F.lit(1)).cast("long").alias("_new")
    )
    w = (
        Window.partitionBy(F.pmod(F.xxhash64(F.col("_d")), F.lit(1)))
        .orderBy("_d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = per_doc.withColumn(
        "vocab_size", F.sum("_new").over(w).cast("long")
    )
    return curve.where(F.col("_d") % every == 0).select(
        F.col("_d").alias("docs_ingested"), "vocab_size"
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct shingles
    (3-gram, the dedup vocabulary) that occur in NO other document —
    high-novelty docs carry information the rest of the corpus lacks;
    near-zero novelty marks boilerplate. Inverted-index shape: one
    shingle->document-frequency aggregate, joined back per (doc,
    shingle), then one per-doc count split and ONE final division.
    Integers until the division — replays exactly. Docs too short to
    shingle drop (no vocabulary to score). Output: (id, n_shingles,
    n_unique_to_doc, novelty)."""
    from .dedup import shingles

    sh = shingles(df, id_col, text_col)
    dfreq = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("long").alias("_df")
    )
    j = sh.join(dfreq, "shingle")
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("_df") == 1).cast("long"))
            .cast("long")
            .alias("n_unique_to_doc"),
        )
        .withColumn(
            "novelty",
            F.col("n_unique_to_doc").cast("double")
            / F.col("n_shingles").cast("double"),
        )
    )


def encoding_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Encoding / mojibake QA: per doc, the count of printable-ASCII
    chars vs everything else plus a U+FFFD replacement-char count —
    the cheap narrow-map gate that catches a crawler decoding with the
    wrong charset before the text poisons a mix. Portable regex subset
    only ([ -~] is the printable-ASCII class in both RE2 and Java
    regex); integers until one division. Output: (doc_id, n_chars,
    ascii_chars, non_ascii, replacement_chars, ascii_ratio, flag)."""
    t = F.col(text_col)
    n = F.length(t).cast("long")
    ascii_n = F.length(F.regexp_replace(t, "[^ -~]", "")).cast("long")
    repl = (
        n - F.length(F.regexp_replace(t, "�", ""))
    ).cast("long")
    ratio = F.when(n > 0, ascii_n.cast("double") / n.cast("double")).otherwise(
        F.lit(1.0)
    )
    return df.select(
        F.col("doc_id"),
        n.alias("n_chars"),
        ascii_n.alias("ascii_chars"),
        (n - ascii_n).alias("non_ascii"),
        repl.alias("replacement_chars"),
        ratio.alias("ascii_ratio"),
        ((ratio >= 0.8) & (repl == 0)).cast("long").alias("flag_ok"),
    )


def tokenizer_fertility(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-fertility profile per language: BPE-ish tokens per
    whitespace word (sum ratio from exact integer token counts, ONE
    double division) — the metric that says which languages pay a
    token-budget premium under a given tokenizer, driving mixture
    weights and cost forecasts. Reuses token_counts' two counters in
    one partial-agg groupBy. Output: (group, n_docs, ws_tokens,
    bpe_tokens, fertility)."""
    counted = token_counts(df, text_col, keep=[group_col])
    agg = counted.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ws_tokens").cast("long").alias("ws_tokens"),
        F.sum("bpe_tokens").cast("long").alias("bpe_tokens"),
    )
    return agg.select(
        group_col,
        "n_docs",
        "ws_tokens",
        "bpe_tokens",
        (
            F.col("bpe_tokens").cast("double")
            / F.greatest(F.col("ws_tokens"), F.lit(1)).cast("double")
        ).alias("fertility"),
    )


def charclass_entropy(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    include_entropy: bool = False,
) -> DataFrame:
    """Character-class composition per group: letters / digits /
    whitespace / other counted exactly per doc (ASCII classes only —
    Unicode letter classes disagree across regex engines), summed per
    group, plus each class's share (ONE double division of exact
    bigints — bit-replayable). A crawl feed whose composition
    collapses (all digits: logs; all punctuation: minified code) or
    jumps is misclassified content — the cheap per-source composition
    monitor a mixture pipeline tails daily.

    include_entropy=True appends the Shannon entropy double. It is NOT
    part of the gated/oracle output: ln() is not correctly-rounded, so
    JVM Math.log and DuckDB/libm differ by 1 ulp on some arguments —
    exactly how the round-7 q189 gate failed hash parity (VERDICT r7
    #2; same discipline as the rational-idf q60/q118 gates). The
    entropy column is covered by a tolerance pytest instead
    (tests/test_ext.py), and the four exact counts + four shares
    carry the same monitoring signal: entropy is a deterministic
    function of the shares.

    Output: (group, letters, digits, spaces, others, total_chars,
    letter_share, digit_share, space_share, other_share[, entropy])."""
    t = F.col(text_col)
    n = F.length(t).cast("long")
    letters = F.length(t) - F.length(F.regexp_replace(t, "[A-Za-z]", ""))
    digits = F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))
    spaces = F.length(t) - F.length(F.regexp_replace(t, "[ \\t\\n\\r]", ""))
    agg = df.select(
        F.col(group_col),
        n.alias("_n"),
        letters.cast("long").alias("_l"),
        digits.cast("long").alias("_d"),
        spaces.cast("long").alias("_s"),
    ).groupBy(group_col).agg(
        F.sum("_l").cast("long").alias("letters"),
        F.sum("_d").cast("long").alias("digits"),
        F.sum("_s").cast("long").alias("spaces"),
        F.sum("_n").cast("long").alias("total_chars"),
    )
    others = (
        F.col("total_chars") - F.col("letters") - F.col("digits") - F.col("spaces")
    )

    def share(c):
        return c.cast("double") / F.col("total_chars").cast("double")

    cols = [
        F.col(group_col),
        F.col("letters"),
        F.col("digits"),
        F.col("spaces"),
        others.cast("long").alias("others"),
        F.col("total_chars"),
        share(F.col("letters")).alias("letter_share"),
        share(F.col("digits")).alias("digit_share"),
        share(F.col("spaces")).alias("space_share"),
        share(others).alias("other_share"),
    ]
    if include_entropy:

        def term(c):
            p = share(c)
            return F.when(c > 0, -p * F.log(p)).otherwise(F.lit(0.0))

        cols.append(
            (
                term(F.col("letters"))
                + term(F.col("digits"))
                + term(F.col("spaces"))
                + term(others)
            ).alias("entropy")
        )
    return agg.select(*cols)


def truncation_loss(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    max_len: int = 64,
) -> DataFrame:
    """Context-window truncation audit per group: how many docs exceed
    max_len whitespace tokens and what fraction of the group's tokens a
    hard truncation at max_len would discard — the number that decides
    whether a feed needs chunking (chunk_documents) before packing
    (pack_sequences) instead of silent tail loss. Exact integer token
    counts, two double divisions at the end; the p50/p95 token-count
    percentiles use exact interpolation (cross-engine stable).
    Output: (group, n_docs, total_tokens, docs_truncated, tokens_lost,
    doc_trunc_frac, token_loss_frac, p50_tokens, p95_tokens)."""
    ws = F.size(tokens(text_col)).cast("long")
    per_doc = df.select(F.col(group_col), ws.alias("_ws"))
    agg = per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_ws").cast("long").alias("total_tokens"),
        F.sum((F.col("_ws") > max_len).cast("long")).cast("long").alias(
            "docs_truncated"
        ),
        F.sum(F.greatest(F.col("_ws") - max_len, F.lit(0))).cast("long").alias(
            "tokens_lost"
        ),
        F.expr("percentile(_ws, 0.5)").alias("p50_tokens"),
        F.expr("percentile(_ws, 0.95)").alias("p95_tokens"),
    )
    return agg.select(
        group_col,
        "n_docs",
        "total_tokens",
        "docs_truncated",
        "tokens_lost",
        (
            F.col("docs_truncated").cast("double") / F.col("n_docs").cast("double")
        ).alias("doc_trunc_frac"),
        (
            F.col("tokens_lost").cast("double")
            / F.greatest(F.col("total_tokens"), F.lit(1)).cast("double")
        ).alias("token_loss_frac"),
        "p50_tokens",
        "p95_tokens",
    )


def ngram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_k: int = 512,
    mode: str = "ln",
    scale_bits: int = 20,
    limit: int = 20,
    n_salts: int = 32,
) -> DataFrame:
    """Bigram language-model surprisal filter — the CCNet/KenLM-shaped
    quality gate: train an add-one-smoothed bigram LM on the corpus
    itself, score every document by how improbable its text is under
    that model, and surface the most surprising docs (gibberish,
    boilerplate, wrong-language — the candidates a quality pipeline
    drops or down-weights before training).

    The vocabulary is CAPPED: the top `vocab_k` tokens by corpus
    frequency (ties by token asc) keep their identity, everything else
    maps to '<unk>'. The cap is what bounds the model no matter how
    large the corpus — at most (vocab_k+1)^2 observed bigram types —
    so the model side of the scoring join stays broadcast-sized at
    100 TB while the corpus side streams through.

    mode='ln' (production): per-doc perplexity exp(-mean ln p), the
    standard number. mode='fixed' (the oracle-replayable gate — the
    q60/q118 no-libm discipline): per-bigram reciprocal likelihood
    1/p = (c1 + V_eff) / (c12 + 1) in fixed point,
    floor((c1 + V_eff) << scale_bits / (c12 + 1)) — exact int64
    arithmetic end to end, ONE double division per doc at the finish,
    so every value replays bit-exactly in any engine. The two modes
    are the arithmetic vs geometric mean of the SAME per-bigram 1/p
    values, so per doc ln <= fixed always (AM-GM, equality iff the
    doc's bigram probabilities are uniform) — but they are different
    summaries, NOT monotone transforms of each other: a doc with one
    extreme bigram dominates the AM far more than the GM, and the
    top-k sets overlap without coinciding (measured ~7-15 of 20 on
    the gate fixtures; test_lm_fixed_vs_ln_mode_relationship pins the
    inequality, the equality case, and overlap floors). The gate
    certifies the fixed summary bit-exactly; production ships the
    perplexity.

    Scale shape: one explode -> unigram counts with map-side combine;
    vocab top-k via the salted two-phase window (vocab_topk's
    discipline — never a single global sort of the whole vocabulary);
    the vocab membership join is an explicit broadcast (vocab_k rows);
    bigram assembly is one window shuffle partitioned by doc; the
    scoring join keys on (w, w2) against the model table, explicitly
    broadcast when its (vocab_k+1)^2 ceiling is provably
    broadcast-sized and left to AQE's runtime stats otherwise.

    EAGER by contract since round 15 (ADVICE r15): building this plan
    materializes the shared mapped-bigram table (_lm_base pins it and
    count()s — the tokenize+census+window pipeline runs ONCE at call
    time and its three consumers read the pin), so the per-doc stats
    branch pays the window shuffle that the old all-lazy shape let
    Catalyst prune for stats-only consumers. Only compose this into
    pipelines you will actually execute (the jaccard_pairs max_df
    precedent). Overflow guard:
    (c1 + V_eff) << scale_bits must fit int64;
    the guard is folded into the used term column (a free-standing
    guard would be pruned) and raises with advice instead of wrapping.

    Output: the `limit` most-surprising docs
    (id, n_tokens, n_unk, n_bigrams, lm_surprisal), lm_surprisal
    descending, ties by id asc. lm_surprisal is mean 1/p for
    mode='fixed', perplexity for mode='ln'. Docs with < 2 tokens have
    no bigram evidence and are excluded.
    """
    if mode not in ("ln", "fixed"):
        raise ValueError(f"ngram_lm_score: unknown mode {mode!r}")
    scale = 1 << scale_bits
    cap = ((1 << 63) - 1) >> scale_bits

    stats, types, veff = _lm_base(df, text_col, id_col, vocab_k, n_salts)
    c12 = types.groupBy("_w", "_w2").agg(F.sum("_k").alias("_c12"))
    c1 = c12.groupBy("_w").agg(F.sum("_c12").alias("_c1"))
    model = _lm_broadcastable(
        c12.join(c1, "_w").crossJoin(F.broadcast(veff)), vocab_k
    )

    scored = types.join(model, ["_w", "_w2"]).withColumn(
        "_num",
        F.when(
            (F.col("_c1") + F.col("_veff")) > F.lit(cap),
            F.raise_error(
                f"ngram_lm_score: (c1 + V_eff) << {scale_bits} overflows "
                "int64 - lower scale_bits"
            ).cast("long"),
        ).otherwise(F.col("_c1") + F.col("_veff")),
    )
    if mode == "fixed":
        term = F.expr(f"_k * ((_num * {scale}L) div (_c12 + 1L))")
        per_doc = scored.groupBy(id_col).agg(
            _lm_sum_fp(term, "ngram_lm_score").alias("_sum_fp"),
            F.sum("_k").cast("long").alias("n_bigrams"),
        )
        surprisal = F.col("_sum_fp").cast("double") / (
            F.col("n_bigrams") * F.lit(scale)
        ).cast("double")
    else:
        term = F.col("_k").cast("double") * -F.log(
            (F.col("_c12") + F.lit(1)).cast("double")
            / F.col("_num").cast("double")
        )
        per_doc = scored.groupBy(id_col).agg(
            F.sum(term).alias("_sum_ln"),
            F.sum("_k").cast("long").alias("n_bigrams"),
        )
        surprisal = F.exp(
            F.col("_sum_ln") / F.col("n_bigrams").cast("double")
        )

    full = stats.join(per_doc, id_col).withColumn("lm_surprisal", surprisal)
    return _lm_topk_docs(
        full,
        "lm_surprisal",
        id_col,
        limit,
        n_salts,
        [id_col, "n_tokens", "n_unk", "n_bigrams", "lm_surprisal"],
    )


def lm_vocab_census(
    df: DataFrame,
    vocab_k: int = 512,
    text_col: str = "text",
    n_salts: int = 32,
) -> DataFrame:
    """The frozen-vocabulary census — the census-once half of the LM
    family's census-once/maintain-forever split: top `vocab_k` corpus
    tokens by (freq desc, token asc) via the salted two-phase top-k
    (vocab_topk's discipline). Counted over the same population every
    LM operator scores: documents with >= 2 tokens (bigram evidence),
    so a vocabulary frozen here matches what ngram_lm_score would
    derive internally. Collect this (<= vocab_k rows, the
    centroid-sized-collect precedent) to feed lm_bigram_counts /
    lm_counts_stream / lm_score_against_model.
    Output: (tok, freq, rnk)."""
    uni = (
        df.select(tokens(text_col).alias("_toks"))
        .where(F.size("_toks") >= 2)
        .select(F.explode("_toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w_salt = Window.partitionBy("_salt").orderBy(F.desc("freq"), F.col("tok"))
    w_all = Window.orderBy(F.desc("freq"), F.col("tok"))
    return (
        uni.withColumn("_salt", F.pmod(F.xxhash64("tok"), F.lit(n_salts)))
        .withColumn("_r", F.row_number().over(w_salt))
        .where(F.col("_r") <= vocab_k)
        .withColumn("rnk", F.row_number().over(w_all).cast("long"))
        .where(F.col("rnk") <= vocab_k)
        .select("tok", "freq", "rnk")
    )


# A/B switch for _lm_base's round-15 pin (True = production shape).
# Flipped only by tools/ab harnesses to reproduce the old all-lazy arm.
_LM_PIN = True

# A/B arm (round 16, VERDICT r15 #7): _lm_base's bigram table built
# from array-side adjacent pairs + two broadcast vocab joins instead
# of the per-token lead() window — the form round 15 rejected at
# sf0.1 (2.39 -> 2.91 s) with the note that its shuffle is per-doc
# bigram TYPES while the window's is the raw token stream, so it
# could win at real scale. Round 16 re-adjudicated it on the
# synthesized sf1 decade (interleaved, committed table in
# OPTIMIZATION_r16.md) — it LOST there too, so the window form stays
# production and this flag exists only for the env-driven A/B
# (SPARKSYNC_LM_ARRAY_BIGRAMS=1).
_LM_ARRAY_BIGRAMS = _os.environ.get("SPARKSYNC_LM_ARRAY_BIGRAMS", "0") == "1"


def _lm_base(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab_k: int,
    n_salts: int,
    flag: Column | None = None,
):
    """The shared bigram-LM corpus pass behind ngram_lm_score and
    lm_target_affinity: tokenize, cap the vocabulary at the top
    `vocab_k` corpus tokens (salted two-phase top-k — never one global
    sort of the whole vocabulary; ties by token asc), map everything
    else to '<unk>' via an explicit vocab broadcast, and assemble
    bigrams with one window shuffle partitioned by doc. Docs with
    < 2 tokens drop out (no bigram evidence).

    `flag` optionally carries a per-doc boolean through as `_tgt`
    (constant within a doc, so adding it to the grouping keys changes
    no group). Returns (stats, types, veff): per-doc
    (id[, _tgt], n_tokens, n_unk); per-doc bigram types
    (id[, _tgt], _w, _w2, _k); and the one-row smoothing denominator
    |vocab| + 1.

    Round 15 (guide §5 persist-when-reused; the change-2 shingle-pin
    discipline): the mapped-bigram table (`big`) feeds THREE
    aggregations in ngram_lm_score (stats, the c12 model build, and
    the scoring join's types side) and the census feeds two more (the
    membership broadcast + veff) — all lazy, so one run executed the
    tokenize + census + vocab-map + window pipeline ~3x and the
    census ~2x (lambda-bearing subtrees defeat exchange reuse,
    plan-audited: zero ReusedExchange). Both are now pinned
    (features._pin: MEMORY_AND_DISK, FIFO-capped registry) and `big`
    is materialized with a count() so the three consumers cannot race
    an unmaterialized cache into recomputing the pass (the change-1
    gotcha). Pin storage is bigram-row-scale — the same order as the
    shuffle the c12 aggregation writes from those rows anyway (the
    change-2 trade) — and the census is <= vocab_k rows. Warm runs
    (the bench's median-of-3, or any session re-scoring the same
    corpus) reuse both pins; cold cost stays visible in first_run.
    `_LM_PIN` exists for the A/B harness (False = the old all-lazy
    shape)."""
    keep = [F.col(id_col)]
    gcols = [id_col]
    if flag is not None:
        keep.append(flag.cast("boolean").alias("_tgt"))
        gcols.append("_tgt")
    d2 = df.select(*keep, tokens(text_col).alias("_toks")).where(
        F.size("_toks") >= 2
    )
    tok = d2.select(*gcols, F.posexplode("_toks").alias("_pos", "_tok"))
    vocab = lm_vocab_census(df, vocab_k, text_col, n_salts).select(
        F.col("tok").alias("_tok")
    )
    if _LM_PIN:
        from .features import _pin

        # materialized as a side effect of big.count() below (the
        # census is a subtree of `big`'s plan), so no dedicated job
        vocab = _pin(vocab)
    if _LM_ARRAY_BIGRAMS:
        # A/B arm (see the flag note): bigrams assembled array-side and
        # '<unk>'-mapped by two broadcast vocab joins over the exploded
        # PAIRS — no per-doc window shuffle; stats come from a separate
        # token-explode aggregate (two tokenize passes instead of one
        # pinned table, the arm's structural cost)
        from .features import _pin as _pin_b

        nn = F.size("_toks")
        raw = F.zip_with(
            F.slice(F.col("_toks"), 1, nn - 1),
            F.slice(F.col("_toks"), 2, nn - 1),
            lambda a, b: F.struct(a.alias("rw"), b.alias("rw2")),
        )
        ex = d2.select(*gcols, F.explode(raw).alias("_p")).select(
            *gcols,
            F.col("_p.rw").alias("_rw"),
            F.col("_p.rw2").alias("_rw2"),
        )
        m1 = F.broadcast(
            vocab.select(F.col("_tok").alias("_rw"), F.lit(1).alias("_v1"))
        )
        m2 = F.broadcast(
            vocab.select(F.col("_tok").alias("_rw2"), F.lit(1).alias("_v2"))
        )
        big2 = (
            ex.join(m1, "_rw", "left")
            .join(m2, "_rw2", "left")
            .select(
                *gcols,
                F.when(F.col("_v1") == 1, F.col("_rw"))
                .otherwise(F.lit("<unk>"))
                .alias("_w"),
                F.when(F.col("_v2") == 1, F.col("_rw2"))
                .otherwise(F.lit("<unk>"))
                .alias("_w2"),
            )
        )
        if _LM_PIN:
            big2 = _pin_b(big2)
            big2.count()
        types = big2.groupBy(*gcols, "_w", "_w2").agg(
            F.count(F.lit(1)).cast("long").alias("_k")
        )
        stats = (
            tok.join(
                F.broadcast(vocab.withColumn("_v", F.lit(1))), "_tok", "left"
            )
            .groupBy(*gcols)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_tokens"),
                F.sum(F.col("_v").isNull().cast("long"))
                .cast("long")
                .alias("n_unk"),
            )
        )
        veff = vocab.groupBy().agg(
            (F.count(F.lit(1)) + F.lit(1)).cast("long").alias("_veff")
        )
        return stats, types, veff
    mapped = tok.join(
        F.broadcast(vocab.withColumn("_v", F.lit(1))), "_tok", "left"
    ).select(
        *gcols,
        F.col("_pos"),
        F.when(F.col("_v") == 1, F.col("_tok"))
        .otherwise(F.lit("<unk>"))
        .alias("_w"),
    )
    w_doc = Window.partitionBy(id_col).orderBy("_pos")
    big = mapped.withColumn("_w2", F.lead("_w").over(w_doc))
    if _LM_PIN:
        from .features import _pin

        big = _pin(big)
        big.count()
    stats = big.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum((F.col("_w") == "<unk>").cast("long")).cast("long").alias("n_unk"),
    )
    types = (
        big.where(F.col("_w2").isNotNull())
        .groupBy(*gcols, "_w", "_w2")
        .agg(F.count(F.lit(1)).cast("long").alias("_k"))
    )
    veff = vocab.groupBy().agg(
        (F.count(F.lit(1)) + F.lit(1)).cast("long").alias("_veff")
    )
    return stats, types, veff


def _lm_broadcastable(model: DataFrame, vocab_k: int) -> DataFrame:
    """The model's row ceiling is (vocab_k+1)^2 BY CONSTRUCTION (every
    token outside the vocab is '<unk>'), so for default-sized vocabs
    the scoring join never needs a shuffle of the corpus side; past a
    ~4M ceiling the observed-bigram count is data-dependent and the
    broadcast call is left to AQE's runtime statistics instead."""
    return F.broadcast(model) if (vocab_k + 1) ** 2 <= 4_000_000 else model


def _lm_sum_fp(term, fname: str):
    """Overflow-symmetric per-doc sum for mode='fixed': Spark's
    non-ANSI int64 SUM wraps silently while the DuckDB oracle sums
    into hugeint and RAISES on the bigint cast — an asymmetric failure
    on very long docs with context counts near the single-term guard.
    Summing into decimal(38,0) (exact, 38 digits >> any doc's term
    count x the int64 term bound) and raising on either int64 bound
    makes both engines fail loudly instead of one wrapping."""
    mx = (1 << 63) - 1
    s = F.sum(term.cast("decimal(38,0)"))
    return (
        F.when(
            (s > F.lit(str(mx)).cast("decimal(38,0)"))
            | (s < F.lit(str(-(1 << 63))).cast("decimal(38,0)")),
            F.raise_error(
                f"{fname}: per-doc fixed-point sum overflows int64 - "
                "lower scale_bits"
            ).cast("decimal(38,0)"),
        )
        .otherwise(s)
        .cast("long")
    )


def _lm_topk_docs(
    full: DataFrame,
    score_col: str,
    id_col: str,
    limit: int,
    n_salts: int,
    out_cols: list[str],
) -> DataFrame:
    """Global top-`limit` docs by (score desc, id asc) via the salted
    two-phase window discipline — never one global sort of the full
    per-doc table."""
    w_pre = Window.partitionBy("_salt").orderBy(
        F.desc(score_col), F.col(id_col)
    )
    w_fin = Window.orderBy(F.desc(score_col), F.col(id_col))
    return (
        full.withColumn("_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)))
        .withColumn("_r", F.row_number().over(w_pre))
        .where(F.col("_r") <= limit)
        .withColumn("_rn", F.row_number().over(w_fin))
        .where(F.col("_rn") <= limit)
        .select(*out_cols)
    )


def lm_target_affinity(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_k: int = 512,
    mode: str = "ln",
    scale_bits: int = 20,
    limit: int = 20,
    n_salts: int = 32,
) -> DataFrame:
    """DSIR-shaped importance scoring for training-data selection
    (Xie et al., "Data Selection for Language Models via Importance
    Resampling"): train TWO add-one bigram LMs in one pass — a target
    model on the docs where `target` holds and a raw model on the
    whole corpus — and score every document by how much better the
    target model predicts it. The top non-target docs are the raw-pool
    candidates to up-sample toward the target distribution.

    Both models share ONE bigram pipeline and one feature space (the
    capped top-`vocab_k` vocabulary of the WHOLE corpus, '<unk>'
    elsewhere): the target counts are a conditional sum inside the
    same bigram aggregation, so the second model costs one extra
    column, not a second tokenize/window/aggregate pipeline. (Like
    any LM train, the plan still reads the corpus more than once —
    the vocabulary census must finish before tokens can be mapped —
    but the pass count is a constant independent of the target
    choice.) Smoothing caveat shared with all
    differently-sized-corpus LM ratios: bigrams unseen in BOTH models
    still differ through their context counts (the raw corpus is
    bigger), so pure-noise docs carry a small constant target-ward
    shift rather than zero — orderings among genuinely
    distinguishable docs are unaffected.

    mode='ln' (production): per-doc geometric-mean likelihood ratio
    exp(mean ln(p_t/p_r)) — the length-normalized DSIR importance
    weight (> 1 means target-like). mode='fixed' (the
    oracle-replayable gate): mean reciprocal-likelihood difference
    mean(1/p_r - 1/p_t) in exact int64 fixed point (> 0 means
    target-like), ONE double division per doc — the q60/q118 no-libm
    discipline. Both rank "target-like" the same way per bigram.

    Scale shape: identical to ngram_lm_score (shared _lm_base) plus
    one conditional-sum column; the overflow guard rides the raw
    context count, which bounds the target one (c1_t <= c1_r always).
    EAGER by contract since round 15, like ngram_lm_score (ADVICE
    r15): building the plan materializes _lm_base's pinned
    mapped-bigram table with a count() — only compose this into
    pipelines you will actually execute.
    Output: top `limit` docs by (affinity desc, id asc) —
    (id, is_target, n_bigrams, target_affinity)."""
    if mode not in ("ln", "fixed"):
        raise ValueError(f"lm_target_affinity: unknown mode {mode!r}")
    scale = 1 << scale_bits
    cap = ((1 << 63) - 1) >> scale_bits

    # stats (n_tokens/n_unk) deliberately unused here: the affinity
    # report carries is_target instead, and skipping the join keeps
    # the plan one aggregation narrower
    _stats, types, veff = _lm_base(
        df, text_col, id_col, vocab_k, n_salts, flag=target
    )
    c12 = types.groupBy("_w", "_w2").agg(
        F.sum("_k").alias("_c12r"),
        F.sum(F.when(F.col("_tgt"), F.col("_k")).otherwise(F.lit(0))).alias(
            "_c12t"
        ),
    )
    c1 = c12.groupBy("_w").agg(
        F.sum("_c12r").alias("_c1r"), F.sum("_c12t").alias("_c1t")
    )
    model = _lm_broadcastable(
        c12.join(c1, "_w").crossJoin(F.broadcast(veff)), vocab_k
    )
    scored = (
        types.join(model, ["_w", "_w2"])
        .withColumn(
            "_numr",
            F.when(
                (F.col("_c1r") + F.col("_veff")) > F.lit(cap),
                F.raise_error(
                    f"lm_target_affinity: (c1 + V_eff) << {scale_bits} "
                    "overflows int64 - lower scale_bits"
                ).cast("long"),
            ).otherwise(F.col("_c1r") + F.col("_veff")),
        )
        # c1_t <= c1_r by construction, so _numr's guard covers _numt
        .withColumn("_numt", F.col("_c1t") + F.col("_veff"))
    )
    if mode == "fixed":
        term = F.expr(
            f"_k * (((_numr * {scale}L) div (_c12r + 1L))"
            f" - ((_numt * {scale}L) div (_c12t + 1L)))"
        )
        per_doc = scored.groupBy(id_col, "_tgt").agg(
            _lm_sum_fp(term, "lm_target_affinity").alias("_sum_fp"),
            F.sum("_k").cast("long").alias("n_bigrams"),
        )
        affinity = F.col("_sum_fp").cast("double") / (
            F.col("n_bigrams") * F.lit(scale)
        ).cast("double")
    else:
        term = F.col("_k").cast("double") * (
            F.log(
                (F.col("_c12t") + F.lit(1)).cast("double")
                / F.col("_numt").cast("double")
            )
            - F.log(
                (F.col("_c12r") + F.lit(1)).cast("double")
                / F.col("_numr").cast("double")
            )
        )
        per_doc = scored.groupBy(id_col, "_tgt").agg(
            F.sum(term).alias("_sum_ln"),
            F.sum("_k").cast("long").alias("n_bigrams"),
        )
        affinity = F.exp(F.col("_sum_ln") / F.col("n_bigrams").cast("double"))

    full = per_doc.withColumn("target_affinity", affinity).withColumn(
        "is_target", F.col("_tgt")
    )
    return _lm_topk_docs(
        full,
        "target_affinity",
        id_col,
        limit,
        n_salts,
        [id_col, "is_target", "n_bigrams", "target_affinity"],
    )


# Above this vocab size the '<unk>' mapping in lm_bigram_counts (and
# therefore the streaming twin, which shares the expression) switches
# from the literal-array scan (O(|vocab|) comparisons per token, cheap
# at tiny-vocab sizes) to broadcast hash joins (O(1) probes per token;
# the right call for the tens-of-thousands vocabularies where the scan
# silently turns every token into 50k comparisons). Both shapes are
# parity-tested against each other and a pure-Python replay.
#
# 64, lowered from 1024 in round 15: the q203 decade adjudication
# measured the crossover directly (interleaved idle A/B of the score
# pass against a frozen model, BASELINE.md round-15) — at 31 tokens
# the two forms tie (2.69 vs 2.55 s medians, inside noise), at 310
# tokens the join form already wins 1.19x (3.97 vs 3.34 s), and the
# array form's per-token cost keeps growing linearly with the vocab
# while the hash probe stays O(1). 64 keeps genuinely tiny
# vocabularies on the simpler array plan and hands everything else to
# the join form BEFORE the linear term can dominate a score pass.
LM_VOCAB_JOIN_THRESHOLD = 64


def lm_bigram_counts(
    df: DataFrame,
    vocab: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Bigram-LM count table over a FROZEN vocabulary — the
    model-maintenance form of ngram_lm_score's training stage, for
    when the vocabulary is fixed upfront (frozen from a historical
    census: vocab_topk / ngram_lm_score's salted top-k at train time)
    rather than re-derived from the batch at hand.

    Because the vocab is a constant, the whole thing is ONE narrow
    array-side projection (tokenize -> '<unk>' mapping -> adjacent
    pairs via zip_with of two slices) plus one count groupBy with
    map-side combine: no window, no join, no second corpus pass.
    That shape is exactly what makes the same expression legal on an
    UNBOUNDED stream (stream.lm_counts_stream): window lag is not
    available there, array-side pairs are. Output/state is
    <= (len(vocab)+1)^2 rows BY CONSTRUCTION — the capped-vocab bound
    that keeps the batch model broadcastable is the same bound that
    keeps streaming state finite.

    Output: (w, w2, cnt). The context table is one more groupBy
    (sum cnt by w), and scoring new docs against the maintained model
    is ngram_lm_score's (w, w2) broadcast-join shape.

    Trade on the '<unk>' mapping (auto-switched, VERDICT r9 #3):
    array_contains against the literal vocab is an O(|vocab|) scan per
    token — at default-sized caps that's measured cheaper than any
    join/reassembly detour (profiled at sf0.1: the mapping+counts job
    is ~1 s, dwarfed by the census) — but it scales linearly in the
    vocab, so above LM_VOCAB_JOIN_THRESHOLD tokens the mapping flips
    to broadcast hash joins: RAW-token bigram pairs are assembled
    array-side first (the mapping commutes with pair assembly), then
    each side of the exploded pair left-joins the broadcast vocab —
    O(1) hash probes per token at any vocab size. The join form is
    deliberately placed AFTER pair assembly so it stays legal on an
    unbounded stream (stream-static joins are allowed pre-aggregation;
    a posexplode + window reassembly is not) and state stays
    <= (V+1)^2 — mapping BEFORE the stateful count is what bounds it.
    `vocab` is deduplicated defensively at entry (order-preserving):
    the census guarantees distinctness, but a duplicated token handed
    to the join path would silently MULTIPLY bigram rows (the array
    path is immune), so both paths share one contract here."""
    vocab = list(dict.fromkeys(vocab))
    toks = tokens(text_col)
    n = F.size(toks)
    if len(vocab) <= LM_VOCAB_JOIN_THRESHOLD:
        vlit = F.array(*[F.lit(t) for t in vocab])
        mapped = F.transform(
            toks,
            lambda x: F.when(F.array_contains(vlit, x), x).otherwise(
                F.lit("<unk>")
            ),
        )
        pairs = F.when(
            n >= 2,
            F.zip_with(
                F.slice(mapped, 1, n - 1),
                F.slice(mapped, 2, n - 1),
                lambda a, b: F.struct(a.alias("w"), b.alias("w2")),
            ),
        ).otherwise(F.array().cast("array<struct<w:string,w2:string>>"))
        return (
            df.select(F.explode(pairs).alias("_p"))
            .select(F.col("_p.w").alias("w"), F.col("_p.w2").alias("w2"))
            .groupBy("w", "w2")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
    raw = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.struct(a.alias("rw"), b.alias("rw2")),
        ),
    ).otherwise(F.array().cast("array<struct<rw:string,rw2:string>>"))
    vdf = df.sparkSession.createDataFrame(
        [(t,) for t in vocab], "tok string"
    )
    m1 = F.broadcast(vdf.select(F.col("tok").alias("_rw"), F.lit(1).alias("_v1")))
    m2 = F.broadcast(vdf.select(F.col("tok").alias("_rw2"), F.lit(1).alias("_v2")))
    return (
        df.select(F.explode(raw).alias("_p"))
        .select(F.col("_p.rw").alias("_rw"), F.col("_p.rw2").alias("_rw2"))
        .join(m1, "_rw", "left")
        .join(m2, "_rw2", "left")
        .select(
            F.when(F.col("_v1") == 1, F.col("_rw"))
            .otherwise(F.lit("<unk>"))
            .alias("w"),
            F.when(F.col("_v2") == 1, F.col("_rw2"))
            .otherwise(F.lit("<unk>"))
            .alias("w2"),
        )
        .groupBy("w", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def lm_score_against_model(
    df: DataFrame,
    counts: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "ln",
    scale_bits: int = 20,
    limit: int = 20,
    n_salts: int = 32,
) -> DataFrame:
    """Score documents against an EXTERNAL bigram-LM model — the
    read-time finisher for lm_bigram_counts / a drained
    stream.lm_counts_stream table, and the train-on-A-score-B form of
    ngram_lm_score: held-out perplexity of NEW data under an OLD
    model is the classic quality-drift monitor (a feed whose docs
    suddenly surprise last month's model changed distribution).

    `counts` is the (w, w2, cnt) table; `vocab` is the SAME frozen
    list the model was built with (the '<unk>' mapping must match or
    the scores are about a different feature space). Unlike
    ngram_lm_score, bigrams the model has never seen are expected
    here — the scoring join is LEFT with zero-filled counts, and
    add-one smoothing keeps every probability finite. V_eff is
    len(vocab)+1, a plan-time constant (no one-row crossJoin needed).

    Same mode contract as ngram_lm_score: 'ln' = perplexity
    (production), 'fixed' = exact int64 reciprocal-likelihood mean
    (bit-replayable); same overflow guard, folded into the used
    column. Scale shape: one narrow array-side projection per doc (no
    window — the lm_bigram_counts pair expression), one groupBy to
    per-doc bigram types, one join against the bounded model, salted
    two-phase top-k. Output: (id, n_tokens, n_unk, n_bigrams,
    lm_surprisal), most surprising first.

    EAGER at composition time (round 16): `counts` is materialized
    with one localCheckpoint when the plan is BUILT, so a lazy counts
    pipeline executes once here instead of once per consumer (context
    table + model projection) — the same build-time contract as
    ngram_lm_score / lm_target_affinity."""
    if mode not in ("ln", "fixed"):
        raise ValueError(f"lm_score_against_model: unknown mode {mode!r}")
    scale = 1 << scale_bits
    cap = ((1 << 63) - 1) >> scale_bits
    veff = len(vocab) + 1

    toks = tokens(text_col)
    if len(vocab) <= LM_VOCAB_JOIN_THRESHOLD:
        vlit = F.array(*[F.lit(t) for t in vocab])
        mapped = F.transform(
            toks,
            lambda x: F.when(F.array_contains(vlit, x), x).otherwise(
                F.lit("<unk>")
            ),
        )
        # filter on the RAW token count: transform() preserves array
        # length, so size(mapped) == size(tokens), and filtering on
        # size(_m) made the Filter node evaluate the full O(|vocab|)
        # per-token mapping a second time just to measure it (round-16
        # plan audit: array_contains appeared in both Filter and
        # Project)
        base = df.where(F.size(toks) >= 2).select(
            F.col(id_col), mapped.alias("_m")
        )
        n = F.size("_m")
        pairs = F.zip_with(
            F.slice(F.col("_m"), 1, n - 1),
            F.slice(F.col("_m"), 2, n - 1),
            lambda a, b: F.struct(a.alias("w"), b.alias("w2")),
        )
        # Fused stats+types (round 16, guide §2.4/VERDICT r15 #4): the
        # old shape ran a second full tokenize+vocab-map pass just for
        # (n_tokens, n_unk) and joined it back at the end. Both stats
        # are recoverable from the bigram types themselves, almost for
        # free: n_tokens = n_bigrams + 1 (every doc here has >= 2
        # tokens), and n_unk = (number of bigram LEFT elements that are
        # '<unk>' — positions 1..n-1 each appear exactly once as w) +
        # (1 if the LAST token is '<unk>'). Only the last-token bit
        # rides the explode (one boolean; a first fusion carried the
        # two longs through the shuffle and the wider aggregate state
        # measurably regressed the run). CollapseProject will not
        # inline the non-cheap `mapped` HOF into multiple consumers,
        # so `_m` still evaluates once per row.
        stats = None
        types = (
            base.select(
                F.col(id_col),
                (F.element_at(F.col("_m"), -1) == F.lit("<unk>")).alias("_lu"),
                F.explode(pairs).alias("_p"),
            )
            .select(
                F.col(id_col),
                "_lu",
                F.col("_p.w").alias("w"),
                F.col("_p.w2").alias("w2"),
            )
            .groupBy(id_col, "w", "w2")
            .agg(
                F.count(F.lit(1)).cast("long").alias("_k"),
                F.max("_lu").alias("_lu"),
            )
        )
    else:
        # large-vocab form (same auto-switch as lm_bigram_counts): the
        # literal-array scan is O(|vocab|) per token, so map via
        # broadcast hash joins instead. Fused stats (round 16, guide
        # §2.4 — the same fusion the small-vocab branch got, which was
        # blocked here only by the '<unk>' membership needing a join
        # instead of array_contains): the old shape ran a SECOND full
        # tokenize + explode + broadcast-join + groupBy corpus pass
        # just for (n_tokens, n_unk). Both stats are recoverable from
        # the bigram types: n_tokens = n_bigrams + 1 (every doc here
        # has >= 2 tokens), n_unk = '<unk>' bigram LEFT elements
        # (positions 1..n-1 appear exactly once as w) + a last-token
        # membership boolean, which costs ONE extra broadcast hash
        # join on the un-exploded doc rows (no shuffle) instead of a
        # corpus pass. At real vocabularies (> 64 tokens — i.e. every
        # production corpus; the gate fixtures stay under the
        # threshold) this removes one of the branch's two full scans.
        vdf = df.sparkSession.createDataFrame(
            [(t,) for t in vocab], "tok string"
        )
        base = df.select(F.col(id_col), toks.alias("_t")).where(
            F.size("_t") >= 2
        )
        stats = None
        mL = F.broadcast(
            vdf.select(F.col("tok").alias("_lt"), F.lit(1).alias("_vL"))
        )
        n = F.size("_t")
        raw = F.zip_with(
            F.slice(F.col("_t"), 1, n - 1),
            F.slice(F.col("_t"), 2, n - 1),
            lambda a, b: F.struct(a.alias("rw"), b.alias("rw2")),
        )
        m1 = F.broadcast(
            vdf.select(F.col("tok").alias("_rw"), F.lit(1).alias("_v1"))
        )
        m2 = F.broadcast(
            vdf.select(F.col("tok").alias("_rw2"), F.lit(1).alias("_v2"))
        )
        types = (
            base.withColumn("_lt", F.element_at(F.col("_t"), -1))
            .join(mL, "_lt", "left")
            .select(
                F.col(id_col),
                F.col("_vL").isNull().alias("_lu"),
                F.explode(raw).alias("_p"),
            )
            .select(
                F.col(id_col),
                "_lu",
                F.col("_p.rw").alias("_rw"),
                F.col("_p.rw2").alias("_rw2"),
            )
            .join(m1, "_rw", "left")
            .join(m2, "_rw2", "left")
            .select(
                F.col(id_col),
                "_lu",
                F.when(F.col("_v1") == 1, F.col("_rw"))
                .otherwise(F.lit("<unk>"))
                .alias("w"),
                F.when(F.col("_v2") == 1, F.col("_rw2"))
                .otherwise(F.lit("<unk>"))
                .alias("w2"),
            )
            .groupBy(id_col, "w", "w2")
            .agg(
                F.count(F.lit(1)).cast("long").alias("_k"),
                F.max("_lu").alias("_lu"),
            )
        )
    # the context aggregate re-aliases its input columns FIRST: c1 and
    # the model projection both descend from `counts`, and when that
    # is a streaming-sink-backed view (a drained lm_counts_stream
    # memory table) Spark cannot deduplicate the self-join's shared
    # attribute ids — the fresh Aliases break the reference sharing.
    #
    # Round 16 (guide §2.4/§5): counts is materialized ONCE with an
    # eager localCheckpoint before its two consumers (c1, model)
    # render it. When the caller passes a LAZY counts plan — q203
    # passes the full lm_bigram_counts train-side pipeline — both
    # consumers previously re-executed that tokenize+pairs+groupBy
    # corpus pass (its zip_with/transform lambdas defeat
    # ReusedExchange; plan-audited: two 'Scan parquet documents'
    # subtrees under model and c1). The checkpointed table is the
    # bounded model state itself (<= (len(vocab)+1)^2 rows, the same
    # bound that makes it broadcastable), computed once per call —
    # this makes plan COMPOSITION eager for the model side, same
    # documented contract as ngram_lm_score's _lm_base pin.
    counts = counts.localCheckpoint(eager=True)
    c1 = (
        counts.select(F.col("w").alias("w"), F.col("cnt").alias("cnt"))
        .groupBy("w")
        .agg(F.sum("cnt").alias("_c1"))
    )
    # c1 joins on w ALONE: a novel continuation (w, w2') of a seen
    # context w must still see c1(w) > 0 — riding _c1 on the (w, w2)
    # model row would zero-fill it for unseen bigrams and under-report
    # exactly the drift signal this monitor exists to catch (the
    # probability must be (c12+1)/(c1+V_eff), not 1/V_eff).
    model = counts.select("w", "w2", F.col("cnt").alias("_c12"))
    if (len(vocab) + 1) ** 2 <= 4_000_000:
        model = F.broadcast(model)
        c1 = F.broadcast(c1)
    scored = (
        types.join(model, ["w", "w2"], "left")
        .join(c1, "w", "left")
        .withColumn("_c12f", F.coalesce(F.col("_c12"), F.lit(0)))
        .withColumn(
            "_num",
            F.when(
                (F.coalesce(F.col("_c1"), F.lit(0)) + F.lit(veff)) > F.lit(cap),
                F.raise_error(
                    f"lm_score_against_model: (c1 + V_eff) << {scale_bits} "
                    "overflows int64 - lower scale_bits"
                ).cast("long"),
            ).otherwise(F.coalesce(F.col("_c1"), F.lit(0)) + F.lit(veff)),
        )
    )
    # fused form (stats is None): the per-doc stats are reconstructed
    # inside the final aggregate — n_tokens from the bigram count,
    # n_unk from the unk left-elements plus the carried last-token
    # flag — and the stats join disappears with the second corpus pass
    carry = (
        []
        if stats is not None
        else [
            (F.sum("_k") + F.lit(1)).cast("long").alias("n_tokens"),
            (
                F.sum(F.when(F.col("w") == "<unk>", F.col("_k")).otherwise(F.lit(0)))
                + F.max(F.col("_lu").cast("long"))
            )
            .cast("long")
            .alias("n_unk"),
        ]
    )
    if mode == "fixed":
        term = F.expr(f"_k * ((_num * {scale}L) div (_c12f + 1L))")
        per_doc = scored.groupBy(id_col).agg(
            _lm_sum_fp(term, "lm_score_against_model").alias("_sum_fp"),
            F.sum("_k").cast("long").alias("n_bigrams"),
            *carry,
        )
        surprisal = F.col("_sum_fp").cast("double") / (
            F.col("n_bigrams") * F.lit(scale)
        ).cast("double")
    else:
        term = F.col("_k").cast("double") * -F.log(
            (F.col("_c12f") + F.lit(1)).cast("double")
            / F.col("_num").cast("double")
        )
        per_doc = scored.groupBy(id_col).agg(
            F.sum(term).alias("_sum_ln"),
            F.sum("_k").cast("long").alias("n_bigrams"),
            *carry,
        )
        surprisal = F.exp(F.col("_sum_ln") / F.col("n_bigrams").cast("double"))

    full = (
        per_doc if stats is None else stats.join(per_doc, id_col)
    ).withColumn("lm_surprisal", surprisal)
    return _lm_topk_docs(
        full,
        "lm_surprisal",
        id_col,
        limit,
        n_salts,
        [id_col, "n_tokens", "n_unk", "n_bigrams", "lm_surprisal"],
    )


def filter_attrition(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The ATTRITION WATERFALL over corpus_filter_report's gates
    (X213): per rule, in pipeline order (lang -> quality ->
    repetition), how many docs fail it at all, how many fail ONLY it
    (the marginal cost of keeping the rule), how many are actually cut
    at its stage (fail it having passed every earlier gate — the
    number the pipeline's logs show), and how many docs survive after
    it. This is the table every corpus paper publishes (C4's table 1,
    Gopher appendix A, RefinedWeb fig. 2) and the first thing a
    curator reads when deciding which rule to tune: a rule with a big
    n_fail but a near-zero n_fail_only is redundant with its
    neighbors; a big n_cut at a late stage means the earlier gates are
    leaking.

    One codegen map over the scan (the per-doc flags, re-derived via
    corpus_filter_report) + ONE global aggregate -> 3 rows; the
    stack() unpivot runs on the single aggregate row. Counts are exact
    bigints — fully engine-replayable. Output: (stage, rule, n_fail,
    n_fail_only, n_cut, n_surviving), stage 1..3."""
    rep = corpus_filter_report(df, text_col)
    lng = F.col("is_en") == 1
    qua = F.col("q_keep") == 1
    repk = F.col("rep_keep") == 1

    def cnt(cond) -> F.Column:
        return F.sum(cond.cast("long"))

    agg = rep.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        cnt(~lng).alias("f1"),
        cnt(~lng & qua & repk).alias("o1"),
        cnt(~qua).alias("f2"),
        cnt(lng & ~qua & repk).alias("o2"),
        cnt(lng & ~qua).alias("c2"),
        cnt(~repk).alias("f3"),
        cnt(lng & qua & ~repk).alias("o3"),
    )
    return agg.select(
        F.expr(
            "stack(3,"
            " cast(1 as bigint), 'lang', f1, o1, f1, n - f1,"
            " cast(2 as bigint), 'quality', f2, o2, c2, n - f1 - c2,"
            " cast(3 as bigint), 'repetition', f3, o3, o3, n - f1 - c2 - o3"
            ") as (stage, rule, n_fail, n_fail_only, n_cut, n_surviving)"
        )
    )

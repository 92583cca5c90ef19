"""Text-analysis operators for training-data pipelines (SURVEY.md
§2.11): language ID (stopword heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), document fingerprinting.

All pure built-in Column expressions — at 100 TB these run inside
whole-stage codegen with zero Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mo_etl_spark.operators.dedup import normalize_text, tokens

#: tiny English function-word list for the language-ID heuristic
EN_STOPWORDS = (
    "the a an and or of to in is are was were be been for with on at by "
    "from that this it as not no"
).split()

#: BPE-ish pretokenizer: word pieces, digit runs, single punctuation
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def token_count(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(c))


def bpe_ish_tokens(c: Column) -> Column:
    """Regex pretokenization (GPT-2-style shape, simplified to a
    dialect-portable pattern)."""
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), 0)


def stopword_ratio(c: Column) -> Column:
    toks = tokens(c)
    stops = F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))
    return F.size(stops) / F.size(toks)


def lang_id(c: Column, threshold: float = 0.05) -> Column:
    """n-gram/function-word heuristic language ID: enough English
    function words -> 'en', else 'unk'.  (Real models plug in here as a
    pandas UDF; the heuristic keeps the hot path JVM-side.)"""
    return F.when(stopword_ratio(c) >= threshold, "en").otherwise("unk")


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + alpha ratio +
    mean word length band.  Deterministic double math (each term is a
    ratio of exact ints) -> oracle-stable after rounding."""
    n_chars = F.length(c)
    n_toks = token_count(c)
    alpha = F.length(F.regexp_replace(F.lower(c), r"[^a-z]", ""))
    alpha_ratio = alpha / n_chars
    mean_wlen = n_chars / n_toks
    len_band = F.when((n_chars >= 100) & (n_chars <= 1000), 1.0).otherwise(0.5)
    wlen_band = F.when((mean_wlen >= 3) & (mean_wlen <= 12), 1.0).otherwise(0.5)
    return F.round((len_band + wlen_band + alpha_ratio) / 3.0, 6)


def fingerprint(c: Column) -> Column:
    """Key-collision fingerprint: sorted distinct tokens joined + md5
    (the classic OpenRefine-style clustering key)."""
    key = F.array_join(F.array_sort(F.array_distinct(tokens(c))), " ")
    return F.md5(key)


def chunk_tokens(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 50,
    stride: int = 40,
):
    """Overlapping token-window chunking — the context-window prep step
    of a training-data pipeline: one output row per (doc, chunk), text
    = ``chunk_size`` whitespace tokens starting every ``stride``
    (chunk_size - stride tokens of overlap; the tail chunk may be
    short).  Pure sequence/slice/array_join — JVM-side, and the fan-out
    is a narrow transform (no shuffle): at 100 TB each input partition
    chunks independently."""
    from mo_etl_spark.operators.dedup import normalize_text

    words = F.split(normalize_text(F.col(text_col)), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(stride)).cast("int")
    return df.select(
        F.col(id_col),
        words.alias("_w"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).select(
        id_col,
        "chunk_idx",
        F.array_join(
            F.slice(F.col("_w"), F.col("chunk_idx") * stride + 1, chunk_size), " "
        ).alias("chunk_text"),
        F.least(
            F.size("_w") - F.col("chunk_idx") * stride, F.lit(chunk_size)
        ).alias("n_tokens"),
    )


def cdc_chunks(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    boundary_prefix: str = "0",
):
    """CONTENT-DEFINED chunking (the dedup-friendly chunker; the idea
    behind rsync/LBFS/restic boundaries, applied at token granularity):
    a chunk ends after any token whose ``md5(token)`` starts with
    ``boundary_prefix`` (one hex char -> boundary probability 1/16 ->
    ~16-token average chunks).

    vs fixed windows (chunk_tokens): boundaries depend ONLY on local
    content, so inserting or deleting a token re-chunks just the chunk
    it lands in — every other chunk keeps its exact text and hash,
    which is what makes chunk-hash dedup across crawl versions work
    (a fixed-stride chunker shifts every downstream window and zero
    hashes survive).  Emits (id, chunk_idx, chunk_text, chunk_hash,
    n_tokens).

    Plan shape: one posexplode fan-out, one per-doc window (partitioned
    by id — parallel, bounded by doc length), one (id, chunk) groupBy;
    everything JVM-side, the boundary rule is plain md5 so a SQL oracle
    replays it exactly.
    """
    from pyspark.sql import Window

    from mo_etl_spark.operators.dedup import tokens

    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    boundary = F.substring(F.md5("tok"), 1, len(boundary_prefix)) == boundary_prefix
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = toks.withColumn(
        "chunk_idx",
        F.coalesce(F.sum(boundary.cast("int")).over(w), F.lit(0)).cast("long"),
    )
    return (
        chunked.groupBy(id_col, "chunk_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("chunk_text"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .select(
            id_col,
            "chunk_idx",
            "chunk_text",
            F.md5("chunk_text").alias("chunk_hash"),
            "n_tokens",
        )
    )


def _token_ngrams(tok_col: str, n: int) -> Column:
    """Sliding token n-grams over an array column, as strings.
    Guarded: fewer than n tokens -> empty array (sequence(1,0) would
    otherwise count DOWN in Spark and fabricate a gram)."""
    expr = F.expr(
        f"transform(sequence(1, size({tok_col}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({tok_col}, i, {n})))"
    )
    return F.when(F.size(tok_col) >= n, expr).otherwise(F.array().cast("array<string>"))


def repetition_metrics(df, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition quality metrics (Rae et al. 2021,
    'Scaling Language Models' §A1.1 repetition filters — public paper):
    per document, the fraction of token 2-grams taken by the single
    most frequent 2-gram (`top2_frac`), the fraction of 2-grams that
    are repeats (`rep2_frac`), the top 3-gram fraction (`top3_frac`),
    and the distinct-token ratio — plus the keep/drop decision at the
    paper's 0.20 / 0.18 thresholds.

    Plan shape: explode n-grams -> groupBy (doc, gram) with map-side
    partial aggregation -> per-doc max/sum.  Shuffle volume is bounded
    by the corpus token count (each token starts at most one 2-gram and
    one 3-gram) — no quadratic blowup, no UDF; scales linearly to
    100 TB.  All fractions are ratios of exact ints, rounded to 6dp for
    cross-engine stability.
    """
    base = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t"))

    def gram_stats(n: int, prefix: str):
        g = base.select("id", F.explode(_token_ngrams("t", n)).alias("g"))
        c = g.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
        return c.groupBy("id").agg(
            F.max("c").alias(f"{prefix}_top"),
            F.sum("c").alias(f"{prefix}_tot"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(f"{prefix}_rep"),
        )

    sizes = base.select(
        "id",
        F.size("t").alias("n_tokens"),
        (F.size(F.array_distinct("t")) / F.size("t")).alias("_dr"),
    )
    out = (
        sizes.join(gram_stats(2, "g2"), "id", "left")
        .join(gram_stats(3, "g3"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.round("_dr", 6).alias("distinct_ratio"),
            F.round(F.col("g2_top") / F.col("g2_tot"), 6).alias("top2_frac"),
            F.round(F.col("g2_rep") / F.col("g2_tot"), 6).alias("rep2_frac"),
            F.round(F.col("g3_top") / F.col("g3_tot"), 6).alias("top3_frac"),
        )
    )
    keep = (F.coalesce(F.col("top2_frac"), F.lit(0.0)) <= 0.20) & (
        F.coalesce(F.col("top3_frac"), F.lit(0.0)) <= 0.18
    )
    return out.withColumn("keep", keep)


#: deterministic, engine-portable PII patterns (emails / NANP-ish phone)
PII_PATTERNS = (
    (r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_scrub(c: Column) -> Column:
    """Redact PII spans (scrub step of a corpus pipeline).  Plain
    regexp_replace chain — vectorized JVM regex, no UDF."""
    out = c
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def deterministic_sample(df, id_col: str = "doc_id", percent: int = 10, modulus: int = 97):
    """Stable corpus downsampling: keep rows whose Knuth-multiplicative
    id hash lands under ``percent`` of ``modulus``.  Pure arithmetic —
    reproducible across engines/runs/partitionings, pushes down to the
    scan as a data filter, and never shuffles; the standard way to cut
    a 100 TB corpus to an n% training slice.

    (a*b) mod m is computed as ((a mod m)*(b mod m)) mod m so the
    product never exceeds m² — id*2654435761 would overflow int64 for
    ids >= ~3.5e9 (raising under ANSI, silently wrapping otherwise)."""
    factor = 2654435761 % modulus
    bucket = F.pmod(F.pmod(F.col(id_col), F.lit(modulus)) * F.lit(factor), F.lit(modulus))
    return df.where(bucket < percent)


def stratified_sample(
    df,
    rates: dict[str, int],
    default_percent: int = 10,
    id_col: str = "doc_id",
    group_col: str = "source",
    modulus: int = 97,
):
    """Per-stratum deterministic sampling — the corpus-mixing step of a
    training pipeline ("keep 50% of wikipedia, 5% of commoncrawl"):
    each group keeps ``rates[group]`` percent (``default_percent``
    otherwise) of its rows, chosen by the same Knuth-multiplicative id
    hash as deterministic_sample, so slices are stable across runs AND
    nested (a group's 10% slice is a subset of its 20% slice).

    Pure integer arithmetic on (id, group): keep iff
    bucket * 100 < percent * modulus — exact cross-engine, no shuffle,
    and the whole predicate evaluates inside the scan stage at 100 TB.
    """
    factor = 2654435761 % modulus
    bucket = F.pmod(F.pmod(F.col(id_col), F.lit(modulus)) * F.lit(factor), F.lit(modulus))
    pct = F.lit(default_percent)
    for grp, p in sorted(rates.items()):
        pct = F.when(F.col(group_col) == grp, F.lit(p)).otherwise(pct)
    return df.where(bucket * 100 < pct * modulus)


def winnow_fingerprints(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
):
    """MOSS winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003) document
    fingerprints: hash every k-token shingle (rolling k-gram), slide a
    w-hash window over the gram sequence, keep the MIN hash of each
    window, emit the distinct selected hashes as the document's
    fingerprint set.  Guarantee: any shared token run of length
    >= k + w - 1 between two documents yields at least one shared
    fingerprint, while only ~2/(w+1) of all grams are stored.

    The gram hash is md5 of the space-joined shingle, and the window
    min is the lexicographic min of the 32-char hex strings — both
    exactly reproducible in portable SQL (same convention as
    dedup.minhash_md5_lsh_pairs), so the whole sketch is
    oracle-hash-checkable.

    Plan shape: the gram array is built ONCE per document by a linear
    higher-order transform, then posexploded and the sliding-window
    min taken by a window function partitioned by document.  (A pure
    nested-HOF formulation — array_min over slice inside a second
    transform — is quadratic in interpreted expression evaluation
    because the gram-array expression inlines into every window step;
    measured 90 s vs 2 s on the 600-doc t2 corpus.)  The only shuffle
    is the per-document window partition, which at 100 TB is uniform
    (one doc's grams ≈ its token count, no skew).

    Returns (id, fp) distinct rows; docs with < k + w - 1 tokens emit
    nothing (no full window exists).
    """
    from pyspark.sql import Window

    toks = F.split(normalize_text(F.col(text_col)), " ")
    n_grams = F.size(toks) - (k - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda p: F.md5(F.array_join(F.slice(toks, p, k), " ")),
    )
    # guard BEFORE building sequences: F.sequence(1, n) with n < 1
    # generates a DESCENDING sequence (not empty) — short docs must
    # short-circuit to NULL so explode drops them
    grams_col = F.when(n_grams >= w, grams)
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(grams_col).alias("pos", "h"),
    )
    win = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    n_win = Window.partitionBy("id")
    selected = exploded.select(
        "id",
        "pos",
        F.min("h").over(win).alias("fp"),
        F.count("*").over(n_win).alias("n_grams"),
    ).where(F.col("pos") <= F.col("n_grams") - w)  # pos is 0-based
    return selected.select("id", "fp").distinct()


def winnow_pairs(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    df_cap: int = 50,
    min_shared: int = 3,
):
    """Near-dup / plagiarism PAIRS from winnowed fingerprints: inverted
    index on fingerprint, document-frequency cap on hot fingerprints
    (boilerplate — MOSS's "ignore common code" rule, and the join-size
    bound at 100 TB: a fingerprint shared by d docs costs C(d,2)
    candidate pairs), self-join within fingerprint, keep pairs sharing
    >= min_shared fingerprints.  containment = shared / min(|fp_a|,
    |fp_b|) where sizes are measured AFTER the cap (both engines agree
    on the denominator).
    """
    from pyspark.sql import Window

    fps = winnow_fingerprints(df, text_col, id_col, k=k, w=w)
    # df-cap and per-doc sizes as window counts carried on the rows —
    # no extra joins, so the fingerprint subtree is evaluated once per
    # self-join side instead of four times
    fk = (
        fps.withColumn("fp_df", F.count("*").over(Window.partitionBy("fp")))
        .where(F.col("fp_df") <= df_cap)
        .withColumn("nfp", F.count("*").over(Window.partitionBy("id")))
        .select("id", "fp", "nfp")
    )
    left = fk.select(F.col("id").alias("id_a"), "fp", F.col("nfp").alias("nfp_a"))
    right = fk.select(F.col("id").alias("id_b"), "fp", F.col("nfp").alias("nfp_b"))
    pairs = (
        left.join(right, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("shared"),
            F.min("nfp_a").alias("nfp_a"),
            F.min("nfp_b").alias("nfp_b"),
        )
        .where(F.col("shared") >= min_shared)
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            "shared",
            F.round(
                F.col("shared").cast("double") / F.least("nfp_a", "nfp_b"), 6
            ).alias("containment"),
        )
    )


def winnow_oracle_sql(
    corpus_sql: str,
    k: int = 5,
    w: int = 4,
    df_cap: int = 50,
    min_shared: int = 3,
) -> str:
    """DuckDB twin of winnow_pairs over ``corpus_sql`` (SELECT yielding
    doc_id, text) — generated so k/w/caps stay in lockstep."""
    return f"""
    WITH corpus AS ({corpus_sql}),
    norm AS (
        SELECT doc_id AS id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
        FROM corpus
    ),
    grams AS (
        SELECT id,
               list_transform(generate_series(1, len(toks) - {k - 1}),
                   p -> md5(array_to_string(list_slice(toks, p, p + {k - 1}), ' '))) AS g
        FROM norm WHERE len(toks) - {k - 1} >= {w}
    ),
    fps AS (
        SELECT DISTINCT id, fp FROM (
            SELECT id,
                   unnest(list_transform(generate_series(1, len(g) - {w - 1}),
                       i -> list_min(list_slice(g, i, i + {w - 1})))) AS fp
            FROM grams
        )
    ),
    kept AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {df_cap}),
    fk AS (SELECT id, fp FROM fps JOIN kept USING (fp)),
    sizes AS (SELECT id, count(*) AS nfp FROM fk GROUP BY id),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
        FROM fk a JOIN fk b USING (fp)
        WHERE a.id < b.id
        GROUP BY 1, 2 HAVING count(*) >= {min_shared}
    )
    SELECT p.id_a, p.id_b, p.shared,
           round(CAST(p.shared AS DOUBLE) / least(sa.nfp, sb.nfp), 6) AS containment
    FROM pairs p
    JOIN sizes sa ON sa.id = p.id_a
    JOIN sizes sb ON sb.id = p.id_b
    """


def temperature_mix(
    df,
    budget: int = 1000,
    id_col: str = "doc_id",
    group_col: str = "source",
    modulus: int = 9973,
):
    """Temperature-weighted domain rebalancing (alpha = 0.5, the
    multilingual-corpus upsampling rule of mBERT/XLM-R: w_i ∝ n_i^0.5)
    plus the realized deterministic sample: per group, the doc count,
    its temperature weight, the per-mille keep rate that hits
    ``budget`` expected docs, and how many docs the Knuth-hash filter
    actually kept.

    Cross-engine exactness: sqrt is IEEE-exact; the weight is rounded
    to 6dp BEFORE the floor() that derives the integer rate, so both
    engines floor the same double; the keep decision itself is pure
    integer arithmetic (bucket * 1000 < rate_permille * modulus).
    One count shuffle + a 1-row total cross + one broadcast join back
    onto the scan — the filter runs scan-side at 100 TB.
    """
    src = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = src.agg(F.sum(F.sqrt("n_docs")).alias("z"))
    plan = src.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        F.round(F.sqrt("n_docs") / F.col("z"), 6).alias("weight"),
    )
    plan = plan.withColumn(
        "rate_permille",
        F.least(
            F.floor(F.col("weight") * budget * 1000 / F.col("n_docs")).cast("long"),
            F.lit(1000),
        ),
    )
    factor = 2654435761 % modulus
    bucket = F.pmod(F.pmod(F.col(id_col), F.lit(modulus)) * F.lit(factor), F.lit(modulus))
    kept = (
        df.join(F.broadcast(plan.select(group_col, "rate_permille")), group_col)
        .where(bucket * 1000 < F.col("rate_permille") * modulus)
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return plan.join(kept, group_col, "left").select(
        group_col,
        "n_docs",
        "weight",
        "rate_permille",
        F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
    )


def _bpe_rounds(words_freq, rounds: int):
    """Shared BPE train loop: returns ([per-round argmax DataFrames
    with (round, pair, n)], final sentinel-spaced symbol sequences)."""
    seq = words_freq.select(
        "freq",
        F.concat(F.lit(" "), F.regexp_replace("w", "(.)", "$1 ")).alias("s"),
    )
    merges = []
    for r in range(1, rounds + 1):
        toks = F.split(F.trim("s"), " ")
        # guard: a fully-merged word has 1 symbol and sequence(1, 0)
        # DESCENDS in Spark — emit no pairs for it instead
        pair_arr = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        best = (
            seq.select("freq", F.explode(pair_arr).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), "pair")
            .limit(1)
            .select(F.col("pair").alias("bp"), F.col("n").alias("bn"))
            # eager 1-row checkpoint: each round's argmax otherwise
            # re-derives the WHOLE previous chain in every consumer's
            # lazy plan (merges, vocab, per-doc encode) — plan depth
            # grows combinatorially with rounds; measured 19 s -> ~5 s
            # cold for the 3-round family at sf0.1.  Values unchanged
            # (the checkpoint is of a computed 1-row result).
            .localCheckpoint(eager=True)
        )
        merges.append(
            best.select(
                F.lit(r).cast("long").alias("round"),
                F.col("bp").alias("pair"),
                F.col("bn").alias("n"),
            )
        )
        search = F.concat(F.lit(" "), F.col("bp"), F.lit(" "))
        repl = F.concat(F.lit(" "), F.replace(F.col("bp"), F.lit(" "), F.lit("")), F.lit(" "))
        # LEFT join on TRUE, not crossJoin: when the corpus is already
        # fully merged the argmax is EMPTY, and a cross join would
        # collapse seq to zero rows — later rounds and bpe_vocab would
        # silently emit nothing instead of the fixpoint corpus (ADVICE
        # r2).  With the left join an empty `best` leaves bp NULL and
        # the rewrite becomes the identity.
        seq = seq.join(F.broadcast(best), F.lit(True), "left").select(
            "freq",
            F.when(F.col("bp").isNull(), F.col("s"))
            .otherwise(F.replace(F.replace(F.col("s"), search, repl), search, repl))
            .alias("s"),
        )
    return merges, seq


def bpe_merge_rounds(words_freq, rounds: int = 3) -> "DataFrame":  # noqa: F821
    """BPE tokenizer training (Sennrich et al. 2016), ``rounds``
    count->argmax->merge iterations over a (word, freq) table.
    Returns one row per round: (round, pair, n) — the merged symbol
    pair "a b" and its frequency-weighted corpus count.

    Symbol sequences ride as sentinel-spaced strings (" a b c "), so a
    merge is a plain string ``replace(" a b ", " ab ")`` applied twice:
    replace() scans left-to-right without re-scanning its own output,
    and a second pass catches exactly the occurrences whose leading
    space the previous match consumed — two passes provably reach the
    greedy non-overlapping fixpoint (remaining misses would need two
    adjacent unmerged occurrences sharing a boundary, impossible after
    pass one).  Both engines share this construction, so results are
    equal by construction, and everything stays in whole-stage codegen
    (no UDF, no regex).

    Each round is one map-side-combinable pair count plus a 1-row
    argmax broadcast-crossed back into the sequence rewrite — the
    round's only shuffle is the count.  The chained lazy plan re-derives
    round r-1's sequences once per consumer; a production trainer at
    corpus scale would persist() each round's seq (noted, deliberate:
    the contract query keeps the plan pure for the oracle twin).
    """
    from functools import reduce

    from pyspark.sql import DataFrame

    merges, _ = _bpe_rounds(words_freq, rounds)
    return reduce(DataFrame.unionByName, merges)


def bpe_encode_docs(
    docs,
    rounds: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":  # noqa: F821
    """TOKENIZER APPLICATION at corpus scale: encode every document
    with the merges :func:`bpe_merge_rounds` trains on the same corpus
    — the missing half of the BPE story (train ... then TOKENIZE the
    100 TB with it).  Returns (doc_id, n_words, n_bpe_symbols): the
    post-merge symbol count is the sequence length a packing/budgeting
    stage consumes.

    Plan shape: the ``rounds`` trained argmax rows (1-row tables)
    BROADCAST into a per-word sentinel-spaced rewrite — the identical
    two-pass ``replace`` fixpoint construction as training, so
    encoding is pure map-side string work in whole-stage codegen (no
    UDF, no regex, no shuffle beyond the final per-doc count agg).
    At 100 TB: training is the once-per-tokenizer cost; this encode is
    one narrow pass over the corpus plus one doc-keyed count — the
    embarrassing-parallel shape tokenization should have."""
    from pyspark.sql import functions as F

    words_freq = (
        docs.select(
            F.explode(
                F.split(normalize_text(F.col(text_col)), " ")
            ).alias("w")
        )
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    merges, _ = _bpe_rounds(words_freq, rounds)
    seq = (
        docs.select(
            F.col(id_col),
            F.explode(
                F.split(normalize_text(F.col(text_col)), " ")
            ).alias("w"),
        )
        .where(F.length("w") >= 1)
        .select(
            id_col,
            F.concat(F.lit(" "), F.regexp_replace("w", "(.)", "$1 ")).alias("s"),
        )
    )
    for best in merges:
        b = best.select(F.col("pair").alias("bp"))
        search = F.concat(F.lit(" "), F.col("bp"), F.lit(" "))
        repl = F.concat(
            F.lit(" "), F.replace(F.col("bp"), F.lit(" "), F.lit("")), F.lit(" ")
        )
        # LEFT join on TRUE (same empty-argmax guard as training)
        seq = seq.join(F.broadcast(b), F.lit(True), "left").select(
            id_col,
            F.when(F.col("bp").isNull(), F.col("s"))
            .otherwise(F.replace(F.replace(F.col("s"), search, repl), search, repl))
            .alias("s"),
        )
    return seq.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size(F.split(F.trim("s"), " "))).alias("n_bpe_symbols"),
    )


def bpe_vocab(words_freq, rounds: int = 3, top: int = 20) -> "DataFrame":  # noqa: F821
    """Apply :func:`bpe_merge_rounds`'s trained merges to the corpus
    and return the resulting symbol vocabulary — the tokenizer side of
    the trainer: (sym, n) for the ``top`` most frequent symbols after
    ``rounds`` merges, ties broken lexicographically."""
    _, seq = _bpe_rounds(words_freq, rounds)
    return (
        seq.select("freq", F.explode(F.split(F.trim("s"), " ")).alias("sym"))
        .groupBy("sym")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), "sym")
        .limit(top)
    )

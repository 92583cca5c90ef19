"""M5 scalar function library coverage (SURVEY.md §2.8): the jx
expression surface (u, jx_base/expressions/* — one small module per
op) exercised through driver-contract queries, grouped by family.
Everything stays in built-in Column functions (WholeStageCodegen)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mo_etl_spark.registry import query
from mo_etl_spark.session import prepare
from mo_etl_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare(spark)
    return load_table(spark, sf_dir, name)


@query(
    "scalar_string_family",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS u,
           lower(p_brand) AS l,
           length(p_name) AS n_chars,
           substr(p_name, 1, 5) AS first5,
           substr(p_name, greatest(length(p_name) - 2, 1), 3) AS last3,
           concat(p_brand, '|', p_type) AS brand_type,
           CASE WHEN strpos(p_name, 'a') > 0 THEN strpos(p_name, 'a') - 1 ELSE NULL END AS find_a,
           starts_with(p_type, 'STANDARD') AS is_std,
           p_type LIKE '%BRUSHED%' AS is_brushed,
           trim(p_name) AS trimmed,
           len(string_split(p_name, ' ')) AS n_words
    FROM part
    """,
    tags=("scalar", "string"),
)
def scalar_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String ops: length/left/right/concat/find/prefix/contains/trim/
    split (u, jx StringOps; find returns 0-based index or Null)."""
    part = _t(spark, sf_dir, "part")
    name = F.col("p_name")
    return part.select(
        "p_partkey",
        F.upper(name).alias("u"),
        F.lower("p_brand").alias("l"),
        F.length(name).alias("n_chars"),
        name.substr(1, 5).alias("first5"),
        name.substr(F.greatest(F.length(name) - 2, F.lit(1)), F.lit(3)).alias("last3"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.when(F.instr(name, "a") > 0, F.instr(name, "a") - 1).alias("find_a"),
        F.col("p_type").startswith("STANDARD").alias("is_std"),
        F.col("p_type").contains("BRUSHED").alias("is_brushed"),
        F.trim(name).alias("trimmed"),
        F.size(F.split(name, " ")).alias("n_words"),
    )


@query(
    "scalar_math_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25) AS abs_dev,
           CAST(sign(l_quantity - 25) AS DOUBLE) AS sgn,
           round(sqrt(l_quantity), 6) AS sqrt_qty,
           round(exp(l_discount), 6) AS exp_disc,
           round(ln(l_quantity), 6) AS ln_qty,
           round(log10(l_quantity), 6) AS log10_qty,
           l_quantity ** 2 AS qty_sq,
           CAST(l_quantity AS BIGINT) % 7 AS mod7,
           ((CAST(l_quantity AS BIGINT) % 7) + 7) % 7 AS pmod7,
           floor(l_quantity / 10) * 10 AS floor10,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil7,
           (CAST(round(l_extendedprice*100) AS BIGINT) * 10) // CAST(l_quantity AS BIGINT) AS unit_price_mc
    FROM lineitem
    WHERE l_orderkey <= 2000
    """,
    tags=("scalar", "math"),
)
def scalar_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math ops (u, mo_math): abs/sign/sqrt/exp/log/pow/mod/floor-to-
    multiple/ceil, div-by-zero -> Null.  Transcendentals rounded to 6
    digits (libm vs JVM last-ulp).  l_quantity is integral -> qty_sq,
    mod, floor exact."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 2000)
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25).alias("abs_dev"),
        # duckdb sign() yields integer; align as double on the SQL side
        F.signum(q - 25).alias("sgn"),
        F.round(F.sqrt(q), 6).alias("sqrt_qty"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.log(q), 6).alias("ln_qty"),
        F.round(F.log10(q), 6).alias("log10_qty"),
        F.pow(q, 2).alias("qty_sq"),
        (q.cast("long") % 7).alias("mod7"),
        F.pmod(q.cast("long"), 7).alias("pmod7"),
        (F.floor(q / 10) * 10).cast("double").alias("floor10"),
        F.ceil(q / 7).alias("ceil7"),
        # unit price in exact integer milli-cents: round(x, 2) of a
        # division is NOT cross-engine stable at true decimal ties
        F.expr(
            "(cast(round(l_extendedprice*100) as bigint) * 10)"
            " div cast(l_quantity as bigint)"
        ).alias("unit_price_mc"),
    )


@query(
    "scalar_date_family",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           quarter(o_orderdate) AS q,
           isodow(o_orderdate) AS iso_dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
           o_orderdate + INTERVAL 1 MONTH AS next_month,
           o_orderdate + INTERVAL 7 DAY AS next_week,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_s,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders WHERE o_orderkey <= 2000
    """,
    tags=("scalar", "date"),
)
def scalar_date_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time ops (u, mo_times): extract parts, truncation (jx floor
    on a time domain), calendar month add (month-aware Duration),
    absolute-interval add, diff, unix seconds, formatting.
    o_orderdate is ms-precision -> all outputs µs-safe."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.quarter(d).alias("q"),
        (F.weekday(d) + 1).alias("iso_dow"),  # Spark weekday Mon=0; ISO Mon=1
        F.date_trunc("month", d).alias("month_start"),
        F.date_trunc("week", d).alias("week_start"),
        F.add_months(d, 1).cast("timestamp").alias("next_month"),
        (d + F.expr("INTERVAL 7 DAYS")).alias("next_week"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).cast("long").alias(
            "days_since_95"
        ),
        F.unix_timestamp(d).alias("unix_s"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@query(
    "scalar_null_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_flag,
           CASE WHEN l_tax > 0.05 THEN 'high' WHEN l_tax > 0.02 THEN 'mid' ELSE 'low' END AS tax_band,
           least(l_discount, l_tax) AS lo,
           greatest(l_discount, l_tax) AS hi,
           (nullif(l_discount, 0.0) IS NULL) AS no_disc,
           (l_discount IS NOT DISTINCT FROM l_tax) AS disc_eq_tax
    FROM lineitem WHERE l_orderkey <= 2000
    """,
    tags=("scalar", "null"),
)
def scalar_null_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling family: coalesce/nullif/case/least/greatest/
    missing/null-safe-eq (u, jx CoalesceOp WhenOp MissingOp EqOp —
    IS NOT DISTINCT FROM is the oracle twin of jx eq)."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 2000)
    disc, tax = F.col("l_discount"), F.col("l_tax")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif(disc, F.lit(0.0)), F.lit(-1.0)).alias("disc_or_flag"),
        F.when(tax > 0.05, "high").when(tax > 0.02, "mid").otherwise("low").alias("tax_band"),
        F.least(disc, tax).alias("lo"),
        F.greatest(disc, tax).alias("hi"),
        F.nullif(disc, F.lit(0.0)).isNull().alias("no_disc"),
        disc.eqNullSafe(tax).alias("disc_eq_tax"),
    )


@query(
    "scalar_array_family",
    oracle="""
    SELECT p_partkey,
           coalesce(array_to_string(string_split(p_name, ' '), '|'), '') AS words,
           len(string_split(p_name, ' ')) AS n_words,
           coalesce(array_to_string(list_sort(string_split(p_name, ' ')), '|'), '') AS sorted_words,
           coalesce(array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), '|'), '') AS uniq_words,
           list_contains(string_split(p_name, ' '), 'green') AS has_green,
           coalesce(array_to_string(list_sort(list_transform(string_split(p_name, ' '), w -> upper(w))), '|'), '') AS upper_words,
           coalesce(array_to_string(list_sort(list_filter(string_split(p_name, ' '), w -> length(w) > 5)), '|'), '') AS long_words,
           string_split(p_name, ' ')[1] AS first_word,
           list_sum(list_transform(string_split(p_name, ' '), w -> length(w))) AS total_chars
    FROM part
    """,
    tags=("scalar", "array"),
)
def scalar_array_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family (u, mo_dots FlatList implicit mapping + jx):
    split/size/sort/distinct/contains/transform/filter/element_at/
    aggregate — all higher-order built-ins, no UDF.  Array outputs are
    array_join-serialized: the driver's pandas canonicalizer cannot
    sort ndarray cells."""
    part = _t(spark, sf_dir, "part")
    words = F.split("p_name", " ")

    def j(col):
        return F.array_join(col, "|")

    return part.select(
        "p_partkey",
        j(words).alias("words"),
        F.size(words).alias("n_words"),
        j(F.array_sort(words)).alias("sorted_words"),
        j(F.array_sort(F.array_distinct(words))).alias("uniq_words"),
        F.array_contains(words, "green").alias("has_green"),
        j(F.array_sort(F.transform(words, lambda w: F.upper(w)))).alias("upper_words"),
        j(F.array_sort(F.filter(words, lambda w: F.length(w) > 5))).alias("long_words"),
        F.element_at(words, 1).alias("first_word"),
        F.aggregate(
            words, F.lit(0), lambda acc, w: acc + F.length(w)
        ).alias("total_chars"),
    )


@query(
    "scalar_json_family",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           json_valid(props) AS is_valid
    FROM events WHERE event_id <= 3000
    """,
    tags=("scalar", "json"),
)
def scalar_json_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (u, mo_json): path extraction, typed cast, validity.
    get_json_object / from_json stay JVM-side."""
    events = _t(spark, sf_dir, "events").where(F.col("event_id") <= 3000)
    k = F.get_json_object("props", "$.k")
    parsed = F.from_json("props", "k BIGINT")
    return events.select(
        "event_id",
        k.alias("k_str"),
        k.cast("long").alias("k_int"),
        (k.cast("long") % 10).alias("k_mod"),
        parsed.isNotNull().alias("is_valid"),
    )


@query(
    "scalar_template_expand",
    oracle="""
    SELECT o_orderkey,
           'order ' || coalesce(CAST(o_orderkey AS VARCHAR), '')
             || ' [' || coalesce(o_orderstatus, '')
             || '] by customer ' || coalesce(CAST(o_custkey AS VARCHAR), '') AS msg
    FROM orders WHERE o_orderkey <= 2000
    """,
    tags=("scalar", "template"),
)
def scalar_template_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mo-logs {{var}} templating (u, mo_logs expand_template) as a jx
    expression: holes compile to string-cast columns, missing renders
    empty — one concat, fully JVM-side."""
    from mo_etl_spark.jx.expressions import jx_expr

    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    tmpl = {"template": "order {{o_orderkey}} [{{o_orderstatus}}] by customer {{o_custkey}}"}
    return orders.select("o_orderkey", jx_expr(tmpl, orders).alias("msg"))


@query(
    "scalar_month_arithmetic_clamping",
    oracle="""
    SELECT m,
           CAST(last_day(make_date(2024, m, 1)) AS TIMESTAMP) AS month_end,
           CAST(last_day(make_date(2024, m, 1)) + INTERVAL 1 MONTH AS TIMESTAMP) AS plus_1m,
           CAST(last_day(make_date(2024, m, 1)) + INTERVAL 13 MONTH AS TIMESTAMP) AS plus_13m,
           CAST(last_day(make_date(2024, m, 1)) - INTERVAL 1 MONTH AS TIMESTAMP) AS minus_1m
    FROM (SELECT unnest(generate_series(1, 12)) AS m)
    """,
    tags=("scalar", "date", "month_arithmetic"),
)
def scalar_month_arithmetic_clamping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-aware Duration arithmetic at the clamping edges (u,
    mo_times calendar Durations; SURVEY §7.3 flagged add_months vs
    INTERVAL MONTH parity as must-verify): every 2024 month-end
    (incl. leap Feb 29) shifted ±1 and +13 months.  Spark add_months
    and DuckDB INTERVAL both clamp to the target month's last valid
    day — this query pins that agreement."""
    prepare(spark)
    base = F.last_day(F.make_date(F.lit(2024), F.col("m"), F.lit(1)))
    return (
        spark.range(1, 13)
        .select(F.col("id").cast("int").alias("m"))
        .select(
            "m",
            base.cast("timestamp").alias("month_end"),
            F.add_months(base, 1).cast("timestamp").alias("plus_1m"),
            F.add_months(base, 13).cast("timestamp").alias("plus_13m"),
            F.add_months(base, -1).cast("timestamp").alias("minus_1m"),
        )
    )


@query(
    "scalar_variant_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k2,
           props IS NOT NULL AS has_props
    FROM events WHERE event_id <= 4000
    """,
    tags=("scalar", "json", "variant"),
)
def scalar_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 VariantType for dynamic JSON (the modern engine-native
    answer to mo-json's dynamic documents): props parses ONCE into a
    binary variant, then typed extractions are cheap — at scale this
    beats per-path get_json_object re-parsing, and the variant column
    is storable/shreddable.  Oracle = plain JSON extraction."""
    events = _t(spark, sf_dir, "events").where(F.col("event_id") <= 4000)
    v = F.parse_json("props")
    return events.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
        (F.try_variant_get(v, "$.k", "bigint") * 2).alias("k2"),
        v.isNotNull().alias("has_props"),
    )


@query(
    "scalar_fuzzy_string_family",
    oracle="""
    SELECT doc_id,
           levenshtein(source, 'src10') AS src_dist,
           split_part(text, ' ', 2) AS second_word,
           len(regexp_extract_all(text, '[0-9]+')) AS n_number_runs,
           CAST(round(
             1.0 - CAST(levenshtein(source, 'src10') AS DOUBLE)
                   / greatest(length(source), 5), 6) AS DOUBLE) AS src_sim
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("scalar", "string", "fuzzy", "levenshtein"),
)
def scalar_fuzzy_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy/string-mining scalars (engine addition over the jx string
    family — near-dup keys and record linkage need them): levenshtein
    edit distance (integer -> cross-engine exact), a normalized
    similarity ratio derived from it (identical double formula both
    sides), split_part field extraction, and regexp_extract_all run
    counting.  All JVM-side codegen expressions — no UDF."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    dist = F.levenshtein("source", F.lit("src10"))
    return docs.select(
        "doc_id",
        dist.alias("src_dist"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), F.lit(0))).alias(
            "n_number_runs"
        ),
        F.round(
            F.lit(1.0)
            - dist.cast("double") / F.greatest(F.length("source"), F.lit(5)),
            6,
        ).cast("double").alias("src_sim"),
    )


@query(
    "scalar_map_literal_enrich",
    oracle="""
    SELECT CASE o_orderpriority
             WHEN '1-URGENT' THEN 'P1' WHEN '2-HIGH' THEN 'P2'
             WHEN '3-MEDIUM' THEN 'P3' WHEN '4-NOT SPECIFIED' THEN 'P4'
             WHEN '5-LOW' THEN 'P5' ELSE 'P?' END AS prio_code,
           count(*) AS n
    FROM orders
    GROUP BY 1
    """,
    tags=("scalar", "map_literal", "broadcast_free_enrich"),
)
def scalar_map_literal_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-as-literal-map enrichment: tiny closed enums (priority
    codes here) belong in the PLAN as a literal map lookup — zero join,
    zero broadcast, pure codegen — instead of even a broadcast join
    (the jx 'set domain' decode shape (u)).  `F.create_map` of literals
    + `element_at` with a coalesced default; the oracle is the CASE
    ladder Catalyst effectively folds this into."""
    orders = _t(spark, sf_dir, "orders")
    mapping = {
        "1-URGENT": "P1",
        "2-HIGH": "P2",
        "3-MEDIUM": "P3",
        "4-NOT SPECIFIED": "P4",
        "5-LOW": "P5",
    }
    codes = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    code = F.coalesce(F.element_at(codes, F.col("o_orderpriority")), F.lit("P?"))
    return orders.groupBy(code.alias("prio_code")).agg(F.count(F.lit(1)).alias("n"))


@query(
    "scalar_array_setops_family",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_distinct(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS t
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           coalesce(array_to_string(
             list_sort(list_filter(t, x -> list_contains(['the','a','of','and','to'], x))),
             '|'), '') AS stop_hits,
           len(list_filter(t, x -> NOT list_contains(['the','a','of','and','to'], x)))
             AS n_content,
           len(list_distinct(list_concat(t, ['the','a','of','and','to'])))
             AS n_union,
           len(list_filter(t, x -> list_contains(['the','a','of','and','to'], x))) > 0
             AS has_stopword
    FROM toks
    """,
    tags=("scalar", "array", "array_setops"),
)
def scalar_array_setops_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array SET operations (mo-dots multi-value column algebra (u);
    jx 'union' over per-doc value sets): intersect / except / union /
    overlap between each document's distinct-token array and a literal
    stopword set — all JVM higher-order/array built-ins, no explode, no
    shuffle.  Results normalized with array_sort for cross-engine
    determinism (Spark's set functions already dedup; the oracle
    emulates them with list_filter/list_contains)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    stop = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to")])
    toks = F.array_distinct(
        F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
    )
    t = docs.select("doc_id", toks.alias("t"))
    return t.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_intersect("t", stop)), "|").alias("stop_hits"),
        F.size(F.array_except("t", stop)).alias("n_content"),
        F.size(F.array_union("t", stop)).alias("n_union"),
        F.arrays_overlap("t", stop).alias("has_stopword"),
    )


@query(
    "scalar_map_family",
    oracle="""
    SELECT p_partkey,
           CAST(p_size AS VARCHAR) AS size_v,
           p_brand AS brand_v,
           2 AS n_keys,
           'brand,size' AS keys_sorted
    FROM part
    WHERE p_partkey < 200
    """,
    tags=("scalar", "map", "str_to_map"),
)
def scalar_map_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (jx object/get over dynamic keys (u, mo_dots
    `get`)): a config string built from part columns round-trips
    through ``str_to_map`` and dynamic ``element_at`` lookups; map_keys
    (sorted) and size prove structural access.  The oracle states the
    EXPECTED values straight from the source columns, so a hash match
    proves parse + lookup are lossless — all JVM map expressions, no
    UDF, no shuffle."""
    part = _t(spark, sf_dir, "part").where(F.col("p_partkey") < 200)
    cfg = F.concat(
        F.lit("size="), F.col("p_size").cast("string"), F.lit(";brand="), F.col("p_brand")
    )
    m = F.expr("str_to_map(cfg, ';', '=')")
    return part.select("p_partkey", cfg.alias("cfg")).select(
        "p_partkey",
        F.element_at(m, F.lit("size")).alias("size_v"),
        F.element_at(m, F.lit("brand")).alias("brand_v"),
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
    )


@query(
    "scalar_generator_family",
    oracle="""
    SELECT p.p_partkey, u.pos, u.val
    FROM (SELECT p_partkey, p_size % 4 AS n FROM part WHERE p_partkey < 500) p
    LEFT JOIN LATERAL (
      SELECT CAST(g.i - 1 AS INT) AS pos, CAST(g.i AS INT) AS val
      FROM (SELECT unnest(generate_series(1, p.n)) AS i) g
    ) u ON true
    """,
    tags=("scalar", "generator", "posexplode", "sequence", "deep_from"),
)
def scalar_generator_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/table-function family: sequence() -> posexplode_outer
    (jx's implicit array unnesting (u, mo_dots FlatList) as an explicit
    row generator).  The OUTER variant is the load-bearing semantics:
    an empty generated array (p_size % 4 == 0) keeps its parent row
    with NULL (pos, val) — jx nested queries never drop parents — which
    the oracle mirrors with LEFT JOIN LATERAL over generate_series.
    Generation is narrow (no shuffle); fan-out multiplies rows in place."""
    prepare(spark)
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_partkey") < 500)
        .select("p_partkey", (F.col("p_size") % 4).alias("n"))
    )
    seq = F.when(
        F.col("n") > 0, F.sequence(F.lit(1), F.col("n"), F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return p.select(
        "p_partkey", F.posexplode_outer(seq).alias("pos", "val")
    ).select("p_partkey", F.col("pos").cast("int").alias("pos"), "val")


@query(
    "scalar_try_family",
    oracle="""
    WITH base AS (
        SELECT p_partkey, p_brand, p_size, p_retailprice,
               p_size % 4 AS div4,
               CASE WHEN p_partkey % 3 = 0 THEN 'x'
                    ELSE CAST(p_size AS VARCHAR) END AS numish,
               CAST(p_partkey % 3 AS INT) AS idx,
               concat('2024-01-', lpad(CAST(p_size % 40 AS VARCHAR), 2, '0')) AS datish
    FROM part
    ),
    evaled AS (
        SELECT p_brand,
               CAST(p_retailprice AS DOUBLE) / nullif(div4, 0) AS d,
               try_cast(numish AS INTEGER) AS n,
               CASE WHEN idx = 1 THEN p_size END AS e,
               try_cast(datish AS TIMESTAMP) AS ts
        FROM base
    )
    SELECT p_brand,
           count(*) AS n_rows,
           count(d) AS n_div_ok,
           round(sum(d), 4) AS sum_div,
           count(n) AS n_num_ok,
           sum(n) AS sum_num,
           count(e) AS n_elem_ok,
           count(ts) AS n_ts_ok
    FROM evaled
    GROUP BY p_brand
    """,
    tags=("scalar", "try_functions", "null", "ansi_safety"),
)
def scalar_try_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The try_* error-free evaluation family (Spark 3.2+ ANSI-safe
    forms) — the modern engine-native spelling of jx's never-raise
    math (u, mo_math null-decisive ops; SURVEY.md §1.4 rule 4):
    try_divide (÷0 -> NULL even under ANSI), try_cast (bad parse ->
    NULL), try_element_at (index miss -> NULL), try_to_timestamp
    (bad date -> NULL).  Each probe column mixes valid and poisoned
    rows derived arithmetically from part, then per-brand counts
    summarize which survived — identical semantics in the oracle via
    nullif guards and DuckDB's own try_cast.  These forms stay
    codegen'd JVM expressions, so the null safety costs nothing at
    100 TB (vs a Python guard UDF which would cost the Arrow round
    trip)."""
    p = _t(spark, sf_dir, "part")
    base = p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        "p_retailprice",
        (F.col("p_size") % 4).alias("div4"),
        F.when(F.col("p_partkey") % 3 == 0, F.lit("x"))
        .otherwise(F.col("p_size").cast("string"))
        .alias("numish"),
        (F.col("p_partkey") % 3).cast("int").alias("idx"),
        F.concat(
            F.lit("2024-01-"),
            F.lpad((F.col("p_size") % 40).cast("string"), 2, "0"),
        ).alias("datish"),
    )
    evaled = base.select(
        "p_brand",
        F.try_divide(F.col("p_retailprice").cast("double"), F.col("div4")).alias("d"),
        F.expr("try_cast(numish AS INT)").alias("n"),
        # index 0 is invalid USAGE (raises even under try_); the miss
        # case try_element_at absorbs is out-of-bounds, so poison with 2
        F.try_element_at(
            F.array(F.col("p_size")),
            F.when(F.col("idx") == 0, F.lit(2)).otherwise(F.col("idx")),
        ).alias("e"),
        F.try_to_timestamp(F.col("datish")).alias("ts"),
    )
    return evaled.groupBy("p_brand").agg(
        F.count("*").alias("n_rows"),
        F.count("d").alias("n_div_ok"),
        F.round(F.sum("d"), 4).alias("sum_div"),
        F.count("n").alias("n_num_ok"),
        F.sum("n").alias("sum_num"),
        F.count("e").alias("n_elem_ok"),
        F.count("ts").alias("n_ts_ok"),
    )


@query(
    "scalar_collation_family",
    oracle="""
    WITH mangled AS (
        SELECT p_brand,
               CASE WHEN p_partkey % 2 = 0 THEN upper(p_name) ELSE p_name END AS name2,
               p_type
        FROM part
    )
    SELECT p_brand,
           count(DISTINCT lower(name2)) AS n_names_ci,
           count(DISTINCT name2) AS n_names_cs,
           count(*) FILTER (WHERE lower(name2) LIKE 'a%') AS n_prefix_a_ci,
           min(lower(name2)) AS first_ci,
           count(*) FILTER (WHERE contains(lower(p_type), 'BRUSHED' )) AS n_brushed_bad,
           count(*) FILTER (WHERE contains(lower(p_type), lower('BRUSHED'))) AS n_brushed_ci
    FROM mangled
    GROUP BY p_brand
    """,
    tags=("scalar", "string", "collation", "case_insensitive"),
)
def scalar_collation_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String COLLATIONS (Spark 4.0, SPARK-46830): UTF8_LCASE makes
    comparisons, DISTINCT, LIKE/startswith/contains, and MIN/MAX
    case-insensitive at the TYPE level — the engine-native form of the
    lower()-wrapping the jx string ops otherwise need (and unlike
    lower()-wrapping, a collated column keeps its original bytes and
    stays eligible for collation-aware data-source pushdown).  Half
    the part names are upper-mangled; CI vs CS distinct counts
    diverge, CI prefix/contains hit regardless of case.  DuckDB has
    no column collations, so the oracle encodes the SAME semantics
    with lower() — which is exactly the equivalence the collation
    implementation promises."""
    p = _t(spark, sf_dir, "part")
    mangled = p.select(
        "p_brand",
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_name"))
        .otherwise(F.col("p_name"))
        .alias("name2"),
        "p_type",
    )
    ci = F.expr("collate(name2, 'UTF8_LCASE')")
    ci_type = F.expr("collate(p_type, 'UTF8_LCASE')")
    return mangled.groupBy("p_brand").agg(
        F.countDistinct(ci).alias("n_names_ci"),
        F.countDistinct("name2").alias("n_names_cs"),
        F.count_if(ci.startswith("a")).alias("n_prefix_a_ci"),
        # min under CI collation picks an arbitrary member of the
        # CI-equal tie group (case variants) — canonicalize with lower
        F.lower(F.min(ci)).alias("first_ci"),
        F.count_if(F.contains(F.lower("p_type"), F.lit("BRUSHED"))).alias(
            "n_brushed_bad"
        ),
        F.count_if(F.contains(ci_type, F.lit("BRUSHED"))).alias("n_brushed_ci"),
    )


@query(
    "scalar_timezone_family",
    oracle="""
    SELECT o_orderkey,
           timezone('America/New_York', CAST(o_orderdate AS TIMESTAMPTZ)) AS ny_wall,
           timezone('Asia/Tokyo', CAST(o_orderdate AS TIMESTAMPTZ)) AS tokyo_wall,
           hour(timezone('America/New_York', CAST(o_orderdate AS TIMESTAMPTZ))) AS ny_hour,
           CAST(date_diff('hour', o_orderdate,
                          timezone('America/New_York', CAST(o_orderdate AS TIMESTAMPTZ)))
                AS INT) AS ny_offset_hours
    FROM orders WHERE o_orderkey <= 2000
    """,
    tags=("scalar", "date", "timezone", "dst"),
)
def scalar_timezone_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion family (convert_timezone, Spark 3.5): UTC
    event instants rendered as New York / Tokyo wall-clock time — the
    reporting-local-midnight problem every global pipeline hits.  The
    order dates span seven years of DST transitions, so ny_offset_hours
    flips between 4 and 5 (summer/winter) and the hour extraction
    shifts with it — both engines resolve the IANA rules identically
    (DuckDB via ICU).  Engine guidance: store UTC instants
    (TIMESTAMP), convert at the REPORTING edge only; converting before
    a groupBy would shuffle on a DST-ambiguous key."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    d = F.col("o_orderdate")
    ny = F.convert_timezone(F.lit("UTC"), F.lit("America/New_York"), d)
    tokyo = F.convert_timezone(F.lit("UTC"), F.lit("Asia/Tokyo"), d)
    return o.select(
        "o_orderkey",
        ny.alias("ny_wall"),
        tokyo.alias("tokyo_wall"),
        F.hour(ny).alias("ny_hour"),
        # convert_timezone yields TIMESTAMP_NTZ; cast back for the epoch
        # arithmetic (session tz is UTC, so the cast is exact)
        (
            (F.unix_micros(ny.cast("timestamp")) - F.unix_micros(d.cast("timestamp"))) / 3600000000
        ).cast("int").alias("ny_offset_hours"),
    )


@query(
    "scalar_business_days",
    oracle="""
    WITH ms AS (
        SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS first_ship
        FROM lineitem GROUP BY l_orderkey
    ),
    base AS (
        SELECT o.o_orderkey,
               least(CAST(o.o_orderdate AS DATE), ms.first_ship) AS d1,
               greatest(CAST(o.o_orderdate AS DATE), ms.first_ship) AS d2
        FROM orders o JOIN ms ON ms.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey < 3000
    ),
    spans AS (
        SELECT o_orderkey,
               date_diff('day', d1, d2) AS diff,
               date_part('isodow', d1) - 1 AS w1
        FROM base
    )
    SELECT o_orderkey, diff AS calendar_days,
           (diff // 7) * 5
           + greatest(0, least(w1 + diff % 7, 5) - w1)
           + greatest(0, least(w1 + diff % 7 - 7, 5)) AS business_days
    FROM spans
    """,
    tags=("business_days", "date", "scalar", "time_domain"),
)
def scalar_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUSINESS-DAY arithmetic in closed form — the ops/SLA metric
    ('ship within 3 working days') computed without a calendar UDF or
    a generated day spine (direction-safe — the earlier date anchors
    the week arithmetic): full weeks contribute 5, and the remainder
    window starting at the order's ISO weekday contributes its
    weekday overlap via two greatest/least clamps (property-validated
    against a day-scan model over 2000 random ranges).  Pure integer
    codegen — at 100 TB this is a per-row expression, not a join
    against a date dimension (holidays, when needed, ARE the date-dim
    join — orthogonal and additive)."""
    prepare(spark)
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 3000)
    li = load_table(spark, sf_dir, "lineitem")
    ms = li.groupBy("l_orderkey").agg(
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship")
    )
    od = F.col("o_orderdate").cast("date")
    d1 = F.least(od, F.col("first_ship"))
    d2 = F.greatest(od, F.col("first_ship"))
    base = o.join(ms, o.o_orderkey == ms.l_orderkey).select(
        "o_orderkey",
        F.datediff(d2, d1).alias("diff"),
        F.weekday(d1).alias("w1"),
    )
    rem = F.col("diff") % 7
    extra = F.greatest(
        F.lit(0), F.least(F.col("w1") + rem, F.lit(5)) - F.col("w1")
    ) + F.greatest(F.lit(0), F.least(F.col("w1") + rem - 7, F.lit(5)))
    return base.select(
        "o_orderkey",
        F.col("diff").alias("calendar_days"),
        (F.floor(F.col("diff") / 7) * 5 + extra).cast("bigint").alias("business_days"),
    )

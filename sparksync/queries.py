"""Query registry: every operator from SURVEY.md section 2 (plus the
LLM-pipeline extensions) as a named (spark_fn, oracle_sql) pair.

Each spark_fn takes (spark, sf_dir) and returns a DataFrame; oracle_sql
is the equivalent ANSI SQL DuckDB runs over the same parquet tables.
Column names and types are aligned pair-by-pair because the driver's
compare hashes values after sorting columns by name.

Numeric discipline (so hashes match bit-for-bit):
- money columns are cast to decimal(12,2) at the scan (FIXTURES.md says
  they are NUMBER(12,2) on the Oracle side) and aggregate sums are cast
  to an explicit final decimal type on BOTH sides;
- averages/ratios are computed as double division of exact operands
  (same two operands -> identical IEEE result in both engines);
- counts/rankings are bigint on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import compare
from .ext import asof, dedup, jsonops, sampling, similarity, skew, textops
from .source import plan_pages

Tables = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


from .source import load_table as load  # noqa: E402 — shared fixture loader


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(12,2)")


def _register_views(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for n in names:
        load(spark, sf_dir, n).createOrReplaceTempView(n)


# --------------------------------------------------------------------------
# ported surface: the reference's emitted-SQL semantics (SURVEY 2.5 Q1-Q15)
# --------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped aggregate over lineitem (projection Q1,
    filter Q3, groupBy Q8, aggregates Q5, sort Q14). Single shuffle on
    the 6-value group key; partial aggregation is map-side."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - _dec("l_discount")
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit("1999-12-31 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (
                F.sum(_dec("l_quantity")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_Q01 = """
select l_returnflag, l_linestatus,
  cast(sum(cast(l_quantity as decimal(12,2))) as double) as sum_qty,
  cast(sum(cast(l_extendedprice as decimal(12,2))) as double) as sum_base_price,
  cast(sum(cast(l_extendedprice as decimal(12,2)) *
       (cast(1 as decimal(12,2)) - cast(l_discount as decimal(12,2)))) as double)
       as sum_disc_price,
  cast(sum(cast(l_quantity as decimal(12,2))) as double) / cast(count(*) as double) as avg_qty,
  count(*) as count_order
from lineitem
where l_shipdate <= timestamp '1999-12-31 00:00:00'
group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus
"""


def q02_notin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1's exclude-list semantics (NOT IN, cmd/root.go:215-224) as a
    Spark filter + aggregate."""
    c = load(spark, sf_dir, "customer")
    return (
        c.where(~F.col("c_mktsegment").isin("MACHINERY", "AUTOMOBILE"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(_dec("c_acctbal")).cast("double").alias("sum_bal"),
        )
    )


ORACLE_Q02 = """
select c_mktsegment, count(*) as cnt,
  cast(sum(cast(c_acctbal as decimal(12,2))) as double) as sum_bal
from customer
where c_mktsegment not in ('MACHINERY','AUTOMOBILE')
group by c_mktsegment
"""


def q03_paged_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/Q4: the reference's ROWNUM page window (cmd/root.go:336) made
    deterministic with an explicit order. Page 3 @ pageSize=1000. On the
    JDBC path this becomes partitioned predicates (source.py) — the
    window here exists to prove page semantics, not to scale."""
    o = load(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .where((F.col("rn") >= 2001) & (F.col("rn") <= 3000))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "rn")
    )


ORACLE_Q03 = """
select o_orderkey, o_custkey, o_orderstatus, rn from (
  select o_orderkey, o_custkey, o_orderstatus,
         row_number() over (order by o_orderkey) as rn
  from orders) t
where rn >= 2001 and rn <= 3000
"""


def q04_page_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 page math (ceil(count/pageSize), cmd/root.go:320-322) computed
    by the engine's planner for the two big tables."""
    rows = []
    for t in ("lineitem", "orders"):
        n = load(spark, sf_dir, t).count()
        plan = plan_pages(n, t, page_size=10_000)
        rows.append((t, n, plan.num_pages))
    return spark.createDataFrame(
        rows, "table_name string, row_count bigint, num_pages bigint"
    )


ORACLE_Q04 = """
select 'lineitem' as table_name, count(*) as row_count,
       greatest(1, cast(ceil(count(*) / 10000.0) as bigint)) as num_pages from lineitem
union all
select 'orders', count(*), greatest(1, cast(ceil(count(*) / 10000.0) as bigint)) from orders
"""


def q05_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7/S5: the ordered string aggregation the reference pushes to
    Oracle as xmlagg/listagg (cmd/root.go:313, tablemeta.go:194).
    Recipe: collect_list(struct) -> array_sort -> transform -> join.
    nation is a dim -> broadcast join, no shuffle on region."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    agg = n.groupBy("n_regionkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("n_nationkey", "n_name"))),
                lambda s: s["n_name"],
            ),
            ",",
        ).alias("nations")
    )
    return (
        agg.join(F.broadcast(r), agg["n_regionkey"] == r["r_regionkey"])
        .select("r_name", "nations")
    )


ORACLE_Q05 = """
select r_name, string_agg(n_name, ',' order by n_nationkey) as nations
from nation join region on n_regionkey = r_regionkey
group by r_name
"""


def q06_meta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6's shape (tablemeta.go:74): left join + coalesce/NVL + CASE +
    LEAST (Q9/Q12). Dim side broadcast."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"], "left")
    return j.select(
        "c_custkey",
        F.coalesce(F.col("n_name"), F.lit("UNKNOWN")).alias("nation_name"),
        F.when(_dec("c_acctbal") < 0, F.lit("NEG")).otherwise(F.lit("POS")).alias("bal_class"),
        F.least(F.col("c_nationkey"), F.lit(12)).alias("least_key"),
    )


ORACLE_Q06 = """
select c_custkey,
  coalesce(n_name, 'UNKNOWN') as nation_name,
  case when cast(c_acctbal as decimal(12,2)) < 0 then 'NEG' else 'POS' end as bal_class,
  least(c_nationkey, 12) as least_key
from customer left join nation on c_nationkey = n_nationkey
"""


def q07_index_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9's shape (tablemeta.go:194): groupBy + ordered listagg + nested
    CASE synthesizing an 'index DDL' per order."""
    li = load(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return li.groupBy("l_orderkey").agg(
        F.concat(F.lit("idx_"), F.col("l_orderkey").cast("string")).alias("index_name"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("l_linenumber"))),
                lambda s: s["l_linenumber"].cast("string"),
            ),
            ",",
        ).alias("cols"),
        F.when(cnt > 5, F.lit("WIDE"))
        .when(cnt > 2, F.lit("MULTI"))
        .otherwise(F.lit("SIMPLE"))
        .alias("kind"),
    )


ORACLE_Q07 = """
select l_orderkey,
  'idx_' || cast(l_orderkey as varchar) as index_name,
  string_agg(cast(l_linenumber as varchar), ',' order by l_linenumber) as cols,
  case when count(*) > 5 then 'WIDE'
       when count(*) > 2 then 'MULTI'
       else 'SIMPLE' end as kind
from lineitem group by l_orderkey
"""


def q08_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11/Q11: correlated scalar subqueries (tablemeta.go:289), written
    multiplicatively so the math stays exact decimal (no avg rounding).
    Catalyst decorrelates both subqueries into aggregated joins."""
    _register_views(spark, sf_dir, ["customer"])
    return spark.sql(ORACLE_Q08)


ORACLE_Q08 = """
select c.c_custkey, c.c_nationkey
from customer c
where cast(c.c_acctbal as decimal(12,2)) *
      (select count(*) from customer c2 where c2.c_nationkey = c.c_nationkey)
      >
      (select cast(sum(cast(c3.c_acctbal as decimal(12,2))) as decimal(38,2))
       from customer c3 where c3.c_nationkey = c.c_nationkey)
"""


def q09_count_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15/EP2 (compare.go:102-132): per-table row counts, the
    reference's only correctness check, across all ten tables."""
    dfs = [
        load(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"), F.count(F.lit(1)).alias("cnt")
        )
        for t in Tables
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionAll(d)
    return out


ORACLE_Q09 = "\nunion all\n".join(
    f"select '{t}' as table_name, count(*) as cnt from {t}" for t in Tables
)


def q10_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """compare.py's order-insensitive digest (count + min/max row sha2)
    on three tables — the row-level strengthening of EP2. One
    partial-aggregable pass per table, no row shuffle."""
    parts = []
    specs = {
        "region": ["r_regionkey", "r_name"],
        "nation": ["n_nationkey", "n_name", "n_regionkey"],
        "supplier": ["s_suppkey", "s_name", "s_nationkey"],
    }
    for t, cols in specs.items():
        df = load(spark, sf_dir, t)
        h = F.sha2(F.concat_ws("|", *[F.col(c).cast("string") for c in cols]), 256)
        parts.append(
            df.agg(
                F.lit(t).alias("table_name"),
                F.count(F.lit(1)).alias("cnt"),
                F.min(h).alias("hmin"),
                F.max(h).alias("hmax"),
            )
        )
    out = parts[0]
    for d in parts[1:]:
        out = out.unionAll(d)
    return out


ORACLE_Q10 = """
select 'region' as table_name, count(*) as cnt,
  min(sha256(concat_ws('|', cast(r_regionkey as varchar), r_name))) as hmin,
  max(sha256(concat_ws('|', cast(r_regionkey as varchar), r_name))) as hmax
from region
union all
select 'nation', count(*),
  min(sha256(concat_ws('|', cast(n_nationkey as varchar), n_name, cast(n_regionkey as varchar)))),
  max(sha256(concat_ws('|', cast(n_nationkey as varchar), n_name, cast(n_regionkey as varchar))))
from nation
union all
select 'supplier', count(*),
  min(sha256(concat_ws('|', cast(s_suppkey as varchar), s_name, cast(s_nationkey as varchar)))),
  max(sha256(concat_ws('|', cast(s_suppkey as varchar), s_name, cast(s_nationkey as varchar))))
from supplier
"""


# --------------------------------------------------------------------------
# extension surface: analytics the reference lacks (SURVEY 2.5 'not present')
# --------------------------------------------------------------------------


def q11_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking: top-3 orders per customer. Partitioned window ->
    single shuffle on o_custkey; deterministic tie-break."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


ORACLE_Q11 = """
select o_custkey, o_orderkey, rnk from (
  select o_custkey, o_orderkey,
    row_number() over (partition by o_custkey
                       order by o_totalprice desc, o_orderkey) as rnk
  from orders) t
where rnk <= 3
"""


def q12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: ROLLUP over (returnflag, linestatus)."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


ORACLE_Q12 = """
select l_returnflag, l_linestatus,
  cast(sum(cast(l_quantity as decimal(12,2))) as double) as sum_qty,
  count(*) as cnt
from lineitem group by rollup (l_returnflag, l_linestatus)
"""


def q13_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation: customers with open orders EXCEPT customers with
    finished orders."""
    o = load(spark, sf_dir, "orders")
    open_c = o.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    fin_c = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.subtract(fin_c)


ORACLE_Q13 = """
select distinct o_custkey from orders where o_orderstatus = 'O'
except
select o_custkey from orders where o_orderstatus = 'F'
"""


def q14_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON ops on the CLOB-typed events.props (ext/jsonops.py)."""
    return jsonops.k_stats_by_type(load(spark, sf_dir, "events"))


ORACLE_Q14 = """
select event_type, count(*) as cnt,
  cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as bigint) as sum_k,
  min(cast(json_extract_string(props, '$.k') as bigint)) as min_k,
  max(cast(json_extract_string(props, '$.k') as bigint)) as max_k
from events group by event_type
"""


def q15_ts_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation in batch form (the streaming variant
    with watermark lives in ext/stream.py; same grouping logic)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket_ts"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(_dec("value")).cast("double").alias("sum_value"),
    )


ORACLE_Q15 = """
select date_trunc('hour', ts) as bucket_ts, event_type, count(*) as cnt,
  cast(sum(cast(value as decimal(12,2))) as double) as sum_value
from events group by 1, 2
"""


def q16_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join: big-big shuffle join on orderkey,
    broadcast-filtered customer side; deterministic top-10."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )
    return joined.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)


ORACLE_Q16 = """
select o_orderkey, o_orderdate,
  cast(sum(cast(l_extendedprice as decimal(12,2)) *
       (cast(1 as decimal(12,2)) - cast(l_discount as decimal(12,2)))) as double)
       as revenue
from lineitem
join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
where c_mktsegment = 'BUILDING'
  and o_orderdate < timestamp '1998-01-01 00:00:00'
  and l_shipdate > timestamp '1998-01-01 00:00:00'
group by o_orderkey, o_orderdate
order by revenue desc, o_orderkey
limit 10
"""


def q17_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join: dims broadcast, facts shuffle on
    orderkey only (one co-partitioned join chain)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(
            F.broadcast(c),
            (o["o_custkey"] == c["c_custkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


ORACLE_Q17 = """
select n_name,
  cast(sum(cast(l_extendedprice as decimal(12,2)) *
       (cast(1 as decimal(12,2)) - cast(l_discount as decimal(12,2)))) as double)
       as revenue
from lineitem
join orders on l_orderkey = o_orderkey
join supplier on l_suppkey = s_suppkey
join customer on o_custkey = c_custkey and c_nationkey = s_nationkey
join nation on c_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
group by n_name
"""


# --- LLM-pipeline extensions ------------------------------------------------


def q18_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on text (ext/dedup.exact_dedup): keep lowest doc_id
    per distinct text."""
    d = dedup.exact_dedup(load(spark, sf_dir, "documents"), ["text"], "doc_id")
    return d.select("doc_id", "dup_count")


ORACLE_Q18 = """
select min(doc_id) as doc_id, count(*) as dup_count
from documents group by text
"""


def q19_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs >= 0.8
    (ext/dedup.jaccard_pairs)."""
    return dedup.jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.8)


ORACLE_Q19 = """
with docs as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
docs3 as (select * from docs where len(toks) >= 3),
sh as (
  select distinct doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] as shingle
  from docs3, unnest(range(1, len(toks) - 1)) t(i)),
sizes as (select doc_id, count(*) as n from sh group by doc_id),
common as (
  select a.doc_id as d1, b.doc_id as d2, count(*) as c
  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
  group by 1, 2)
select d1, d2,
  cast(c as double) / cast(na.n + nb.n - c as double) as jacc
from common
join sizes na on na.doc_id = d1
join sizes nb on nb.doc_id = d2
where cast(c as double) / cast(na.n + nb.n - c as double) >= 0.8
"""


def q20_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with exact verification — the 100 TB
    scale path (ext/dedup.minhash_dedup_pairs). Candidates are verified
    with exact Jaccard, so the result equals the exact all-pairs q19
    whenever LSH recall catches every >=0.8 pair (P > 0.999 per pair;
    verified exhaustively at sf0.001 and sf0.01 on the deterministic
    fixtures) — the oracle is therefore the same SQL as q19, and
    test_ext.py asserts q19 == q20 set-exactly as well."""
    return dedup.minhash_dedup_pairs(load(spark, sf_dir, "documents"), threshold=0.8)


# LSH + exact verify reproduces the exact-Jaccard pair set (see
# q20_dedup_minhash docstring), so the oracle is q19's SQL verbatim.
ORACLE_Q20 = ORACLE_Q19


def q21_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints, oracle-checked: the gate parameterizes the
    token hash to the portable md5-derived 60-bit value
    (dedup.md5_token_hash) so DuckDB can replay the per-bit majority
    bit-for-bit. Production default stays xxhash64."""
    return dedup.simhash(
        load(spark, sf_dir, "documents"), hash_fn=dedup.md5_token_hash
    )


ORACLE_Q21 = """
with toks as (
  select doc_id,
         unnest(list_filter(string_split(trim(text), ' '), x -> x <> '')) as tok
  from documents),
h as (
  select doc_id,
         cast(cast('0x' || substring(md5(tok), 1, 15) as ubigint) as bigint) as hv
  from toks),
bit as (
  select doc_id, i,
         case when 2 * count(*) filter (where (hv >> i) & 1 = 1) > count(*)
              then 1::bigint << i else 0::bigint end as term
  from h cross join (select unnest(range(48)) as i) g
  group by doc_id, i)
select doc_id, cast(sum(term) as bigint) as simhash from bit group by doc_id
"""


def q22_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vec_id=0
    (ext/similarity.knn_brute)."""
    return similarity.knn_brute(load(spark, sf_dir, "embeddings"), query_id=0, k=10)


ORACLE_Q22 = """
with q as (select embedding as qe from embeddings where vec_id = 0),
scored as (
  select vec_id,
         list_cosine_similarity(list_transform(embedding, x -> cast(x as double)),
                                list_transform(qe,        x -> cast(x as double))) as cos
  from embeddings, q where vec_id <> 0)
select vec_id as neighbor_id,
       row_number() over (order by cos desc, vec_id) as rnk
from scored order by cos desc, vec_id limit 10
"""


def q23_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF centroid assignment (ext/similarity.ivf_assign) — the
    partition-pruned ANN scale path's index build."""
    return similarity.ivf_assign(load(spark, sf_dir, "embeddings"), n_centroids=8)


ORACLE_Q23 = """
with c as (select vec_id as cid,
                  list_transform(embedding, x -> cast(x as double)) as cv
           from embeddings where vec_id < 8),
v as (select vec_id, list_transform(embedding, x -> cast(x as double)) as vv
      from embeddings),
s as (select v.vec_id, c.cid, list_cosine_similarity(vv, cv) as cos from v, c),
r as (select vec_id, cid,
             row_number() over (partition by vec_id order by cos desc, cid) as rn
      from s)
select vec_id, cid as centroid_id from r where rn = 1
"""


def q24_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (ext/textops.language_id)."""
    return textops.language_id(load(spark, sf_dir, "documents"))


ORACLE_Q24 = """
select doc_id,
  case when length(trim(text)) = 0 then 'unknown'
       when text like '% the %' or text like 'the %' or text like '% the' then 'en'
       when text like '% data %' or text like 'data %' then 'data-ish'
       else 'other' end as pred_lang
from documents
"""


def q25_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality features (ext/textops.quality_score)."""
    return textops.quality_score(load(spark, sf_dir, "documents"))


ORACLE_Q25 = """
with t as (
  select doc_id, text,
         list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
m as (
  select doc_id,
    cast(len(toks) as bigint) as n_tokens,
    cast(length(text) as bigint) as char_len,
    cast(len(list_filter(toks, x -> x in ('the','a','of'))) as bigint) as stop_cnt,
    cast(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) as bigint) as tok_chars
  from t)
select doc_id, n_tokens, char_len, stop_cnt,
  case when n_tokens > 0 then cast(stop_cnt as double) / cast(n_tokens as double)
       else 0.0 end as stop_ratio,
  case when n_tokens > 0 then cast(tok_chars as double) / cast(n_tokens as double)
       else 0.0 end as avg_tok_len,
  cast(case when n_tokens >= 20 and n_tokens <= 1000
             and (cast(stop_cnt as double) / cast(n_tokens as double)) < 0.5
       then 1 else 0 end as bigint) as keep
from m
"""


def q26_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts (ext/textops.token_counts)."""
    return textops.token_counts(load(spark, sf_dir, "documents"))


ORACLE_Q26 = """
select doc_id,
  cast(len(list_filter(string_split(trim(text), ' '), x -> x <> '')) as bigint) as ws_tokens,
  cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) as bigint) as bpe_tokens
from documents
"""


def q27_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint
    (ext/textops.fingerprint)."""
    return textops.fingerprint(load(spark, sf_dir, "documents"))


ORACLE_Q27 = f"""
select doc_id,
  list_reduce(
    list_prepend(cast(0 as bigint),
      list_transform(list_filter(string_split(trim(text), ' '), x -> x <> ''),
                     x -> cast(ascii(x) * 37 + length(x) as bigint))),
    (acc, x) -> (acc * 31 + x) % {textops.FP_MOD}) as fp
from documents
"""


def q28_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (ext/asof.asof_join): each event picks up the value of
    the latest signup at-or-before it for the same user — union + running
    last_value, one shuffle on user_id, no inequality cross-join."""
    e = load(spark, sf_dir, "events")
    right = e.where(F.col("event_type") == "signup").withColumn(
        "signup_value", _dec("value")
    )
    joined = asof.asof_join(
        e, right, key="user_id", left_ts="ts", right_ts="ts",
        right_vals=["signup_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        # Cast decimal(12,2) -> double so the gate's value hash matches the
        # DuckDB bridge (which yields float64); values are identical either way.
        F.col("asof_signup_value").cast("double").alias("asof_value"),
    )


ORACLE_Q28 = """
with tagged as (
  select event_id, user_id, ts, 1 as is_left,
         cast(null as double) as rv
  from events
  union all
  select null, user_id, ts, 0, cast(cast(value as decimal(12,2)) as double)
  from events where event_type = 'signup'),
filled as (
  select event_id, user_id, is_left,
    last_value(rv ignore nulls) over (
      partition by user_id order by ts, is_left
      rows between unbounded preceding and current row) as asof_value
  from tagged)
select event_id, user_id, asof_value from filled where is_left = 1
"""


def q29_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (ext/asof.sessionize, 30-min gap):
    sessions and events per user."""
    s = asof.sessionize(load(spark, sf_dir, "events"), "user_id", "ts", 30)
    return s.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


ORACLE_Q29 = """
with g as (
  select user_id, ts,
    case when lag(ts) over w is null
              or (epoch_us(ts) - epoch_us(lag(ts) over w)) > 1800000000
         then 1 else 0 end as brk
  from events window w as (partition by user_id order by ts)),
s as (
  select user_id,
    cast(sum(brk) over (partition by user_id order by ts
                   rows between unbounded preceding and current row) as bigint)
      as session_id
  from g)
select user_id, max(session_id) as n_sessions, count(*) as n_events
from s group by user_id
"""


def q30_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: distinct customers per order priority."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


ORACLE_Q30 = """
select o_orderpriority, count(distinct o_custkey) as n_cust,
       count(*) as n_orders
from orders group by o_orderpriority
"""


def q31_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: top-5 most similar pairs corpus-wide,
    exact all-pairs (ext/similarity.neardup_pairs_brute). Scale path is
    q32 (RP-LSH buckets)."""
    return similarity.neardup_pairs_brute(load(spark, sf_dir, "embeddings"), top_n=5)


ORACLE_Q31 = """
with e as (select vec_id,
                  list_transform(embedding, x -> cast(x as double)) as v
           from embeddings),
p as (select a.vec_id as d1, b.vec_id as d2,
             list_cosine_similarity(a.v, b.v) as cos
      from e a join e b on a.vec_id < b.vec_id)
select d1, d2, row_number() over (order by cos desc, d1, d2) as rnk
from p order by cos desc, d1, d2 limit 5
"""


def q32_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RP-LSH bucketed near-dup (ext/similarity.neardup_pairs_lsh).
    Oracle-checked since round 4: the sha-seeded planes are
    deterministic Python constants, so ORACLE_Q32 inlines them as SQL
    list literals and replays the exact band assignment in DuckDB
    (same trick as q21/q36's md5-portable hashes). test_ext.py
    additionally asserts recall overlap with brute-force q31.

    Params are PINNED (n_planes=32) so the inlined-plane oracle stays
    bit-replayable at any SF; the production default is n_planes=None,
    which auto-sizes the bands via rp_lsh_params (VERDICT r10 #1)."""
    return similarity.neardup_pairs_lsh(
        load(spark, sf_dir, "embeddings"), top_n=5, n_planes=32
    )


def _oracle_q32() -> str:
    """DuckDB replay of neardup_pairs_lsh's plane/band assignment.

    The plane matrix is deterministic (_rp_planes, sha256-seeded), so
    its 32x64 doubles are inlined as list literals; each band bucket is
    the same little-endian sign-bit pack Spark computes. Both engines
    evaluate the dot products as sequential double accumulation, so the
    sign (and hence the bucket) agrees; the output carries no float
    column (d1, d2, rnk only), so the value-hash compares ordering, not
    float bits. bucket_cap (10_000) never triggers at gate SF (<= 5_000
    vectors), so the oracle replays the uncapped assignment."""
    from .ext.similarity import _rp_planes

    n_planes, n_bands, dim = 32, 4, 64
    width = n_planes // n_bands
    planes = _rp_planes(n_planes, dim)

    def lit(plane: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in plane) + "]"

    def bucket(bi: int) -> str:
        terms = [
            f"(case when list_dot_product(v, {lit(planes[bi * width + i])}) >= 0"
            f" then {2 ** i} else 0 end)"
            for i in range(width)
        ]
        return " + ".join(terms)

    keyed = "\nunion all\n".join(
        f"select vec_id, v, {bi} as band, {bucket(bi)} as bucket from e"
        for bi in range(n_bands)
    )
    return f"""
with e as (select vec_id,
                  list_transform(embedding, x -> cast(x as double)) as v
           from embeddings),
keyed as (
{keyed}
),
p as (select distinct a.vec_id as d1, b.vec_id as d2
      from keyed a join keyed b
        on a.band = b.band and a.bucket = b.bucket and a.vec_id < b.vec_id),
s as (select d1, d2, list_cosine_similarity(ea.v, eb.v) as cos
      from p join e ea on ea.vec_id = p.d1 join e eb on eb.vec_id = p.d2)
select d1, d2, row_number() over (order by cos desc, d1, d2) as rnk
from s order by cos desc, d1, d2 limit 5
"""


ORACLE_Q32 = _oracle_q32()


def q33_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — full grouping-sets lattice."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
    )


ORACLE_Q33 = """
select o_orderstatus, o_orderpriority, count(*) as cnt,
  cast(sum(cast(o_totalprice as decimal(12,2))) as double) as sum_price
from orders group by cube (o_orderstatus, o_orderpriority)
"""


def q34_ddl_typemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-mapping parity check (tablemeta.go:133-158 via typemap.py):
    the engine's fabricated-catalog -> MySQL/Spark type decisions for
    five tables, as data. The oracle is a hand-written golden VALUES
    list derived from FIXTURES.md — independent of this code path."""
    from .catalog import FixtureCatalog

    cat = FixtureCatalog(spark, sf_dir)
    rows = []
    for t in ("region", "customer", "orders", "events", "documents"):
        for mc in cat.table_spec(t).mapped():
            rows.append((t, mc.name, mc.mysql_type, mc.spark_type.simpleString()))
    return spark.createDataFrame(
        rows, "table_name string, column_name string, mysql_type string, spark_type string"
    )


ORACLE_Q34 = """
select * from (values
  ('region','r_regionkey','int not null','int'),
  ('region','r_name','varchar(255)','string'),
  ('customer','c_custkey','bigint not null','bigint'),
  ('customer','c_name','varchar(255)','string'),
  ('customer','c_nationkey','int','int'),
  ('customer','c_acctbal','decimal(12,2)','decimal(12,2)'),
  ('customer','c_mktsegment','char(10)','string'),
  ('orders','o_orderkey','bigint not null','bigint'),
  ('orders','o_custkey','bigint','bigint'),
  ('orders','o_orderstatus','char(1)','string'),
  ('orders','o_totalprice','decimal(12,2)','decimal(12,2)'),
  ('orders','o_orderdate','datetime','timestamp'),
  ('orders','o_orderpriority','varchar(255)','string'),
  ('events','event_id','bigint not null','bigint'),
  ('events','ts','datetime(6)','timestamp'),
  ('events','user_id','bigint','bigint'),
  ('events','event_type','varchar(255)','string'),
  ('events','value','decimal(12,2)','decimal(12,2)'),
  ('events','props','longtext','string'),
  ('documents','doc_id','bigint not null','bigint'),
  ('documents','text','longtext','string'),
  ('documents','lang','char(2)','string'),
  ('documents','source','varchar(255)','string'),
  ('documents','n_chars','bigint','bigint')
) as t(table_name, column_name, mysql_type, spark_type)
"""


# --------------------------------------------------------------------------

def q35_objects_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Objects-phase parity (EP1 IdxCreate/SeqCreate/FkCreate/NormalIdx/
    CommentCreate/ViewCreate, cmd/root.go:146-175): every post-data DDL
    the engine synthesizes for the fixture catalog, as data. The oracle
    is a golden VALUES list pinned at review time — any drift in the
    generators or the fixture object catalog breaks the hash."""
    from .sync import SyncJob

    job = SyncJob(spark, sf_dir, sf_dir + "/_unused_out")
    rows = job.synthesize_objects(job.plan())
    return spark.createDataFrame(
        rows, "object_class string, object_name string, stmt string"
    )


ORACLE_Q35 = """
select * from (values
  ('index','pk_customer','alter table `customer` add primary key (`c_custkey`);'),
  ('index','idx_customer_nationkey','create index `idx_customer_nationkey` on `customer` (`c_nationkey`);'),
  ('index','pk_documents','alter table `documents` add primary key (`doc_id`);'),
  ('index','pk_embeddings','alter table `embeddings` add primary key (`vec_id`);'),
  ('index','pk_events','alter table `events` add primary key (`event_id`);'),
  ('index','idx_events_user_ts','create index `idx_events_user_ts` on `events` (`user_id`,`ts`);'),
  ('index','pk_lineitem','alter table `lineitem` add primary key (`l_orderkey`,`l_linenumber`);'),
  ('index','idx_lineitem_part_supp','create index `idx_lineitem_part_supp` on `lineitem` (`l_partkey`,`l_suppkey`);'),
  ('index','pk_nation','alter table `nation` add primary key (`n_nationkey`);'),
  ('index','idx_nation_regionkey','create index `idx_nation_regionkey` on `nation` (`n_regionkey`);'),
  ('index','uk_nation_name','create unique index `uk_nation_name` on `nation` (`n_name`);'),
  ('index','pk_orders','alter table `orders` add primary key (`o_orderkey`);'),
  ('index','idx_orders_custkey','create index `idx_orders_custkey` on `orders` (`o_custkey`);'),
  ('index','pk_part','alter table `part` add primary key (`p_partkey`);'),
  ('index','pk_region','alter table `region` add primary key (`r_regionkey`);'),
  ('index','pk_supplier','alter table `supplier` add primary key (`s_suppkey`);'),
  ('sequence','events_autoinc_0','create index `ids_events_event_id_i` on `events` (`event_id`);'),
  ('sequence','events_autoinc_1','alter table `events` modify `event_id` bigint auto_increment;'),
  ('fk','fk_customer_nation','alter table `customer` add constraint `fk_customer_nation` foreign key (`c_nationkey`) references `nation` (`n_nationkey`);'),
  ('fk','fk_embeddings_doc','alter table `embeddings` add constraint `fk_embeddings_doc` foreign key (`vec_id`) references `documents` (`doc_id`);'),
  ('fk','fk_lineitem_orders','alter table `lineitem` add constraint `fk_lineitem_orders` foreign key (`l_orderkey`) references `orders` (`o_orderkey`) on delete cascade;'),
  ('fk','fk_lineitem_part','alter table `lineitem` add constraint `fk_lineitem_part` foreign key (`l_partkey`) references `part` (`p_partkey`);'),
  ('fk','fk_lineitem_supplier','alter table `lineitem` add constraint `fk_lineitem_supplier` foreign key (`l_suppkey`) references `supplier` (`s_suppkey`);'),
  ('fk','fk_nation_region','alter table `nation` add constraint `fk_nation_region` foreign key (`n_regionkey`) references `region` (`r_regionkey`);'),
  ('fk','fk_orders_customer','alter table `orders` add constraint `fk_orders_customer` foreign key (`o_custkey`) references `customer` (`c_custkey`);'),
  ('fk','fk_supplier_nation','alter table `supplier` add constraint `fk_supplier_nation` foreign key (`s_nationkey`) references `nation` (`n_nationkey`);'),
  ('function_index','documents','CREATE INDEX IDX_DOCUMENTS_LANG_UP ON DOCUMENTS (UPPER(LANG));'),
  ('comment','documents','alter table `documents` comment = ''raw text corpus for the LLM-pipeline operators'';'),
  ('comment','orders','alter table `orders` comment = ''order headers, one row per order'';'),
  ('comment','region','alter table `region` comment = ''TPC-H region dimension'';'),
  ('view','v_order_revenue','create or replace view `v_order_revenue` as SELECT O_ORDERKEY, IFNULL(O_TOTALPRICE, 0) AS REVENUE FROM `ORDERS`;')
) as t(object_class, object_name, stmt)
"""


def q36_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-bucket near-dup join (ext/dedup.simhash_pairs):
    pigeonhole band equi-join + bit_count(xor) verify. Oracle-checked:
    like q21, the gate parameterizes the token hash to the portable
    md5-derived value so DuckDB can replay the fingerprints and the
    all-pairs hamming filter bit-for-bit (pigeonhole banding has EXACT
    recall for hamming <= max_hamming, so banded join == all-pairs;
    measured same cost as xxhash64 at sf0.1 — the 48 bit-filter passes
    dominate, not the token hash). Production default stays xxhash64."""
    return dedup.simhash_pairs(
        load(spark, sf_dir, "documents"), hash_fn=dedup.md5_token_hash
    )


ORACLE_Q36 = """
with toks as (
  select doc_id,
         unnest(list_filter(string_split(trim(text), ' '), x -> x <> '')) as tok
  from documents),
h as (
  select doc_id,
         cast(cast('0x' || substring(md5(tok), 1, 15) as ubigint) as bigint) as hv
  from toks),
bit as (
  select doc_id, i,
         case when 2 * count(*) filter (where (hv >> i) & 1 = 1) > count(*)
              then 1::bigint << i else 0::bigint end as term
  from h cross join (select unnest(range(48)) as i) g
  group by doc_id, i),
fp as (select doc_id, cast(sum(term) as bigint) as simhash from bit group by doc_id)
select a.doc_id as d1, b.doc_id as d2,
       cast(bit_count(xor(a.simhash, b.simhash)) as bigint) as hamming
from fp a join fp b on a.doc_id < b.doc_id
where bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q37_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized interval join (ext/asof.range_join): shipments within
    30 days of an urgent order's date, counted per order. The Spark plan
    is an equi-join on quantized time cells + exact predicate — never
    the broadcast-nested-loop an inequality join would produce."""
    li = (
        load(spark, sf_dir, "lineitem")
        .where("l_returnflag = 'R'")
        .select("l_orderkey", "l_shipdate")
    )
    o = (
        load(spark, sf_dir, "orders")
        .where("o_orderpriority = '1-URGENT'")
        .select(
            "o_orderkey",
            "o_orderdate",
            F.expr("o_orderdate + interval 30 days").alias("o_end"),
        )
    )
    j = asof.range_join(li, o, "l_shipdate", "o_orderdate", "o_end")
    return j.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_shipments"))


ORACLE_Q37 = """
select o_orderkey, count(*) as n_shipments
from orders join lineitem
  on o_orderdate <= l_shipdate and l_shipdate < o_orderdate + interval 30 day
where o_orderpriority = '1-URGENT' and l_returnflag = 'R'
group by o_orderkey
"""


def q38_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (ext/sampling.split_assign,
    knuth method so DuckDB can replay the hash): split sizes per lang."""
    d = sampling.split_assign(
        load(spark, sf_dir, "documents"),
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
        method="knuth",
    )
    return d.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("cnt"))


ORACLE_Q38 = """
select case when mod(doc_id * 2654435761, 10000) < 8000 then 'train'
            when mod(doc_id * 2654435761, 10000) < 9000 then 'val'
            else 'test' end as split,
       lang, count(*) as cnt
from documents group by 1, 2
"""


def q39_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (ext/sampling.stratified_sample):
    keep 50% of 'en' docs, 10% of everything else; count per lang."""
    d = sampling.stratified_sample(
        load(spark, sf_dir, "documents"),
        "lang",
        {"en": 0.5},
        "doc_id",
        default_fraction=0.1,
        method="knuth",
    )
    return d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))


ORACLE_Q39 = """
select lang, count(*) as cnt from documents
where mod(doc_id * 2654435761, 10000)
      < case when lang = 'en' then 5000 else 1000 end
group by lang
"""


def q40_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length histogram: 100-char buckets over documents.n_chars
    with per-bucket token stats — the one-pass corpus profile a data
    pipeline runs before filtering."""
    d = textops.token_counts(load(spark, sf_dir, "documents"), keep=["n_chars"])
    return (
        d.withColumn("bucket", F.expr("n_chars div 100"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("ws_tokens").alias("sum_ws_tokens"),
            F.max("bpe_tokens").alias("max_bpe_tokens"),
        )
    )


ORACLE_Q40 = """
with t as (
  select n_chars // 100 as bucket,
    cast(len(list_filter(string_split(trim(text), ' '), x -> x <> '')) as bigint)
      as ws_tokens,
    cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) as bigint)
      as bpe_tokens
  from documents)
select bucket, count(*) as cnt,
  cast(sum(ws_tokens) as bigint) as sum_ws_tokens,
  max(bpe_tokens) as max_bpe_tokens
from t group by bucket
"""


def q41_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe exact distinct count (ext/skew.salted_distinct_count):
    distinct suppliers per order via two-stage salted aggregation —
    identical result to a plain count(distinct), but a hot key spreads
    over n_salts tasks."""
    li = load(spark, sf_dir, "lineitem")
    return skew.salted_distinct_count(li, "l_orderkey", "l_suppkey")


ORACLE_Q41 = """
select l_orderkey, cast(count(distinct l_suppkey) as bigint) as distinct_count
from lineitem group by l_orderkey
"""

def q42_row_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level drill-down diff (compare.row_diff, the exceptAll
    strengthening of EP2): source vs a filtered copy of orders; emits
    each missing row's key with its multiplicity."""
    from .compare import row_diff

    src_df = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    dst_df = src_df.where("o_orderkey % 97 != 0")
    missing, extra = row_diff(src_df, dst_df)
    return (
        missing.unionByName(extra)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_Q42 = """
with src as (select o_orderkey, o_custkey, o_orderstatus from orders),
     dst as (select * from src where o_orderkey % 97 != 0),
     d as (select * from src except all select * from dst)
select o_orderkey, count(*) as n from d group by o_orderkey
"""

def q43_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregation: 1-hour windows every 30
    minutes over events — each event lands in 2 overlapping windows via
    F.window, which Catalyst expands to a generator (no self-union).
    The streaming variant is the same grouping under a watermark."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("win_start"), "event_type", "cnt")
    )


ORACLE_Q43 = """
with hopped as (
  select time_bucket(interval 30 minute, ts) - interval 30 minute as win_start,
         event_type from events
  union all
  select time_bucket(interval 30 minute, ts) as win_start, event_type from events)
select win_start, event_type, count(*) as cnt
from hopped group by win_start, event_type
"""


def q44_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per status x priority, statuses as columns.
    Catalyst rewrites pivot into one pass of conditional aggregates —
    the same shape the hand-written oracle uses."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("cnt_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("cnt_o"),
            F.coalesce(F.col("P"), F.lit(0)).alias("cnt_p"),
        )
    )


ORACLE_Q44 = """
select o_orderpriority,
  cast(count(*) filter (o_orderstatus = 'F') as bigint) as cnt_f,
  cast(count(*) filter (o_orderstatus = 'O') as bigint) as cnt_o,
  cast(count(*) filter (o_orderstatus = 'P') as bigint) as cnt_p
from orders group by o_orderpriority
"""


def q45_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total (cumulative window frame) —
    partitioned window, so every customer's frame is independent and
    parallel."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


ORACLE_Q45 = """
select o_custkey, o_orderkey,
  cast(sum(cast(o_totalprice as decimal(12,2)))
       over (partition by o_custkey order by o_orderkey
             rows between unbounded preceding and current row) as double)
    as running_total
from orders
"""


def q46_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing of customers by balance within each segment
    (ntile window) + per-quartile aggregates."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("bal").desc(), F.col("c_custkey")
    )
    return (
        c.select("c_mktsegment", _dec("c_acctbal").alias("bal"), "c_custkey")
        .withColumn("quartile", F.ntile(4).over(w))
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("bal").cast("double").alias("min_bal"),
        )
    )


ORACLE_Q46 = """
with t as (
  select c_mktsegment, cast(c_acctbal as decimal(12,2)) as bal,
         ntile(4) over (partition by c_mktsegment
                        order by cast(c_acctbal as decimal(12,2)) desc, c_custkey)
           as quartile
  from customer)
select c_mktsegment, quartile, count(*) as cnt,
       cast(min(bal) as double) as min_bal
from t group by c_mktsegment, quartile
"""


def q47_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles of order totals per status (Spark `percentile`,
    the exact sort-based aggregate; percentile_approx is the sketch
    variant used at 100 TB, tested separately for closeness)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(cast(o_totalprice as double), 0.5)").alias("p50"),
        F.expr("percentile(cast(o_totalprice as double), 0.95)").alias("p95"),
    )


ORACLE_Q47 = """
select o_orderstatus,
  quantile_cont(cast(o_totalprice as double), 0.5) as p50,
  quantile_cont(cast(o_totalprice as double), 0.95) as p95
from orders group by o_orderstatus
"""


def q48_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog distinct users per event type at m=64
    registers — the same md5-register sketch as q194 but at a
    different accuracy point (~13% standard error vs 6.5%), so the
    whole parameterized estimator (rank base 55 vs 53, alpha at the
    m<128 end of the formula, a 64-entry linear-counting table) is
    oracle-checked, not just one constant configuration.

    Round 11 (VERDICT r10 #5): this slot spent ten rounds as a
    rows-only gate demonstrating Spark's NATIVE HLL++
    (approx_count_distinct, engine-internal estimate) — that demo
    lives on in pytest (test_ext.test_approx_distinct_close_to_exact),
    and the gate slot now earns a real oracle row."""
    from .ext import skew

    return skew.approx_distinct_hll(
        load(spark, sf_dir, "events"), "event_type", "user_id", m=64
    )


def q49_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the exact-Jaccard near-dup pairs
    (ext/graph.connected_components): transitive duplicate groups,
    each doc labeled with its canonical (minimum) member. Iterative
    min-label propagation — the oracle replays it as a recursive CTE."""
    from .ext import graph

    pairs = dedup.jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.8)
    return graph.dedup_groups(pairs)


ORACLE_Q49 = """
with recursive
docs as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
docs3 as (select * from docs where len(toks) >= 3),
sh as (
  select distinct doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] as shingle
  from docs3, unnest(range(1, len(toks) - 1)) t(i)),
sizes as (select doc_id, count(*) as n from sh group by doc_id),
common as (
  select a.doc_id as d1, b.doc_id as d2, count(*) as c
  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
  group by 1, 2),
pairs as (
  select d1, d2 from common
  join sizes na on na.doc_id = d1
  join sizes nb on nb.doc_id = d2
  where cast(c as double) / cast(na.n + nb.n - c as double) >= 0.8),
edges as (select d1 as a, d2 as b from pairs
          union all select d2, d1 from pairs),
reach(a, b) as (
  select a, b from edges
  union
  select r.a, e.b from reach r join edges e on r.b = e.a),
nodes as (select distinct a as node from edges)
select n.node as doc_id, least(n.node, min(r.b)) as keep_id
from nodes n left join reach r on r.a = n.node
group by n.node
"""

def q50_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone: the full training-corpus preparation pipeline as ONE
    lazy DataFrame graph — language filter (en) -> quality filter ->
    exact dedup (keep min doc_id per text) -> deterministic train/val/
    test split -> per-split counts and token totals. Catalyst fuses the
    narrow stages (lang + quality + split are one map over the scan);
    the only shuffles are the dedup groupBy and the final count."""
    docs = load(spark, sf_dir, "documents")
    lang = textops.language_id(docs).where(F.col("pred_lang") == "en")
    qual = textops.quality_score(docs).where(F.col("keep") == 1)
    kept = (
        docs.join(lang.select("doc_id"), "doc_id")
        .join(qual.select("doc_id", "n_tokens"), "doc_id")
    )
    deduped = kept.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.min("n_tokens").alias("n_tokens")
    )
    split = sampling.split_assign(
        deduped, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, method="knuth"
    )
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )


ORACLE_Q50 = """
with t as (
  select doc_id, text,
         list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
en as (
  select doc_id from documents
  where text like '% the %' or text like 'the %' or text like '% the'),
q as (
  select doc_id, cast(len(toks) as bigint) as n_tokens,
         cast(len(list_filter(toks, x -> x in ('the','a','of'))) as bigint) as stop_cnt
  from t),
keepq as (
  select doc_id, n_tokens from q
  where n_tokens >= 20 and n_tokens <= 1000
    and cast(stop_cnt as double) / cast(n_tokens as double) < 0.5),
kept as (
  select d.doc_id, d.text, k.n_tokens
  from documents d join en using (doc_id) join keepq k using (doc_id)),
dd as (
  select min(doc_id) as doc_id, min(n_tokens) as n_tokens
  from kept group by text),
s as (
  select case when mod(doc_id * 2654435761, 10000) < 8000 then 'train'
              when mod(doc_id * 2654435761, 10000) < 9000 then 'val'
              else 'test' end as split,
         n_tokens
  from dd)
select split, count(*) as n_docs, cast(sum(n_tokens) as bigint) as n_tokens
from s group by split
"""

def q51_batch_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched kNN (ext/similarity.knn_batch): top-3 cosine neighbors
    for five query vectors in one corpus scan; ranking windows partition
    by query id, so no global sort exists anywhere in the plan."""
    return similarity.knn_batch(
        load(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=3
    )


ORACLE_Q51 = """
with e as (
  select vec_id, list_transform(embedding, x -> cast(x as double)) as v
  from embeddings),
q as (select vec_id as query_id, v as qv from e where vec_id in (0,1,2,3,4)),
scored as (
  select q.query_id, e.vec_id,
    list_dot_product(e.v, q.qv) /
      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))
      as cos
  from e cross join q where e.vec_id <> q.query_id),
r as (
  select query_id, vec_id as neighbor_id,
         cast(row_number() over (partition by query_id
                                 order by cos desc, vec_id) as bigint) as rnk
  from scored)
select query_id, neighbor_id, rnk from r where rnk <= 3
"""

def q52_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day partition digests of events (compare.partition_checksums,
    md5 so DuckDB replays it bit-for-bit): the incremental-compare
    primitive — a mismatching day is the only slice a re-sync touches."""
    from .compare import partition_checksums

    # day as a midnight timestamp, not DATE: result bridges normalize
    # dates inconsistently (pandas renders one side date, one Timestamp)
    e = load(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date").cast("timestamp_ntz")
    )
    pc = partition_checksums(
        e.select("day", "event_id", "user_id", "event_type"),
        ["day"],
        algo="md5",
    )
    # hsum as string: decimal(38,0) would render as Decimal and hash-fail
    # against the DuckDB bridge's hugeint (the q28 rendering class).
    return pc.withColumn("hsum", F.col("hsum").cast("string"))


ORACLE_Q52 = """
with h as (
  select cast(cast(ts as date) as timestamp) as day,
         md5(concat_ws(chr(31), cast(event_id as varchar),
                       cast(user_id as varchar), event_type)) as hx
  from events)
select day, count(*) as cnt, min(hx) as hmin, max(hx) as hmax,
  cast(sum(cast(cast('0x' || substring(hx, 1, 15) as ubigint) as hugeint))
       as varchar) as hsum
from h group by 1
"""

def q53_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup (ext/dedup.normalized_dedup):
    casefold + whitespace collapse before hashing, so reformatted copies
    collapse into one group. Output keyed by min doc id (the hash column
    is engine-specific, so the gate compares the group structure)."""
    d = dedup.normalized_dedup(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "dup_count")


ORACLE_Q53 = """
select min(doc_id) as doc_id, count(*) as dup_count
from (select doc_id,
        lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) as norm
      from documents)
group by norm
"""

def q54_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition filter (ext/textops
    .repetition_stats): duplicate-token + duplicate-2-gram fractions and
    a keep flag, all narrow array math — scan-speed at 100 TB."""
    return textops.repetition_stats(load(spark, sf_dir, "documents"))


ORACLE_Q54 = """
with t as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') toks
  from documents),
b as (
  select doc_id,
    len(toks)::bigint n_tokens,
    len(list_distinct(toks))::bigint uniq_tokens,
    case when len(toks) >= 2
      then [toks[i] || ' ' || toks[i+1] for i in generate_series(1, len(toks)-1)]
      else [] end grams
  from t),
c as (
  select doc_id, n_tokens, uniq_tokens,
    len(grams)::bigint n_2grams,
    len(list_distinct(grams))::bigint uniq_2grams
  from b),
d as (
  select *,
    case when n_tokens > 0
      then 1.0 - uniq_tokens / cast(n_tokens as double) else 0.0 end dup_token_ratio,
    case when n_2grams > 0
      then 1.0 - uniq_2grams / cast(n_2grams as double) else 0.0 end dup_2gram_ratio
  from c)
select doc_id, n_tokens, uniq_tokens, n_2grams, uniq_2grams,
  dup_token_ratio, dup_2gram_ratio,
  cast(case when dup_token_ratio <= 0.6 and dup_2gram_ratio <= 0.05
       then 1 else 0 end as bigint) as keep
from d
"""


def q55_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate 3-grams by doc frequency (ext/textops
    .boilerplate_ngrams): per-doc distinct shingles -> one partial-agg
    count -> TakeOrderedAndProject top-k."""
    return textops.boilerplate_ngrams(
        load(spark, sf_dir, "documents"), min_docs=2, top_k=20
    )


ORACLE_Q55 = """
with t as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') toks
  from documents),
g as (
  select doc_id,
    list_distinct(case when len(toks) >= 3
      then [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
            for i in generate_series(1, len(toks)-2)]
      else [] end) grams
  from t),
e as (select unnest(grams) as gram from g)
select gram, count(*)::bigint as doc_freq
from e group by gram
having count(*) >= 2
order by doc_freq desc, gram
limit 20
"""


def q56_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (ext/textops.contamination_flags):
    flag corpus docs sharing any distinct 3-gram with a (small,
    broadcast) benchmark set — here the docs with doc_id < 20 stand in
    for an eval set."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") < 20)
    return textops.contamination_flags(docs, bench, min_overlap=1)


ORACLE_Q56 = """
with t as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') toks
  from documents),
g as (
  select doc_id,
    list_distinct(case when len(toks) >= 3
      then [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
            for i in generate_series(1, len(toks)-2)]
      else [] end) grams
  from t),
e as (select doc_id, unnest(grams) gram from g),
bench as (select distinct gram from e where doc_id < 20),
ov as (
  select e.doc_id, count(*)::bigint n_overlap
  from e join bench using (gram) group by e.doc_id)
select t.doc_id,
  cast(coalesce(ov.n_overlap, 0) as bigint) as n_overlap,
  cast(case when coalesce(ov.n_overlap, 0) >= 1 then 1 else 0 end as bigint)
    as contaminated
from t left join ov using (doc_id)
"""


def q57_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based rebalancing (ext/sampling.temperature_sample,
    alpha=0.5) over the LANGUAGE strata — the fixtures' langs are skewed
    (en dominates ~3:1) so the big ones really downsample; the smallest
    keeps 100%. knuth hash so DuckDB replays the kept set exactly."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.temperature_sample(
        d, "lang", "doc_id", alpha=0.5, method="knuth"
    )


ORACLE_Q57 = """
with c as (select lang, count(*) as n from documents group by lang),
r as (select lang, pow(cast(n as double), -0.5) as raw from c),
k as (select max(raw) as mx from r),
rt as (select lang,
              greatest(cast(floor(raw / mx * 10000) as bigint), 1)
                as keep_below
       from r cross join k)
select d.doc_id, d.lang
from documents d join rt using (lang)
where (d.doc_id * 2654435761) % 10000 < rt.keep_below
"""


def q58_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-5 vocabulary (ext/textops.vocab_topk): two-phase
    salted top-k so no task ever sorts a whole language's vocabulary."""
    return textops.vocab_topk(load(spark, sf_dir, "documents"), k=5)


ORACLE_Q58 = """
with t as (
  select lang,
         unnest(list_filter(string_split(trim(text), ' '), x -> x <> '')) as tok
  from documents),
c as (select lang, tok, count(*) as freq from t group by 1, 2),
r as (select lang, tok, freq,
        row_number() over (partition by lang order by freq desc, tok) as rnk
      from c)
select lang, tok, freq, cast(rnk as bigint) as rnk from r where rnk <= 5
"""


def q59_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming near-dup join over supplier names (ext/dedup
    .hamming_pairs, max_dist=2): PassJoin segment banding + codegen
    mismatch verify; DuckDB's hamming() replays the semantics exactly."""
    s = load(spark, sf_dir, "supplier")
    return dedup.hamming_pairs(s, col="s_name", max_dist=2, id_col="s_suppkey")


ORACLE_Q59 = """
select a.s_suppkey as d1, b.s_suppkey as d2,
       cast(hamming(a.s_name, b.s_name) as bigint) as dist
from supplier a
join supplier b
  on a.s_suppkey < b.s_suppkey
 and length(a.s_name) = length(b.s_name)
where case when length(a.s_name) = length(b.s_name)
           then hamming(a.s_name, b.s_name) else 3 end <= 2
"""


def q60_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 salient terms by tf x (N/df) (ext/textops
    .tfidf_topk). The idf factor is the plain ratio N/df — exact
    integer arithmetic plus one IEEE division, so the weight is
    bit-replayable cross-engine (ln() is not; ranking is unchanged
    since ln is monotone)."""
    return textops.tfidf_topk(load(spark, sf_dir, "documents"), k=3)


ORACLE_Q60 = """
with tf as (
  select doc_id, tok, cast(count(*) as bigint) as tf
  from (select doc_id,
               unnest(list_filter(string_split(trim(text), ' '), x -> x <> '')) as tok
        from documents)
  group by doc_id, tok),
dfreq as (select tok, cast(count(*) as bigint) as doc_freq from tf group by tok),
n as (select count(distinct doc_id) as n_docs from tf),
scored as (
  select tf.doc_id, tf.tok, tf.tf,
         cast(tf.tf * n.n_docs as double) / cast(dfreq.doc_freq as double) as weight
  from tf join dfreq using (tok) cross join n),
r as (select *, row_number() over (partition by doc_id order by weight desc, tok) as rnk
      from scored)
select doc_id, tok, tf, weight, cast(rnk as bigint) as rnk from r where rnk <= 3
"""


def q61_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota (ext/sampling.per_key_cap): keep the
    30 longest docs per source — the per-domain cap every crawl
    pipeline applies. Two-phase salted windows, so no task sorts a
    whole source."""
    d = load(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return sampling.per_key_cap(d, "source", "n_chars", "doc_id", cap=30).select(
        "source", "doc_id", "n_chars", "rnk"
    )


ORACLE_Q61 = """
select source, doc_id, n_chars, cast(rnk as bigint) as rnk from (
  select source, doc_id, n_chars,
         row_number() over (partition by source order by n_chars desc, doc_id) as rnk
  from documents)
where rnk <= 30
"""


def q62_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar quantization of the embedding store (ext/similarity
    .quantize_embeddings): global per-dim min/max codebook (one
    partial-agg row, broadcast back) + a codegen narrow map. Emitted
    exploded as (vec_id, i, code) so the gate compares scalars; the
    fixed single-IEEE-op chain makes codes bit-replayable cross-engine.
    test_ext.py bounds the recall cost of quantized kNN."""
    q = similarity.quantize_embeddings(load(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id", F.posexplode("codes").alias("i", "code")
    ).select(
        "vec_id",
        (F.col("i") + 1).cast("long").alias("i"),
        F.col("code").cast("long").alias("code"),
    )


ORACLE_Q62 = """
with e as (
  select vec_id, generate_subscripts(embedding, 1) as i,
         cast(unnest(embedding) as double) as x
  from embeddings),
stats as (select i, min(x) as mn, max(x) as mx from e group by i)
select e.vec_id, cast(e.i as bigint) as i,
  cast(case when s.mx > s.mn
            then least(255, greatest(0,
                 cast(round((e.x - s.mn) / ((s.mx - s.mn) / 255.0)) as int)))
            else 0 end as bigint) as code
from e join stats s using (i)
"""


def q63_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup (ext/dedup.minhash_dedup_pairs_cross): LSH
    near-dup pairs between a 'new batch' (odd doc_ids) and the
    'existing corpus' (even doc_ids). Candidates verified with exact
    Jaccard, so the result equals the exact cross all-pairs oracle
    whenever LSH recall catches every >=0.8 pair (verified on the
    deterministic fixtures at sf0.001 and sf0.01)."""
    docs = load(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 2 == 1)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    return dedup.minhash_dedup_pairs_cross(new, corpus, threshold=0.8)


ORACLE_Q63 = """
with docs as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
docs3 as (select * from docs where len(toks) >= 3),
sh as (
  select distinct doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] as shingle
  from docs3, unnest(range(1, len(toks) - 1)) t(i)),
sizes as (select doc_id, count(*) as n from sh group by doc_id),
common as (
  select a.doc_id as new_id, b.doc_id as corpus_id, count(*) as c
  from sh a join sh b on a.shingle = b.shingle
  where a.doc_id % 2 = 1 and b.doc_id % 2 = 0
  group by 1, 2)
select new_id, corpus_id,
  cast(c as double) / cast(na.n + nb.n - c as double) as jacc
from common
join sizes na on na.doc_id = new_id
join sizes nb on nb.doc_id = corpus_id
where cast(c as double) / cast(na.n + nb.n - c as double) >= 0.8
"""


def q64_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (ext/textops.redact_pii): email + long-digit-run
    redaction with per-doc counts. The fixtures contain no PII, so the
    gate proves the rewrite is bit-stable cross-engine (passthrough +
    zero counts); test_ext.py drives synthetic positives."""
    return textops.redact_pii(load(spark, sf_dir, "documents"))


ORACLE_Q64 = """
select doc_id,
  regexp_replace(
    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
    '[0-9]{9,}', '<NUM>', 'g') as clean_text,
  cast(len(regexp_extract_all(text,
       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) as bigint) as n_emails,
  cast(len(regexp_extract_all(
       regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                      '<EMAIL>', 'g'),
       '[0-9]{9,}')) as bigint) as n_longnums
from documents
"""


def q65_merge_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CDC merge (compare.merge_snapshot): a deterministic update
    batch — repriced rows (o_orderkey % 97 = 0, price doubled) plus
    synthetic inserts (keys shifted by 10M for o_orderkey % 499 = 0) —
    merged over the orders snapshot. Updates win on collision, inserts
    append, untouched rows pass through."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    updates = o.where(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey", "o_custkey", (F.col("o_totalprice") * 2).alias("o_totalprice")
    )
    inserts = o.where(F.col("o_orderkey") % 499 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
    )
    return compare.merge_snapshot(o, updates.unionByName(inserts), ["o_orderkey"])


ORACLE_Q65 = """
with o as (select o_orderkey, o_custkey, o_totalprice from orders),
upd as (
  select o_orderkey, o_custkey, o_totalprice * 2 as o_totalprice
  from o where o_orderkey % 97 = 0
  union all
  select o_orderkey + 10000000, o_custkey, o_totalprice
  from o where o_orderkey % 499 = 0)
select * from o where o_orderkey not in (select o_orderkey from upd)
union all
select * from upd
"""


def q66_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null/cardinality profile of orders
    (compare.table_profile): one aggregate pass, exploded to one row
    per column."""
    return compare.table_profile(load(spark, sf_dir, "orders"))


ORACLE_Q66 = """
select 'o_orderkey' as col_name, count(*) - count(o_orderkey) as n_nulls,
       count(distinct o_orderkey) as n_distinct from orders
union all
select 'o_custkey', count(*) - count(o_custkey), count(distinct o_custkey) from orders
union all
select 'o_orderstatus', count(*) - count(o_orderstatus), count(distinct o_orderstatus) from orders
union all
select 'o_totalprice', count(*) - count(o_totalprice), count(distinct o_totalprice) from orders
union all
select 'o_orderdate', count(*) - count(o_orderdate), count(distinct o_orderdate) from orders
union all
select 'o_orderpriority', count(*) - count(o_orderpriority), count(distinct o_orderpriority) from orders
"""


def q67_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit (compare.fk_orphans) over the
    fixture FK graph: orphan counts per relation (all 0 on clean
    fixtures — the audit proving it) plus one deliberately-broken
    relation (lineitem filtered to half the orders) showing non-zero."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    half_orders = o.where(F.col("o_orderkey") % 2 == 0)
    checks = [
        compare.fk_orphans(li, o, "l_orderkey", "o_orderkey", "lineitem_orders"),
        compare.fk_orphans(o, c, "o_custkey", "c_custkey", "orders_customer"),
        compare.fk_orphans(
            li, half_orders, "l_orderkey", "o_orderkey", "lineitem_half_orders"
        ),
    ]
    out = checks[0]
    for x in checks[1:]:
        out = out.unionByName(x)
    return out


ORACLE_Q67 = """
select 'lineitem_orders' as fk_name,
       cast(count(*) filter (where l_orderkey not in
            (select o_orderkey from orders)) as bigint) as n_orphans
from lineitem where l_orderkey is not null
union all
select 'orders_customer',
       cast(count(*) filter (where o_custkey not in
            (select c_custkey from customer)) as bigint)
from orders where o_custkey is not null
union all
select 'lineitem_half_orders',
       cast(count(*) filter (where l_orderkey not in
            (select o_orderkey from orders where o_orderkey % 2 = 0)) as bigint)
from lineitem where l_orderkey is not null
"""


def q68_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing (ext/sampling.pack_sequences): fill
    2000-char training sequences with whole documents, first-fit in
    doc_id order within 8 shards. The oracle replays the same
    recurrence as a DuckDB recursive CTE — packing is the one operator
    here whose semantics are inherently sequential, so the gate proves
    the sharded applyInPandas path preserves them exactly."""
    d = load(spark, sf_dir, "documents")
    return sampling.pack_sequences(
        d, id_col="doc_id", cost_col="n_chars", budget=2000, n_shards=8
    )


ORACLE_Q68 = """
with recursive docs as (
  select doc_id, n_chars, doc_id % 8 as shard,
         row_number() over (partition by doc_id % 8 order by doc_id) as rn
  from documents),
pack as (
  select shard, rn, doc_id, n_chars, cast(0 as bigint) as seq_id,
         n_chars as fill
  from docs where rn = 1
  union all
  select d.shard, d.rn, d.doc_id, d.n_chars,
         case when p.fill + d.n_chars > 2000 then p.seq_id + 1 else p.seq_id end,
         case when p.fill + d.n_chars > 2000 then d.n_chars
              else p.fill + d.n_chars end
  from pack p join docs d on d.shard = p.shard and d.rn = p.rn + 1)
select cast(shard as bigint) as shard, seq_id,
       cast(doc_id as bigint) as doc_id, cast(n_chars as bigint) as n_chars,
       cast(fill - n_chars as bigint) as offset
from pack
"""


def q69_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-threshold length filter (ext/sampling.percentile_filter):
    drop the shortest quartile of the corpus. Exact percentile of an
    integer metric interpolates between small integers, so the double
    threshold is bit-identical to DuckDB's quantile_cont."""
    d = load(spark, sf_dir, "documents")
    return sampling.percentile_filter(d, "n_chars", p=0.25, keep="upper").select(
        "doc_id", "n_chars", "threshold"
    )


ORACLE_Q69 = """
select doc_id, n_chars, thr as threshold
from documents
cross join (select quantile_cont(n_chars, 0.25) as thr from documents)
where n_chars >= thr
"""


def q70_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-type hourly grid over events with forward fill
    (ext/asof.gap_fill): every hour between each type's first and last
    event, LOCF for silent hours — the gap-fill + last-observation pass
    ahead of any fixed-step time-series model."""
    e = load(spark, sf_dir, "events")
    out = asof.gap_fill(e, "event_type", "ts", "value", unit="hour")
    return out.select(
        "event_type",
        "bucket",
        F.col("observed").cast("long").alias("observed"),
        "value_ffill",
    )


ORACLE_Q70 = """
with b as (
  select event_type, cast(date_trunc('hour', ts) as timestamp) as bucket,
         cast(sum(cast(value as decimal(12,2))) as decimal(22,2)) as s
  from events group by 1, 2),
spine as (
  select event_type,
         unnest(generate_series(min(bucket), max(bucket), interval 1 hour))
           as bucket
  from b group by event_type),
j as (
  select spine.event_type, spine.bucket, b.s
  from spine left join b
    on spine.event_type = b.event_type and spine.bucket = b.bucket)
select event_type, bucket,
       cast(s is not null as bigint) as observed,
       cast(last_value(s ignore nulls) over (
            partition by event_type order by bucket
            rows between unbounded preceding and current row) as double)
         as value_ffill
from j
"""


def q71_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global exact span dedup with reassembly (ext/dedup.span_dedup,
    5-token spans): every distinct span survives once at its first
    (doc_id, pos) location; documents are rebuilt from surviving spans.
    The oracle encodes the first-owner rule as min(doc_id*1e6 + pos) —
    identical to the struct-min for in-range ids."""
    d = load(spark, sf_dir, "documents")
    return dedup.span_dedup(d, span_tokens=5)


ORACLE_Q71 = """
with toks as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') as t
  from documents),
ex as (
  select doc_id, i as pos, array_to_string(t[(i*5+1):(i*5+5)], ' ') as span
  from toks, unnest(range(cast(ceil(len(t) / 5.0) as bigint))) as u(i)),
kept as (
  select span, min(doc_id * 1000000 + pos) as ok from ex group by span),
reb as (
  select ok // 1000000 as doc_id,
         cast(count(*) as bigint) as n_kept,
         string_agg(span, ' ' order by ok % 1000000) as new_text
  from kept group by 1),
n as (select doc_id, cast(ceil(len(t) / 5.0) as bigint) as n_spans from toks)
select n.doc_id, n.n_spans,
       coalesce(reb.n_kept, 0) as n_kept,
       coalesce(reb.new_text, '') as new_text
from n left join reb using (doc_id)
"""


def q72_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key profile of orders.o_custkey (ext/skew.key_skew_stats):
    the measurement pass that decides whether a downstream join needs
    salting. Top-10 heaviest customers with share and skew factor."""
    o = load(spark, sf_dir, "orders")
    return skew.key_skew_stats(o, "o_custkey", top_k=10)


ORACLE_Q72 = """
with counts as (select o_custkey, count(*) as cnt from orders group by 1),
tot as (select cast(sum(cnt) as bigint) as total,
               cast(count(*) as bigint) as nk
        from counts)
select o_custkey, cast(cnt as bigint) as cnt, total as total_rows,
       nk as n_keys,
       cast(cnt as double) / cast(total as double) as share,
       cast(cnt * nk as double) / cast(total as double) as skew_factor
from counts cross join tot
order by cnt desc, o_custkey
limit 10
"""


def q73_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocation mining (ext/textops.collocations): top-20
    adjacent bigrams by PMI kept as the rational p(xy)/(p(x)p(y)) —
    exact bigint products divided once into a double, so the score is
    engine-portable and the ranking equals the ln() formulation."""
    return textops.collocations(
        load(spark, sf_dir, "documents"), min_count=3, top_k=20
    )


ORACLE_Q73 = """
with toks as (
  select list_filter(string_split(trim(text), ' '), x -> x <> '') as t
  from documents),
uni as (
  select tok as w, count(*) as c
  from (select unnest(t) as tok from toks) group by 1),
bi as (
  select w1, w2, count(*) as c_xy
  from (select t[i] as w1, t[i+1] as w2
        from toks, unnest(range(1, len(t))) as u(i))
  group by 1, 2),
tot as (
  select (select cast(sum(c) as bigint) from uni) as nu,
         (select cast(sum(c_xy) as bigint) from bi) as nb),
scored as (
  select w1, w2, cast(c_xy as bigint) as c_xy,
         ((cast(c_xy as double) * cast(nu as double)) * cast(nu as double))
         / ((cast(nb as double) * cast(ux.c as double)) * cast(uy.c as double))
           as pmi
  from bi
  join uni ux on ux.w = bi.w1
  join uni uy on uy.w = bi.w2
  cross join tot
  where c_xy >= 3)
select w1, w2, c_xy, pmi,
       cast(row_number() over (order by pmi desc, w1, w2) as bigint) as rnk
from scored order by pmi desc, w1, w2 limit 20
"""


def q74_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-filtered kNN / hybrid search (ext/similarity.filtered_knn):
    top-10 cosine neighbors of vec 0 restricted to German documents —
    the metadata-filter-then-rank shape. The candidate prune is a
    left_semi join BEFORE any dot product runs."""
    emb = load(spark, sf_dir, "embeddings")
    allowed = (
        load(spark, sf_dir, "documents")
        .where(F.col("lang") == "de")
        .select("doc_id")
    )
    return similarity.filtered_knn(emb, allowed, query_id=0, k=10)


ORACLE_Q74 = """
with q as (select embedding as qe from embeddings where vec_id = 0),
allowed as (select doc_id from documents where lang = 'de'),
scored as (
  select vec_id,
         list_cosine_similarity(list_transform(embedding, x -> cast(x as double)),
                                list_transform(qe,        x -> cast(x as double))) as cos
  from embeddings join allowed on embeddings.vec_id = allowed.doc_id
  cross join q
  where vec_id <> 0)
select vec_id as neighbor_id,
       row_number() over (order by cos desc, vec_id) as rnk
from scored order by cos desc, vec_id limit 10
"""


def q75_dedup_shrink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-shrink audit — the full near-dup dedup pipeline composed
    end-to-end: LSH candidate pairs (ext/dedup.minhash_dedup_pairs) ->
    transitive duplicate groups (ext/graph.dedup_groups) -> canonical
    keep -> per-source reduction stats. The number every dedup run
    reports: how much of each source survives."""
    from .ext import graph

    docs = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.8).select("d1", "d2")
    groups = graph.dedup_groups(pairs)
    flagged = docs.join(groups, "doc_id", "left")
    kept = F.when(
        F.col("keep_id").isNull() | (F.col("keep_id") == F.col("doc_id")), 1
    ).otherwise(0)
    out = flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(kept).cast("long").alias("n_kept"),
    )
    return out.select(
        "source",
        "n_docs",
        "n_kept",
        (F.col("n_docs") - F.col("n_kept")).cast("long").alias("n_dropped"),
        (
            (F.col("n_docs") - F.col("n_kept")).cast("double")
            / F.col("n_docs").cast("double")
        ).alias("shrink_pct"),
    )


# Same shingle/pair/component CTEs as ORACLE_Q49 (minhash LSH + exact
# verify reproduces the exact-Jaccard pair set — see q20), then the
# per-source keep aggregation.
ORACLE_Q75 = """
with recursive
docs as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
docs3 as (select * from docs where len(toks) >= 3),
sh as (
  select distinct doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] as shingle
  from docs3, unnest(range(1, len(toks) - 1)) t(i)),
sizes as (select doc_id, count(*) as n from sh group by doc_id),
common as (
  select a.doc_id as d1, b.doc_id as d2, count(*) as c
  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
  group by 1, 2),
pairs as (
  select d1, d2 from common
  join sizes na on na.doc_id = d1
  join sizes nb on nb.doc_id = d2
  where cast(c as double) / cast(na.n + nb.n - c as double) >= 0.8),
edges as (select d1 as a, d2 as b from pairs
          union all select d2, d1 from pairs),
reach(a, b) as (
  select a, b from edges
  union
  select r.a, e.b from reach r join edges e on r.b = e.a),
nodes as (select distinct a as node from edges),
groups as (
  select n.node as doc_id, least(n.node, min(r.b)) as keep_id
  from nodes n left join reach r on r.a = n.node
  group by n.node),
agg as (
  select d.source,
         cast(count(*) as bigint) as n_docs,
         cast(sum(case when g.keep_id is null or g.keep_id = d.doc_id
                       then 1 else 0 end) as bigint) as n_kept
  from documents d left join groups g using (doc_id)
  group by d.source)
select source, n_docs, n_kept,
       cast(n_docs - n_kept as bigint) as n_dropped,
       cast(n_docs - n_kept as double) / cast(n_docs as double) as shrink_pct
from agg
"""


def q76_group_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source z-score + min-max normalization of document length
    (ext/features.normalize_by_group). The doubles derive from exact
    integer sums + one IEEE sqrt, so DuckDB replays them bit-for-bit —
    built-in stddev aggregates would not (engine-specific merge
    order)."""
    from .ext import features

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return features.normalize_by_group(d, "source", "n_chars")


ORACLE_Q76 = """
-- n*ss - sm^2 is computed EXACTLY in hugeint (mirroring the engine's
-- decimal(38,0)) before the one double cast: the double-side
-- subtraction catastrophically cancels for large means (code-review
-- r12)
with st as (
  select source,
         cast(count(*) as hugeint) as n,
         cast(sum(cast(n_chars as hugeint)) as hugeint) as sm,
         sum(cast(n_chars as hugeint) * cast(n_chars as hugeint)) as ss,
         cast(min(n_chars) as bigint) as mn,
         cast(max(n_chars) as bigint) as mx
  from documents group by source)
select d.doc_id, d.source, d.n_chars,
       case when st.n > 1 and (st.ss * st.n - st.sm * st.sm) > 0
            then (cast(d.n_chars as double)
                  - cast(st.sm as double) / cast(st.n as double))
                 / sqrt(cast(st.ss * st.n - st.sm * st.sm as double)
                        / (cast(st.n as double)
                           * (cast(st.n as double) - 1.0)))
       end as zscore,
       case when st.mx > st.mn
            then (cast(d.n_chars as double) - cast(st.mn as double))
                 / (cast(st.mx as double) - cast(st.mn as double))
            else 0.0 end as minmax
from documents d join st on d.source is not distinct from st.source
"""


def q77_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency rarity scoring (ext/textops.rarity_score): a
    unigram-LM stand-in — per-doc total/mean corpus frequency of its
    tokens. mean_freq is one division of exact longs (bit-portable)."""
    return textops.rarity_score(load(spark, sf_dir, "documents"))


ORACLE_Q77 = """
with toks as (
  select doc_id, unnest(list_filter(string_split(trim(text), ' '), x -> x <> '')) as tok
  from documents),
vocab as (select tok, cast(count(*) as bigint) as freq from toks group by tok)
select t.doc_id,
       cast(count(*) as bigint) as n_tokens,
       cast(sum(v.freq) as bigint) as sum_freq,
       cast(sum(v.freq) as double) / cast(count(*) as double) as mean_freq
from toks t join vocab v using (tok)
group by t.doc_id
"""


def q78_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing (ext/sampling.budget_mix): admit docs
    per source in Knuth-hash order until the source's token budget is
    spent. Budgets chosen to cut every fixture source mid-stream."""
    return sampling.budget_mix(
        load(spark, sf_dir, "documents"),
        "source",
        {"web": 20_000, "wiki": 10_000, "books": 5_000},
        "doc_id",
    )


ORACLE_Q78 = """
with base as (
  select doc_id, source,
         cast(len(list_filter(string_split(trim(text), ' '), x -> x <> '')) as bigint)
           as n_tokens,
         (doc_id * 2654435761) % 10000 as bucket,
         case source when 'web' then 20000 when 'wiki' then 10000
                     when 'books' then 5000 end as budget
  from documents),
cum as (
  select doc_id, source, n_tokens, budget,
         cast(sum(n_tokens) over (partition by source
                                  order by bucket, doc_id
                                  rows unbounded preceding) as bigint) as cum_tokens
  from base where budget is not null)
select doc_id, source, n_tokens, cum_tokens
from cum where cum_tokens <= budget
"""


def q79_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid outliers (ext/similarity.centroid_outliers):
    the 10 vectors farthest by cosine from their own label's centroid.
    Centroids sum as decimal(38,12) — order-insensitive exact — so
    DuckDB replays them bit-identically; the output carries no float."""
    return similarity.centroid_outliers(load(spark, sf_dir, "embeddings"), top_n=10)


ORACLE_Q79 = """
with e as (select vec_id, label,
                  list_transform(embedding, x -> cast(x as double)) as v
           from embeddings),
elems as (
  select vec_id, label, i as pos, v[i] as x
  from e, lateral unnest(generate_series(1, len(v))) as t(i)),
sums as (
  select label, pos,
         sum(cast(x as decimal(38,12))) as s, count(*) as n
  from elems group by label, pos),
cent as (
  select label, list(cast(s as double) / n order by pos) as centroid
  from sums group by label),
scored as (
  select e.vec_id, e.label,
         list_cosine_similarity(e.v, c.centroid) as cos
  from e join cent c using (label))
select vec_id, label, row_number() over (order by cos asc, vec_id) as rnk
from scored order by cos asc, vec_id limit 10
"""


def q80_merge_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge with deletes (compare.merge_cdc): a synthetic change
    batch over supplier — one update, one delete, one insert, plus a
    same-key insert-then-delete that must net out to absence via the
    seq ordering. Snapshot out."""
    from .compare import merge_cdc

    sup = load(spark, sf_dir, "supplier")
    changes = spark.createDataFrame(
        [
            (1, "UPDATED NAME", "U", 10),
            (2, None, "D", 11),
            (900001, "BRAND NEW", "I", 12),
            (900002, "EPHEMERAL", "I", 13),
            (900002, None, "D", 14),  # later seq: delete wins
        ],
        "s_suppkey long, s_name string, op string, seq long",
    )
    base = sup.select("s_suppkey", "s_name")
    ch = changes.select("s_suppkey", "s_name", "op", "seq")
    return merge_cdc(base, ch, ["s_suppkey"], op_col="op", seq_col="seq")


ORACLE_Q80 = """
with changes(s_suppkey, s_name, op, seq) as (values
  (1, 'UPDATED NAME', 'U', 10),
  (2, NULL, 'D', 11),
  (900001, 'BRAND NEW', 'I', 12),
  (900002, 'EPHEMERAL', 'I', 13),
  (900002, NULL, 'D', 14)),
latest as (
  select s_suppkey, s_name, op
  from (select *, row_number() over (partition by s_suppkey
                                     order by seq desc) rn from changes)
  where rn = 1),
kept as (
  select s.s_suppkey, s.s_name from supplier s
  where s.s_suppkey not in (select s_suppkey from latest))
select cast(s_suppkey as bigint) as s_suppkey, s_name from kept
union all
select cast(s_suppkey as bigint), s_name from latest where op <> 'D'
"""


def q81_char_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language char-trigram profile (ext/textops.char_ngram_profile)
    — the training side of n-gram language-ID; top-20 per language via
    salted two-phase windows."""
    return textops.char_ngram_profile(load(spark, sf_dir, "documents"))


ORACLE_Q81 = """
with grams as (
  select lang, unnest(list_transform(
           generate_series(1, greatest(length(text) - 2, 0)),
           i -> text[i : i + 2])) as gram
  from documents where length(text) >= 3),
freq as (select lang, gram, cast(count(*) as bigint) as freq
         from grams group by lang, gram),
ranked as (
  select lang, gram, freq,
         row_number() over (partition by lang
                            order by freq desc, gram) as rnk
  from freq)
select lang, gram, freq, cast(rnk as bigint) as rnk
from ranked where rnk <= 20
"""


def q82_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (ext/sampling.chunk_documents): 64-token
    windows with 8-token overlap — context-window preparation. One
    narrow map per doc + one posexplode; no per-token explode."""
    return sampling.chunk_documents(load(spark, sf_dir, "documents"))


ORACLE_Q82 = """
with base as (
  select doc_id,
         list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
sized as (select doc_id, toks, len(toks) as n from base where len(toks) > 0),
chunks as (
  select doc_id,
         cast(s.i as bigint) // 56 as chunk_id,
         toks[s.i + 1 : s.i + 64] as ctoks
  from sized, lateral unnest(generate_series(0, greatest(n - 8 - 1, 0), 56)) as s(i))
select doc_id, chunk_id,
       cast(len(ctoks) as bigint) as n_tokens,
       list_aggregate(ctoks, 'string_agg', ' ') as chunk_text
from chunks where len(ctoks) > 0
"""


def q83_hamming_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table Hamming join (ext/dedup.hamming_join): odd-key
    suppliers linked to even-key suppliers whose names differ in at
    most ONE character position — the record-linkage shape (new batch
    vs master list); max_dist=1 keeps the gate selective (fixture
    names differ in their trailing digits). Banded candidates, codegen
    verify; the oracle is the exact quadratic cross join, feasible at
    gate SF."""
    sup = load(spark, sf_dir, "supplier")
    l = sup.where("s_suppkey % 2 = 1").select("s_suppkey", "s_name")
    r = sup.where("s_suppkey % 2 = 0").select("s_suppkey", "s_name")
    return dedup.hamming_join(
        l, r, col="s_name", max_dist=1, id_col="s_suppkey"
    )


ORACLE_Q83 = """
select l.s_suppkey as left_id, r.s_suppkey as right_id,
       cast(len(list_filter(
         list_zip(string_split(l.s_name, ''), string_split(r.s_name, '')),
         p -> p[1] is distinct from p[2])) as bigint) as dist
from supplier l join supplier r
  on l.s_suppkey % 2 = 1 and r.s_suppkey % 2 = 0
 and len(l.s_name) = len(r.s_name)
where len(list_filter(
        list_zip(string_split(l.s_name, ''), string_split(r.s_name, '')),
        p -> p[1] is distinct from p[2])) <= 1
"""


def q84_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-filter verdict report (ext/textops.corpus_filter_report):
    per-doc lang/quality/repetition flags, combined keep, and the first
    failing gate as the reason — one codegen map, zero shuffles."""
    return textops.corpus_filter_report(load(spark, sf_dir, "documents"))


ORACLE_Q84 = """
with m as (
  select doc_id, text,
         list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
f as (
  select doc_id,
         len(toks) as n,
         len(list_filter(toks, x -> x in ('the','a','of'))) as stop_cnt,
         len(list_distinct(toks)) as uniq,
         case when len(toks) >= 2
              then len(toks) - 1 else 0 end as n2,
         case when len(toks) >= 2
              then len(list_distinct(list_transform(
                     generate_series(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i + 1])))
              else 0 end as uniq2,
         (text like '% the %' or text like 'the %' or text like '% the')
           as en
  from m),
v as (
  select doc_id,
         cast(case when en then 1 else 0 end as bigint) as is_en,
         cast(case when n >= 20 and n <= 1000
                    and (case when n > 0
                         then cast(stop_cnt as double) / n else 0.0 end) < 0.5
              then 1 else 0 end as bigint) as q_keep,
         cast(case when
                (case when n > 0
                      then 1.0 - cast(uniq as double) / n else 0.0 end) <= 0.6
                and
                (case when n2 > 0
                      then 1.0 - cast(uniq2 as double) / n2 else 0.0 end) <= 0.05
              then 1 else 0 end as bigint) as rep_keep
  from f)
select doc_id, is_en, q_keep, rep_keep,
       cast(case when is_en = 1 and q_keep = 1 and rep_keep = 1
            then 1 else 0 end as bigint) as keep,
       case when is_en = 0 then 'lang'
            when q_keep = 0 then 'quality'
            when rep_keep = 0 then 'repetition' end as reason
from v
"""


def q85_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable KMV approximate-distinct (ext/skew.approx_distinct_kmv):
    distinct users per event type via a k-minimum-values sketch over the
    md5-derived 60-bit hash — unlike q48's HLL++ (engine-internal,
    rows-only), the KMV estimate replays EXACTLY in DuckDB, so the
    approximate answer itself is oracle-checked."""
    from .ext import skew

    return skew.approx_distinct_kmv(
        load(spark, sf_dir, "events"), "event_type", "user_id", k=64
    )


ORACLE_Q85 = """
with d as (
  select event_type as grp,
         cast('0x' || substring(md5(cast(user_id as varchar)), 1, 15) as bigint) as h
  from events where user_id is not null
  group by 1, 2),
r as (select grp, h, row_number() over (partition by grp order by h) as rn from d)
select grp as event_type,
       cast(case when max(rn) < 64 then max(rn)
            else floor(63.0 * 1152921504606846976.0
                       / max(case when rn = 64 then h end))
            end as bigint) as n_distinct
from r where rn <= 64 group by grp
"""


def q86_ivf_batch_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched IVF ANN (ext/similarity.ivf_search_batch): top-5
    neighbors for 4 query vectors through the seed-centroid index,
    nprobe=3 of 8 clusters — one corpus pass for the whole batch."""
    return similarity.ivf_search_batch(
        load(spark, sf_dir, "embeddings"),
        query_ids=[100, 101, 102, 103],
        k=5,
        nprobe=3,
    )


ORACLE_Q86 = """
with c as (select vec_id as cid,
                  list_transform(embedding, x -> cast(x as double)) as cv
           from embeddings where vec_id < 8),
v as (select vec_id, list_transform(embedding, x -> cast(x as double)) as vv
      from embeddings),
assign as (
  select vec_id, cid as centroid_id from (
    select v.vec_id, c.cid,
           row_number() over (partition by v.vec_id
                              order by list_cosine_similarity(vv, cv) desc, c.cid) rn
    from v, c) where rn = 1),
q as (select vec_id as query_id, vv as qv from v
      where vec_id in (100, 101, 102, 103)),
probes as (
  select query_id, qv, cid from (
    select q.query_id, q.qv, c.cid,
           row_number() over (partition by q.query_id
                              order by list_cosine_similarity(qv, cv) desc, c.cid) pr
    from q, c) where pr <= 3),
scored as (
  select p.query_id, v.vec_id,
         list_cosine_similarity(v.vv, p.qv) as cos
  from v join assign a using (vec_id)
         join probes p on a.centroid_id = p.cid
  where v.vec_id <> p.query_id)
select query_id, vec_id as neighbor_id,
       cast(rn as bigint) as rnk
from (select query_id, vec_id, cos,
             row_number() over (partition by query_id
                                order by cos desc, vec_id) rn
      from scored)
where rn <= 5
"""


def q87_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture planning view (ext/sampling.mixture_report):
    per-source doc/token counts, token share, and delta to a target
    mixture — what a curator reads before setting budget_mix budgets."""
    return sampling.mixture_report(
        load(spark, sf_dir, "documents"),
        "source",
        {"web": 0.5, "wiki": 0.3, "books": 0.2},
    )


ORACLE_Q87 = """
with per as (
  select source as grp,
         cast(count(*) as bigint) as n_docs,
         cast(sum(len(list_filter(string_split(trim(text), ' '),
                                  x -> x <> ''))) as bigint) as n_tokens
  from documents group by source),
tot as (select sum(n_tokens) as t from per)
select grp as source, n_docs, n_tokens,
       cast(n_tokens as double) / cast(t as double) as token_share,
       case grp when 'web' then 0.5 when 'wiki' then 0.3
                when 'books' then 0.2 end as target_share,
       cast(n_tokens as double) / cast(t as double)
         - case grp when 'web' then 0.5 when 'wiki' then 0.3
                    when 'books' then 0.2 end as delta
from per, tot
"""


def q88_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion view -> click -> purchase
    (ext/asof.funnel_conversion): users completing each prefix of the
    funnel in first-occurrence order. One groupBy(user) of conditional
    min-timestamps — no window over raw events, no self-join."""
    from .ext import asof

    return asof.funnel_conversion(
        load(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


ORACLE_Q88 = """
with per_user as (
  select user_id,
         min(case when event_type = 'view' then ts end) as t0,
         min(case when event_type = 'click' then ts end) as t1,
         min(case when event_type = 'purchase' then ts end) as t2
  from events group by user_id),
flags as (
  select user_id,
         case when t0 is not null then 1 else 0 end as h1,
         case when t0 is not null and t1 is not null and t1 >= t0
              then 1 else 0 end as h2,
         case when t0 is not null and t1 is not null and t1 >= t0
               and t2 is not null and t2 >= t1 then 1 else 0 end as h3
  from per_user)
select 1 as step_idx, 'view' as step, cast(sum(h1) as bigint) as n_users from flags
union all
select 2, 'click', cast(sum(h2) as bigint) from flags
union all
select 3, 'purchase', cast(sum(h3) as bigint) from flags
"""


def q89_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-grain retention cohorts (ext/asof.retention_cohorts): users
    bucketed by first-seen day, counted on each later active day. One
    distinct pass over raw events; everything after is bounded by
    users x active-days."""
    from .ext import asof

    return asof.retention_cohorts(load(spark, sf_dir, "events"))


ORACLE_Q89 = """
with daily as (
  select distinct user_id as u, cast(ts as date) as d from events),
first as (select u, min(d) as cohort_day from daily group by u)
select f.cohort_day,
       cast(date_diff('day', f.cohort_day, daily.d) as bigint) as day_offset,
       cast(count(*) as bigint) as n_users
from daily join first f using (u)
group by f.cohort_day, day_offset
"""


def q90_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson PPS sample (ext/sampling.pps_sample): expected-100-doc
    sample with inclusion probability proportional to n_chars, in pure
    int64 arithmetic — the APPROXIMATE-design sample is itself
    oracle-checkable (no ln/pow, unlike A-ES exponential keys)."""
    return sampling.pps_sample(
        load(spark, sf_dir, "documents"), "n_chars", k=100
    )


ORACLE_Q90 = """
with tot as (select sum(cast(n_chars as bigint)) as wt from documents),
s as (
  select doc_id,
         cast(n_chars as bigint) as weight,
         cast(least(cast(1073741824 as bigint),
                    (100 * cast(n_chars as bigint) * 1073741824) // wt)
              as bigint) as keep_threshold,
         cast(cast('0x' || substring(md5('pps|' || cast(doc_id as varchar)),
                                     1, 15) as ubigint) as bigint) >> 30 as u
  from documents, tot)
select doc_id, weight, keep_threshold from s where u < keep_threshold
"""


def q91_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank (ext/graph.pagerank), 3 iterations
    over the bipartite customer->supplier graph induced by orders x
    lineitem. Exact bigint arithmetic makes the iterative ranks replay
    bit-identically in the unrolled-CTE oracle — the float formulation
    could not be hash-compared across engines."""
    from .ext import graph

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    pr = graph.pagerank(edges, n_iters=3)
    return pr.select("node", F.col("rank").alias("pr_rank"))


ORACLE_Q91 = """
with e as (
  select distinct 'c:' || cast(o_custkey as varchar) as src,
                  's:' || cast(l_suppkey as varchar) as dst
  from orders join lineitem on o_orderkey = l_orderkey),
nodes as (select src as n from e union select dst from e),
deg as (select src, cast(count(*) as bigint) as d from e group by src),
r0 as (select n, cast(1000000000000 as bigint) as r from nodes),
s1 as (select e.dst as n, sum(r0.r // deg.d) as s
       from e join r0 on r0.n = e.src join deg on deg.src = e.src
       group by e.dst),
r1 as (select nodes.n,
              cast(150000000000 + (85 * coalesce(s1.s, 0)) // 100 as bigint) as r
       from nodes left join s1 on s1.n = nodes.n),
s2 as (select e.dst as n, sum(r1.r // deg.d) as s
       from e join r1 on r1.n = e.src join deg on deg.src = e.src
       group by e.dst),
r2 as (select nodes.n,
              cast(150000000000 + (85 * coalesce(s2.s, 0)) // 100 as bigint) as r
       from nodes left join s2 on s2.n = nodes.n),
s3 as (select e.dst as n, sum(r2.r // deg.d) as s
       from e join r2 on r2.n = e.src join deg on deg.src = e.src
       group by e.dst),
r3 as (select nodes.n,
              cast(150000000000 + (85 * coalesce(s3.s, 0)) // 100 as bigint) as r
       from nodes left join s3 on s3.n = nodes.n)
select n as node, r as pr_rank from r3
"""


def q92_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (ext/skew.heavy_hitters_cms) over
    document tokens: the portable-md5 slot hashes make the APPROXIMATE
    min-of-counters estimates replay bit-exactly in DuckDB (same
    discipline as q85's KMV sketch); exact counts ride along as the
    sketch-error audit."""
    from .ext import skew

    toks = load(spark, sf_dir, "documents").select(
        F.explode(textops.tokens("text")).alias("tok")
    )
    return skew.heavy_hitters_cms(toks, "tok", k=20)


ORACLE_Q92 = """
with vals as (
  select unnest(list_filter(string_split(trim(text), ' '), x -> x <> '')) as val
  from documents),
js as (select unnest([0, 1, 2, 3]) as j),
counters as (
  select j,
         cast(cast('0x' || substring(md5('cms|' || cast(j as varchar) || '|'
                                         || val), 1, 15) as ubigint) as bigint)
           % 1024 as slot,
         cast(count(*) as bigint) as cnt
  from vals cross join js
  group by j, slot),
vocab as (select val, cast(count(*) as bigint) as exact_count
          from vals group by val),
addressed as (
  select val, exact_count, j,
         cast(cast('0x' || substring(md5('cms|' || cast(j as varchar) || '|'
                                         || val), 1, 15) as ubigint) as bigint)
           % 1024 as slot
  from vocab cross join js)
select a.val as value,
       cast(min(c.cnt) as bigint) as est_count,
       a.exact_count
from addressed a join counters c on a.j = c.j and a.slot = c.slot
group by a.val, a.exact_count
order by est_count desc, value
limit 20
"""


def q93_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-free negative sampling (ext/sampling.negative_pairs): 5
    hash-bucketed negatives per 'books' document drawn from the whole
    corpus — no query x corpus cross join."""
    docs = load(spark, sf_dir, "documents")
    return sampling.negative_pairs(
        docs.where(F.col("source") == "src0"), docs, k=5
    )


ORACLE_Q93 = """
with nq as (select cast(count(*) as bigint) as n
            from documents where source = 'src0'),
q as (select doc_id as query_id,
             cast(row_number() over (order by doc_id) as bigint) - 1 as bucket
      from documents where source = 'src0'),
cand as (
  select doc_id as neg_id,
         cast(cast('0x' || substring(md5('neg|' || cast(doc_id as varchar)),
                                     1, 15) as ubigint) as bigint) as h
  from documents),
ranked as (
  select neg_id, h, h % n as bucket,
         row_number() over (partition by h % n order by h, neg_id) as rk
  from cand, nq),
joined as (
  select q.query_id, r.neg_id, r.h
  from ranked r join q on q.bucket = r.bucket
  where r.rk <= 6 and r.neg_id <> q.query_id)
select query_id, neg_id, neg_rank from (
  select query_id, neg_id,
         cast(row_number() over (partition by query_id order by h, neg_id)
              as bigint) as neg_rank
  from joined)
where neg_rank <= 5
"""


def q94_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shingle-overlap report (ext/textops.source_overlap):
    pairwise Jaccard/containment of the distinct 3-gram sets of each
    source — the corpus-level contamination view."""
    return textops.source_overlap(load(spark, sf_dir, "documents"))


ORACLE_Q94 = """
with docs as (
  select source as grp,
         list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
docs3 as (select * from docs where len(toks) >= 3),
sh as (
  select distinct grp, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] as s
  from docs3, unnest(range(1, len(toks) - 1)) t(i)),
per as (select grp, cast(count(*) as bigint) as n_sh from sh group by grp),
inter as (
  select a.grp as grp_a, b.grp as grp_b, cast(count(*) as bigint) as inter
  from sh a join sh b on a.s = b.s and a.grp < b.grp
  group by 1, 2)
select grp_a, grp_b, pa.n_sh as n_a, pb.n_sh as n_b, inter,
       cast(inter as double) / cast(pa.n_sh + pb.n_sh - inter as double)
         as jaccard,
       cast(inter as double) / cast(least(pa.n_sh, pb.n_sh) as double)
         as containment
from inter
join per pa on pa.grp = grp_a
join per pb on pb.grp = grp_b
"""


def q95_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain time rollup (ext/asof.time_rollup): hour+day+week
    buckets of events in ONE scan/one shuffle — the hypertable
    continuous-aggregate shape."""
    from .ext import asof

    return asof.time_rollup(load(spark, sf_dir, "events"))


ORACLE_Q95 = """
with v as (select ts, cast(value as decimal(12,2)) as v from events)
select 'hour' as grain, date_trunc('hour', ts) as bucket_ts,
       count(*) as cnt, cast(sum(v) as double) as sum_value,
       cast(min(v) as double) as min_value, cast(max(v) as double) as max_value
from v group by 2
union all
select 'day', date_trunc('day', ts), count(*), cast(sum(v) as double),
       cast(min(v) as double), cast(max(v) as double)
from v group by 2
union all
select 'week', date_trunc('week', ts), count(*), cast(sum(v) as double),
       cast(min(v) as double), cast(max(v) as double)
from v group by 2
"""


def q96_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user first-order Markov transitions
    (ext/asof.event_transitions): P(next event type | current)."""
    from .ext import asof

    return asof.event_transitions(load(spark, sf_dir, "events"))


ORACLE_Q96 = """
with seq as (
  select event_type as next_type,
         lag(event_type) over (partition by user_id
                               order by ts, event_id) as prev_type
  from events),
pairs as (
  select prev_type, next_type, cast(count(*) as bigint) as n
  from seq where prev_type is not null
  group by 1, 2),
tot as (select prev_type, sum(n) as t from pairs group by 1)
select p.prev_type, p.next_type, p.n,
       cast(p.n as double) / cast(t.t as double) as prob
from pairs p join tot t using (prev_type)
"""


def q97_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD outliers (ext/features.mad_outliers): per-event-type
    |x - median| > 3 * 1.4826 * MAD — exact percentiles, so the robust
    gate replays bit-exactly (q47 equivalence)."""
    from .ext import features

    return features.mad_outliers(
        load(spark, sf_dir, "events"), "event_type", "value", "event_id"
    )


ORACLE_Q97 = """
with med as (
  select event_type, quantile_cont(cast(value as double), 0.5) as med
  from events group by event_type),
dev as (
  select e.event_id, e.event_type, cast(e.value as double) as value, m.med,
         abs(cast(e.value as double) - m.med) as adev
  from events e join med m using (event_type)),
mad as (select event_type, quantile_cont(adev, 0.5) as mad
        from dev group by event_type)
select d.event_id, d.event_type, d.value, d.med, a.mad
from dev d join mad a using (event_type)
where d.adev > 3.0 * 1.4826 * a.mad
"""


def q98_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile profile on a deterministic hash sample
    (ext/skew.sampled_quantiles): the portable-sketch answer to
    approx_percentile — approximate by design, bit-replayable by
    construction."""
    from .ext import skew

    return skew.sampled_quantiles(
        load(spark, sf_dir, "events"), "event_type", "value", "event_id"
    )


_Q98_THR = int(0.2 * float(2**60))  # the identical literal lands in both plans

ORACLE_Q98 = f"""
with s as (
  select event_type, cast(value as double) as v
  from events
  where cast(cast('0x' || substring(md5('sq|' || cast(event_id as varchar)),
                                    1, 15) as ubigint) as bigint)
        < {_Q98_THR})
select event_type, cast(count(*) as bigint) as n_sampled,
       quantile_cont(v, 0.25) as p25, quantile_cont(v, 0.5) as p50,
       quantile_cont(v, 0.75) as p75, quantile_cont(v, 0.95) as p95
from s group by event_type
"""


def q99_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over documents (ext/textops.inverted_index):
    token -> (doc_freq, coll_freq, sorted postings), min_df=2. (The
    max_df stop-list valve stays default-off here: the fixture
    vocabulary is small, so capping df would empty the gate; the
    library exposes it for real corpora.) The library returns
    `postings` as array<string>; the gate renders it '|'-joined so the
    driver harness can hash it."""
    return textops.inverted_index(
        load(spark, sf_dir, "documents"), min_df=2
    ).withColumn("postings", F.array_join("postings", "|"))


ORACLE_Q99 = """
with t as (
  select doc_id as d,
         unnest(list_filter(string_split(trim(text), ' '), x -> x <> '')) as tok
  from documents),
per_doc as (
  select tok, d, cast(count(*) as bigint) as tf from t group by tok, d),
idx as (
  select tok as token,
         cast(count(*) as bigint) as doc_freq,
         cast(sum(tf) as bigint) as coll_freq,
         list_aggr(list_sort(list(cast(d as varchar) || ':' ||
                                  cast(tf as varchar))),
                   'string_agg', '|') as postings
  from per_doc group by tok)
select * from idx where doc_freq >= 2
"""


def q100_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type equi-width histogram of values
    (ext/features.histogram_by_group): exact min/max edges, narrow
    codegen binning, bit-replayable per-row double arithmetic."""
    from .ext import features

    return features.histogram_by_group(
        load(spark, sf_dir, "events"), "event_type", "value", nbins=10
    )


ORACLE_Q100 = """
with mm as (
  select event_type, min(cast(value as double)) as lo,
         max(cast(value as double)) as hi
  from events where value is not null group by event_type),
b as (
  select e.event_type,
         case when mm.hi = mm.lo then cast(0 as bigint)
              else least(cast(9 as bigint),
                         cast(floor((cast(e.value as double) - mm.lo) * 10
                                    / (mm.hi - mm.lo)) as bigint))
         end as bin,
         mm.lo, mm.hi
  from events e join mm using (event_type)
  where e.value is not null)
select event_type, bin,
       lo + bin * ((hi - lo) / 10) as bin_lo,
       lo + (bin + 1) * ((hi - lo) / 10) as bin_hi,
       count(*) as cnt
from b group by event_type, bin, lo, hi
"""


def q101_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history (compare.scd2_history): every event becomes a
    per-user version interval [valid_from, valid_to) with is_current —
    the warehouse complement of q80's latest-state merge_cdc."""
    from .compare import scd2_history

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    return scd2_history(ev, ["user_id"], "ts", "event_id").select(
        "user_id", "event_id", "event_type", "valid_from", "valid_to",
        "is_current",
    )


ORACLE_Q101 = """
select user_id, event_id, event_type,
       ts as valid_from,
       lead(ts) over w as valid_to,
       lead(ts) over w is null as is_current
from events
window w as (partition by user_id order by ts, event_id)
"""


def q102_equidepth_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth deciles of event values per type
    (ext/features.equidepth_buckets): ntile with a full tiebreak, so
    the bucket edges replay across engines."""
    from .ext import features

    return features.equidepth_buckets(
        load(spark, sf_dir, "events"), "event_type", "value", "event_id"
    )


ORACLE_Q102 = """
with b as (
  select event_type,
         cast(ntile(10) over (partition by event_type
                              order by cast(value as double), event_id)
              as bigint) as bucket,
         cast(value as double) as v
  from events where value is not null)
select event_type, bucket, cast(count(*) as bigint) as cnt,
       min(v) as lo, max(v) as hi
from b group by event_type, bucket
"""


def q103_exact_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag Pearson correlation of quantity vs price
    (ext/features.exact_corr): decimal-exact accumulators, double math
    only in the final one-row-per-group formula — the hash-comparable
    answer to builtin corr()."""
    from .ext import features

    return features.exact_corr(
        load(spark, sf_dir, "lineitem"),
        "l_returnflag",
        "l_quantity",
        "l_extendedprice",
    )


ORACLE_Q103 = """
with agg as (
  select l_returnflag, cast(count(*) as bigint) as n,
         sum(cast(l_quantity as decimal(12,2))) as sx,
         sum(cast(l_extendedprice as decimal(12,2))) as sy,
         sum(cast(l_quantity as decimal(12,2))
             * cast(l_quantity as decimal(12,2))) as sxx,
         sum(cast(l_extendedprice as decimal(12,2))
             * cast(l_extendedprice as decimal(12,2))) as syy,
         sum(cast(l_quantity as decimal(12,2))
             * cast(l_extendedprice as decimal(12,2))) as sxy
  from lineitem
  where l_quantity is not null and l_extendedprice is not null
  group by l_returnflag),
scaled as (
  select l_returnflag, n,
         cast(cast(sx * 100 as bigint) as double) as sx,
         cast(cast(sy * 100 as bigint) as double) as sy,
         cast(cast(sxx * 10000 as bigint) as double) as sxx,
         cast(cast(syy * 10000 as bigint) as double) as syy,
         cast(cast(sxy * 10000 as bigint) as double) as sxy
  from agg)
select l_returnflag, n,
       (cast(n as double) * sxy - sx * sy)
       / sqrt((cast(n as double) * sxx - sx * sx)
              * (cast(n as double) * syy - sy * sy)) as corr
from scaled
"""


def q104_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split assignment (ext/sampling.group_split_assign):
    the SOURCE is hashed, not the doc, so a source's near-duplicates
    can never straddle train and eval."""
    return sampling.group_split_assign(
        load(spark, sf_dir, "documents"), "source"
    ).select("doc_id", "source", "split")


ORACLE_Q104 = """
select doc_id, source,
       case when h % 10000 < 8000 then 'train'
            when h % 10000 < 9000 then 'val'
            else 'test' end as split
from (
  select doc_id, source,
         cast(cast('0x' || substring(md5('gsplit|' || source), 1, 15)
                   as ubigint) as bigint) as h
  from documents)
"""


def q105_star_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema OLAP rollup: revenue by region -> nation -> ship
    year with subtotals, over a broadcast dimension chain (lineitem x
    supplier x nation x region). The fact table shuffles ONCE (into
    the rollup agg); every dimension hop is a broadcast hash join —
    the canonical warehouse plan at any scale."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - _dec("l_discount")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("year"),
            rev.alias("_rev"),
        )
        .rollup("region", "nation", "year")
        .agg(
            F.sum("_rev").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


ORACLE_Q105 = """
select r.r_name as region, n.n_name as nation, year(l.l_shipdate) as year,
       cast(sum(cast(l.l_extendedprice as decimal(12,2))
                * (cast(1 as decimal(12,2))
                   - cast(l.l_discount as decimal(12,2)))) as double)
         as revenue,
       count(*) as cnt
from lineitem l
join supplier s on l.l_suppkey = s.s_suppkey
join nation n on s.s_nationkey = n.n_nationkey
join region r on n.n_regionkey = r.r_regionkey
group by rollup (region, nation, year)
"""


def q106_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based score normalization (ext/features.rank_normalize):
    percent_rank of n_chars within source — heterogeneous quality
    scores made comparable before blending."""
    from .ext import features

    return features.rank_normalize(
        load(spark, sf_dir, "documents"), "source", "n_chars", "doc_id"
    ).select("doc_id", "source", "n_chars", "pct_rank")


ORACLE_Q106 = """
select doc_id, source, n_chars,
       percent_rank() over (partition by source
                            order by cast(n_chars as double), doc_id)
         as pct_rank
from documents
"""


def q107_rolling_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly flags (ext/asof.rolling_deviation):
    events whose value jumps > 2x away from their user's previous-5
    mean — decimal-exact trailing sums, replayable flag test."""
    from .ext import asof

    return asof.rolling_deviation(
        load(spark, sf_dir, "events"), "user_id", "ts", "event_id", "value"
    )


ORACLE_Q107 = """
with b as (
  select user_id, event_id, ts, cast(value as double) as value,
         cast(sum(cast(value as decimal(12,2))) over w as double)
           / cast(count(value) over w as double) as trail_mean,
         cast(count(value) over w as bigint) as n_prior
  from events where value is not null
  window w as (partition by user_id order by ts, event_id
               rows between 5 preceding and 1 preceding))
select * from b
where n_prior = 5
  and abs(value - trail_mean) > 2.0 * greatest(abs(trail_mean), 1.0)
"""


def q108_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-algebra overlap (ext/skew.kmv_overlap): estimated
    intersection/union/Jaccard of click-users vs purchase-users from
    merged KMV sketches (k=64 so the ESTIMATOR path, not the exact
    small-set path, is what the oracle replays)."""
    from .ext import skew

    ev = load(spark, sf_dir, "events")
    return skew.kmv_overlap(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        "user_id",
        k=64,
    )


ORACLE_Q108 = """
with ah as (
  select distinct cast(cast('0x' || substring(md5(cast(user_id as varchar)),
                                              1, 15) as ubigint) as bigint) as h
  from events where event_type = 'click' and user_id is not null),
ka as (select h from ah order by h limit 64),
bh as (
  select distinct cast(cast('0x' || substring(md5(cast(user_id as varchar)),
                                              1, 15) as ubigint) as bigint) as h
  from events where event_type = 'purchase' and user_id is not null),
kb as (select h from bh order by h limit 64),
u0 as (
  select h, max(in_a) as in_a, max(in_b) as in_b from (
    select h, 1 as in_a, 0 as in_b from ka
    union all
    select h, 0 as in_a, 1 as in_b from kb) t
  group by h),
u as (select * from u0 order by h limit 64),
sa as (select cast(count(*) as bigint) as na, max(h) as hka from ka),
sb as (select cast(count(*) as bigint) as nb, max(h) as hkb from kb),
su as (select cast(count(*) as bigint) as nu, max(h) as hku,
              cast(sum(case when in_a = 1 and in_b = 1 then 1 else 0 end)
                   as bigint) as nboth
       from u),
est as (
  select
    case when na < 64 then na
         else cast(floor(cast(63 as double) *
                         cast(1152921504606846976 as double)
                         / cast(hka as double)) as bigint) end as n_a_est,
    case when nb < 64 then nb
         else cast(floor(cast(63 as double) *
                         cast(1152921504606846976 as double)
                         / cast(hkb as double)) as bigint) end as n_b_est,
    case when nu < 64 then nu
         else cast(floor(cast(63 as double) *
                         cast(1152921504606846976 as double)
                         / cast(hku as double)) as bigint) end as union_est,
    cast(nboth as double) / cast(nu as double) as jaccard_est
  from su, sa, sb)
select n_a_est, n_b_est, union_est,
       cast(floor(jaccard_est * cast(union_est as double)) as bigint)
         as intersection_est,
       jaccard_est
from est
"""


def q109_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: average event value by (event_type,
    day-of-week, hour) — the heatmap behind load forecasting and
    anomaly baselines. One partial-aggregated groupBy over narrow
    derived keys; the average divides a decimal-exact sum by an exact
    count (one portable division, q15 discipline)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.dayofweek("ts").cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(_dec("value")).alias("_s"),
        )
        .select(
            "event_type",
            "dow",
            "hour",
            "cnt",
            (F.col("_s").cast("double") / F.col("cnt").cast("double")).alias(
                "avg_value"
            ),
        )
    )


ORACLE_Q109 = """
select event_type,
       cast(dayofweek(ts) + 1 as bigint) as dow,
       cast(hour(ts) as bigint) as hour,
       cast(count(*) as bigint) as cnt,
       cast(sum(cast(value as decimal(12,2))) as double)
         / cast(count(*) as double) as avg_value
from events where value is not null
group by 1, 2, 3
"""


def q110_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort value matrix (the LTV complement of q89's retention
    counts): users bucketed by first-seen day, their purchase value
    summed per later day offset. Same shape discipline as retention —
    one per-user min (partial agg), one co-keyed join, sums in
    decimal."""
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    purchases = ev.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select("user_id", F.to_date("ts").alias("d"), _dec("value").alias("v"))
    return (
        purchases.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("d"), F.col("cohort_day")).cast("long").alias(
                "day_offset"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("v").cast("double").alias("total_value"),
        )
    )


ORACLE_Q110 = """
with first as (
  select user_id, min(cast(ts as date)) as cohort_day
  from events group by user_id),
p as (
  select user_id, cast(ts as date) as d, cast(value as decimal(12,2)) as v
  from events where event_type = 'purchase' and value is not null)
select f.cohort_day,
       cast(date_diff('day', f.cohort_day, p.d) as bigint) as day_offset,
       cast(count(*) as bigint) as n_purchases,
       cast(sum(p.v) as double) as total_value
from p join first f using (user_id)
group by 1, 2
"""


def q111_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (ext/features.rfm_segments): global
    recency/frequency/monetary quintiles WITHOUT a global NTILE sort —
    two-phase range-partitioned rank + exact NTILE arithmetic."""
    from .ext import features

    return features.rfm_segments(
        load(spark, sf_dir, "orders"), "o_custkey", "o_orderdate", "o_totalprice"
    )


ORACLE_Q111 = """
with base as (
  select o_custkey,
         cast(date_diff('day', max(o_orderdate),
                        (select max(o_orderdate) from orders)) as bigint)
           as recency_days,
         cast(count(*) as bigint) as frequency,
         sum(cast(o_totalprice as decimal(12,2))) as mon
  from orders group by o_custkey),
t as (
  select o_custkey, recency_days, frequency, cast(mon as double) as monetary,
         cast(ntile(5) over (order by recency_days, o_custkey) as bigint)
           as r_tile,
         cast(ntile(5) over (order by frequency desc, o_custkey) as bigint)
           as f_tile,
         cast(ntile(5) over (order by mon desc, o_custkey) as bigint)
           as m_tile
  from base)
select *, format('{}{}{}', r_tile, f_tile, m_tile) as segment from t
"""


def q112_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution (ext/asof.last_touch): each purchase
    credited to the user's most recent preceding non-purchase event."""
    return asof.last_touch(
        load(spark, sf_dir, "events"),
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "purchase",
    )


ORACLE_Q112 = """
with a as (
  select user_id, event_id, ts, event_type,
         last_value(case when event_type <> 'purchase' then event_type end
                    ignore nulls)
           over (partition by user_id order by ts, event_id
                 rows between unbounded preceding and 1 preceding) as lt
  from events)
select user_id, event_id, ts, coalesce(lt, '(none)') as attributed
from a where event_type = 'purchase'
"""


def q113_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand co-occurrence with lift (ext/features.cooccurrence_lift)
    over order baskets: lineitem x part (broadcast dim), distinct
    (order, brand), co-partitioned self-join bounded by basket size."""
    from .ext import features

    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    baskets = li.join(
        F.broadcast(p.select("p_partkey", "p_brand")),
        li.l_partkey == p.p_partkey,
    ).select("l_orderkey", "p_brand")
    return features.cooccurrence_lift(baskets, "l_orderkey", "p_brand")


ORACLE_Q113 = """
with items as (
  select distinct l_orderkey, p_brand
  from lineitem join part on l_partkey = p_partkey),
ng as (select count(distinct l_orderkey) as n from items),
marg as (select p_brand, count(*) as cnt from items group by 1),
pairs as (
  select a.p_brand as item_a, b.p_brand as item_b,
         cast(count(*) as bigint) as pair_cnt
  from items a join items b using (l_orderkey)
  where a.p_brand < b.p_brand
  group by 1, 2
  having count(*) >= 2)
select item_a, item_b, pair_cnt,
       (cast(pair_cnt as double) * cast(ng.n as double))
         / (cast(ca.cnt as double) * cast(cb.cnt as double)) as lift
from pairs
join marg ca on ca.p_brand = pairs.item_a
join marg cb on cb.p_brand = pairs.item_b
cross join ng
"""


def q114_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session paths (ext/asof.session_paths): 30-min gap
    sessions rendered as ordered event-type strings, counted,
    distributed top-k (TakeOrderedAndProject)."""
    return asof.session_paths(
        load(spark, sf_dir, "events"), "user_id", "ts", "event_id", "event_type"
    )


ORACLE_Q114 = """
with g as (
  select user_id, ts, event_id, event_type,
         case when lag(ts) over w is null
                   or (epoch_us(ts) - epoch_us(lag(ts) over w)) > 1800000000
              then 1 else 0 end as brk
  from events window w as (partition by user_id order by ts, event_id)),
s as (
  select user_id, ts, event_id, event_type,
         sum(brk) over (partition by user_id order by ts, event_id
                        rows between unbounded preceding and current row)
           as session_id
  from g),
p as (
  select user_id, session_id,
         string_agg(event_type, '>' order by ts, event_id) as path
  from s group by 1, 2)
select path, cast(count(*) as bigint) as n_sessions
from p group by path
order by n_sessions desc, path limit 20
"""


def q115_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve (ext/textops.vocab_coverage): corpus
    token share covered by the top-{10,100,1000} tokens — two-phase
    global vocab rank, one conditional aggregate per k."""
    return textops.vocab_coverage(load(spark, sf_dir, "documents"))


ORACLE_Q115 = """
with t as (
  select unnest(list_filter(string_split(trim(text), ' '), x -> x <> ''))
           as tok
  from documents),
c as (select tok, count(*) as cnt from t group by 1),
r as (select cnt, row_number() over (order by cnt desc, tok) as rnk from c),
tot as (select cast(count(*) as bigint) as vocab_size,
               cast(sum(cnt) as bigint) as total_tokens from c)
select cast(k as bigint) as k, vocab_size,
       cast(sum(case when rnk <= k then cnt end) as bigint) as covered_tokens,
       total_tokens,
       cast(sum(case when rnk <= k then cnt end) as double)
         / cast(total_tokens as double) as coverage
from r cross join tot cross join (select unnest([10, 100, 1000]) as k) ks
group by k, vocab_size, total_tokens
"""


def q116_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/size Pareto frontier over parts (ext/features
    .pareto_front_2d): two-phase skyline — hash-bucketed local pass,
    exact rule over survivors only."""
    from .ext import features

    return features.pareto_front_2d(
        load(spark, sf_dir, "part"), "p_retailprice", "p_size"
    )


ORACLE_Q116 = """
with pts as (
  select distinct cast(p_retailprice as double) as p_retailprice,
                  cast(p_size as double) as p_size
  from part
  where p_retailprice is not null and p_size is not null)
select p_retailprice, p_size from pts p
where not exists (
  select 1 from pts q
  where q.p_retailprice <= p.p_retailprice and q.p_size <= p.p_size
    and (q.p_retailprice < p.p_retailprice or q.p_size < p.p_size))
"""


def q117_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd iteration over the embeddings (ext/similarity
    .kmeans_step): broadcast-centroid argmax assignment + quantized
    integer mean update, bit-replayable in SQL."""
    return similarity.kmeans_step(load(spark, sf_dir, "embeddings"))


ORACLE_Q117 = """
with c as (select vec_id as cid,
                  list_transform(embedding, x -> cast(x as double)) as cv
           from embeddings where vec_id < 8),
v as (select vec_id, list_transform(embedding, x -> cast(x as double)) as vv
      from embeddings),
s as (select v.vec_id, c.cid, list_cosine_similarity(vv, cv) as cos, vv
      from v, c),
r as (select vec_id, cid, vv,
             row_number() over (partition by vec_id
                                order by cos desc, cid) as rn
      from s),
a as (select cid as centroid_id, vv from r where rn = 1),
q as (select centroid_id, d.dim,
             cast(floor(vv[d.dim + 1] * 1e6 + 0.5) as bigint) as qv
      from a cross join (select unnest(range(64)) as dim) d)
select centroid_id, cast(dim as bigint) as dim,
       cast(count(*) as bigint) as n_members,
       cast(sum(qv) as double) / (cast(count(*) as double) * 1e6) as new_val
from q group by 1, 2
"""


def q118_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-15 for query {data, spark, vector} (ext/textops
    .bm25_topk). The gate runs idf_mode='rational' (the q60 no-libm
    discipline: ln is monotone per term, dropped so even the double
    score replays bit-for-bit); production default is standard ln
    BM25."""
    return textops.bm25_topk(
        load(spark, sf_dir, "documents"),
        ["data", "spark", "vector"],
        k=15,
        idf_mode="rational",
    )


# expression trees below mirror bm25_topk's Python operator order
# EXACTLY (left-associated) so both engines evaluate identical IEEE ops
ORACLE_Q118 = """
with base as (
  select doc_id,
    cast(len(list_filter(string_split(trim(text), ' '), x -> x <> ''))
         as bigint) as dl,
    cast(len(list_filter(string_split(trim(text), ' '), x -> x = 'data'))
         as bigint) as tf0,
    cast(len(list_filter(string_split(trim(text), ' '), x -> x = 'spark'))
         as bigint) as tf1,
    cast(len(list_filter(string_split(trim(text), ' '), x -> x = 'vector'))
         as bigint) as tf2
  from documents),
stats as (
  select cast(count(*) as bigint) as n, cast(sum(dl) as bigint) as sumdl,
         cast(sum(case when tf0 > 0 then 1 else 0 end) as bigint) as df0,
         cast(sum(case when tf1 > 0 then 1 else 0 end) as bigint) as df1,
         cast(sum(case when tf2 > 0 then 1 else 0 end) as bigint) as df2
  from base),
scored as (
  select doc_id, dl,
    (((cast(n - df0 as double) + 0.5) / (cast(df0 as double) + 0.5))
       * (cast(tf0 as double) * 2.2))
      / (cast(tf0 as double)
         + (1.2 * ((1.0 - 0.75)
                   + ((0.75 * cast(dl as double))
                      / (cast(sumdl as double) / cast(n as double))))))
    + (((cast(n - df1 as double) + 0.5) / (cast(df1 as double) + 0.5))
       * (cast(tf1 as double) * 2.2))
      / (cast(tf1 as double)
         + (1.2 * ((1.0 - 0.75)
                   + ((0.75 * cast(dl as double))
                      / (cast(sumdl as double) / cast(n as double))))))
    + (((cast(n - df2 as double) + 0.5) / (cast(df2 as double) + 0.5))
       * (cast(tf2 as double) * 2.2))
      / (cast(tf2 as double)
         + (1.2 * ((1.0 - 0.75)
                   + ((0.75 * cast(dl as double))
                      / (cast(sumdl as double) / cast(n as double))))))
      as score
  from base cross join stats)
select doc_id, dl, score from scored where score > 0
order by score desc, doc_id limit 15
"""


def q119_snapshots_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC time travel (compare.snapshots_at): the q80 change batch
    replayed to two cutoffs — seq 11 (update+delete applied, inserts
    not yet) and seq 14 (insert-then-delete netted out)."""
    from .compare import snapshots_at

    sup = load(spark, sf_dir, "supplier")
    changes = spark.createDataFrame(
        [
            (1, "UPDATED NAME", "U", 10),
            (2, None, "D", 11),
            (900001, "BRAND NEW", "I", 12),
            (900002, "EPHEMERAL", "I", 13),
            (900002, None, "D", 14),
        ],
        "s_suppkey long, s_name string, op string, seq long",
    )
    return snapshots_at(
        sup.select("s_suppkey", "s_name"),
        changes,
        ["s_suppkey"],
        seqs=[11, 14],
    )


ORACLE_Q119 = """
with changes(s_suppkey, s_name, op, seq) as (values
  (1, 'UPDATED NAME', 'U', 10),
  (2, NULL, 'D', 11),
  (900001, 'BRAND NEW', 'I', 12),
  (900002, 'EPHEMERAL', 'I', 13),
  (900002, NULL, 'D', 14)),
snap as (select unnest([11, 14]) as snap_seq),
latest as (
  select snap_seq, s_suppkey, s_name, op
  from (select c.*, s.snap_seq,
               row_number() over (partition by s.snap_seq, c.s_suppkey
                                  order by c.seq desc) rn
        from changes c cross join snap s where c.seq <= s.snap_seq)
  where rn = 1),
kept as (
  select s.snap_seq, sup.s_suppkey, sup.s_name
  from supplier sup cross join snap s
  where not exists (select 1 from latest l
                    where l.snap_seq = s.snap_seq
                      and l.s_suppkey = sup.s_suppkey))
select cast(snap_seq as bigint) as snap_seq,
       cast(s_suppkey as bigint) as s_suppkey, s_name from kept
union all
select cast(snap_seq as bigint), cast(s_suppkey as bigint), s_name
from latest where op <> 'D'
"""


def q120_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein<=1 record linkage over supplier names (ext/dedup
    .editdist1_pairs): FastSS deletion-neighborhood banding + exact
    verify — catches the insert/delete typos q59's Hamming join cannot."""
    s = load(spark, sf_dir, "supplier")
    return dedup.editdist1_pairs(s, "s_name", "s_suppkey")


ORACLE_Q120 = """
select a.s_suppkey as id_a, b.s_suppkey as id_b,
       a.s_name as a, b.s_name as b,
       cast(levenshtein(a.s_name, b.s_name) as bigint) as dist
from supplier a join supplier b on a.s_suppkey < b.s_suppkey
where levenshtein(a.s_name, b.s_name) <= 1
"""


def q121_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 BPE merge candidates (ext/textops.bpe_pair_counts):
    adjacent char pairs weighted by word frequency, computed over the
    VOCABULARY (one corpus pass), not the corpus."""
    return textops.bpe_pair_counts(load(spark, sf_dir, "documents"))


ORACLE_Q121 = """
with w as (
  select tok as w, count(*) as wf
  from (select unnest(list_filter(string_split(trim(text), ' '),
                                  x -> x <> '')) as tok
        from documents)
  group by 1),
p as (
  select substring(w, i, 2) as pair, wf
  from w cross join unnest(range(1, length(w))) as t(i)
  where length(w) >= 2)
select pair, cast(sum(wf) as bigint) as cnt
from p group by pair order by cnt desc, pair limit 20
"""


def q122_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-action training pairs (ext/asof.next_event_pairs): the
    previous-3-types context string and the current type as label, one
    per-key window pass."""
    return asof.next_event_pairs(
        load(spark, sf_dir, "events"), "user_id", "ts", "event_id", "event_type"
    )


ORACLE_Q122 = """
with l as (
  select user_id, event_id, ts,
         lag(event_type, 3) over w as l3,
         lag(event_type, 2) over w as l2,
         lag(event_type, 1) over w as l1,
         event_type as label
  from events window w as (partition by user_id order by ts, event_id))
select user_id, event_id, ts,
       l3 || '>' || l2 || '>' || l1 as context, label
from l where l3 is not null
"""


def q123_embedding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health profile (ext/similarity
    .embedding_profile): exact min/max selections + quantized-integer
    means, one posexplode into one dim-keyed aggregate."""
    return similarity.embedding_profile(load(spark, sf_dir, "embeddings"))


ORACLE_Q123 = """
with comp as (
  select d.dim, cast(embedding[d.dim + 1] as double) as c
  from embeddings cross join (select unnest(range(64)) as dim) d)
select cast(dim as bigint) as dim,
       cast(count(*) as bigint) as n,
       cast(sum(case when isnan(c) or c is null then 1 else 0 end) as bigint)
         as n_nan,
       min(case when not isnan(c) and c is not null then c end) as vmin,
       max(case when not isnan(c) and c is not null then c end) as vmax,
       cast(sum(case when not isnan(c) and c is not null
                     then cast(floor(c * 1e6 + 0.5) as bigint) end) as double)
         / (cast(sum(case when not isnan(c) and c is not null then 1 else 0
                          end) as double) * 1e6) as mean_val
from comp group by dim
"""


def q124_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution composed from the library: Levenshtein<=1
    linkage pairs (q120) -> connected components (iterative min-label)
    -> canonical entity id per record. Singleton records resolve to
    themselves."""
    from .ext import graph

    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    pairs = dedup.editdist1_pairs(s, "s_name", "s_suppkey").select(
        "id_a", "id_b"
    )
    comp = graph.connected_components(pairs, src="id_a", dst="id_b")
    return (
        s.join(comp, s.s_suppkey == comp.node, "left")
        .select(
            "s_suppkey",
            "s_name",
            F.coalesce(F.col("component"), F.col("s_suppkey"))
            .cast("long")
            .alias("entity_id"),
        )
    )


ORACLE_Q124 = """
with recursive
pairs as (
  select a.s_suppkey as id_a, b.s_suppkey as id_b
  from supplier a join supplier b on a.s_suppkey < b.s_suppkey
  where levenshtein(a.s_name, b.s_name) <= 1),
edges as (select id_a as a, id_b as b from pairs
          union all select id_b, id_a from pairs),
reach(a, b) as (
  select a, b from edges
  union
  select r.a, e.b from reach r join edges e on r.b = e.a),
nodes as (select distinct a as node from edges),
comp as (
  select n.node, least(n.node, min(r.b)) as component
  from nodes n left join reach r on r.a = n.node
  group by n.node)
select s.s_suppkey, s.s_name,
       cast(coalesce(c.component, s.s_suppkey) as bigint) as entity_id
from supplier s left join comp c on c.node = s.s_suppkey
"""


def q125_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 prices per brand WITH ties (RANK, not ROW_NUMBER): every
    part tied at a qualifying price survives — the other top-k
    semantics, deterministic without a tiebreak because tied rows share
    a rank. Per-brand window, never global."""
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return (
        p.withColumn("rnk", F.rank().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rnk")
    )


ORACLE_Q125 = """
select p_brand, p_partkey, p_retailprice, cast(rnk as bigint) as rnk
from (select p_brand, p_partkey, p_retailprice,
             rank() over (partition by p_brand
                          order by p_retailprice desc) as rnk
      from part)
where rnk <= 3
"""


def q126_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total contribution: each nation's order revenue and
    its share of the whole. The total rides on a broadcast single-row
    cross join over the 25-row aggregate — no global window. Cent-scale
    decimal sums stay under 2^53, so the decimal->double casts are the
    same exact IEEE conversion in both engines."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    per_nation = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_dec("o_totalprice")).alias("_rev"))
    )
    total = per_nation.agg(F.sum("_rev").alias("_tot"))
    return per_nation.crossJoin(F.broadcast(total)).select(
        "n_name",
        F.col("_rev").cast("double").alias("revenue"),
        (F.col("_rev").cast("double") / F.col("_tot").cast("double")).alias(
            "share"
        ),
    )


ORACLE_Q126 = """
with per_nation as (
  select n_name, sum(cast(o_totalprice as decimal(12,2))) as rev
  from orders join customer on o_custkey = c_custkey
  join nation on c_nationkey = n_nationkey
  group by n_name),
tot as (select sum(rev) as t from per_nation)
select n_name, cast(rev as double) as revenue,
       cast(rev as double) / cast(t as double) as share
from per_nation cross join tot
"""


def q127_ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover detection (the 'golden cross' alert):
    per user, flag events where the trailing-3 mean of value rises
    above the trailing-6 mean having been at-or-below it on the
    previous event. Decimal-exact trailing sums; the means are single
    divisions; the signal is a lag of an integer flag — all
    key-partitioned windows."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    wb = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ws = wb.rowsBetween(-2, 0)
    wl = wb.rowsBetween(-5, 0)
    ma = lambda w: (  # noqa: E731
        F.sum(_dec("value")).over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
    )
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        ma(ws).alias("ma_s"),
        ma(wl).alias("ma_l"),
        F.count(F.lit(1)).over(wl).cast("long").alias("_nl"),
    ).withColumn(
        "_x",
        F.when(F.col("_nl") == 6, (F.col("ma_s") > F.col("ma_l")).cast("int")),
    )
    return (
        base.withColumn("_px", F.lag("_x").over(wb))
        .where((F.col("_x") == 1) & (F.col("_px") == 0))
        .select("user_id", "event_id", "ts", "ma_s", "ma_l")
    )


ORACLE_Q127 = """
with b as (
  select user_id, event_id, ts,
         cast(sum(cast(value as decimal(12,2))) over ws as double)
           / cast(count(*) over ws as double) as ma_s,
         cast(sum(cast(value as decimal(12,2))) over wl as double)
           / cast(count(*) over wl as double) as ma_l,
         count(*) over wl as nl
  from events where value is not null
  window ws as (partition by user_id order by ts, event_id
                rows between 2 preceding and current row),
         wl as (partition by user_id order by ts, event_id
                rows between 5 preceding and current row)),
x as (
  select *, case when nl = 6 then
                 (case when ma_s > ma_l then 1 else 0 end) end as xf,
         lag(case when nl = 6 then
                  (case when ma_s > ma_l then 1 else 0 end) end)
           over (partition by user_id order by ts, event_id) as pxf
  from b)
select user_id, event_id, ts, ma_s, ma_l from x where xf = 1 and pxf = 0
"""


def q128_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram: how big the near-dup groups
    are (the dedup analytics view that decides whether clustering is
    boilerplate-driven). Components over the exact-Jaccard pairs, two
    tiny aggregates on top."""
    from .ext import graph

    pairs = dedup.jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.8)
    comp = graph.connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .groupBy(F.col("_sz").cast("long").alias("cluster_size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
    )


# same shingle/pair/component CTEs as ORACLE_Q49, then the size rollup
ORACLE_Q128 = """
with recursive
docs as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
docs3 as (select * from docs where len(toks) >= 3),
sh as (
  select distinct doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] as shingle
  from docs3, unnest(range(1, len(toks) - 1)) t(i)),
sizes as (select doc_id, count(*) as n from sh group by doc_id),
common as (
  select a.doc_id as d1, b.doc_id as d2, count(*) as c
  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
  group by 1, 2),
pairs as (
  select d1, d2 from common
  join sizes na on na.doc_id = d1
  join sizes nb on nb.doc_id = d2
  where cast(c as double) / cast(na.n + nb.n - c as double) >= 0.8),
edges as (select d1 as a, d2 as b from pairs
          union all select d2, d1 from pairs),
reach(a, b) as (
  select a, b from edges
  union
  select r.a, e.b from reach r join edges e on r.b = e.a),
nodes as (select distinct a as node from edges),
comp as (
  select n.node, least(n.node, min(r.b)) as component
  from nodes n left join reach r on r.a = n.node
  group by n.node),
cs as (select component, count(*) as sz from comp group by component)
select cast(sz as bigint) as cluster_size,
       cast(count(*) as bigint) as n_clusters
from cs group by sz
"""


def q129_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag (ext/features
    .weighted_median): decimal cumulative weights, 2*cum >= total in
    DECIMAL — no float division in the selection."""
    from .ext import features

    return features.weighted_median(
        load(spark, sf_dir, "lineitem"),
        "l_returnflag",
        "l_extendedprice",
        "l_quantity",
        "l_orderkey",
    )


ORACLE_Q129 = """
with o as (
  select l_returnflag,
         cast(l_extendedprice as double) as v,
         sum(cast(l_quantity as decimal(12,2)))
           over (partition by l_returnflag
                 order by cast(l_extendedprice as double), l_orderkey
                 rows between unbounded preceding and current row) as cum,
         sum(cast(l_quantity as decimal(12,2)))
           over (partition by l_returnflag) as tot
  from lineitem)
select l_returnflag, min(v) as wmedian,
       cast(max(tot) as double) as total_weight
from o where cum * 2 >= tot
group by l_returnflag
"""


def q130_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing ONE-HOUR sum per user — a RANGE frame over event-time
    (every event within 3600s, however many rows that is), the frame
    family the rows-frames queries (q45/q107/q127) cannot express.
    Ordered on epoch micros (exact long), decimal-exact sums, one
    key-partitioned window."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(_dec("value")).over(w).cast("double").alias("hour_sum"),
        F.count(F.lit(1)).over(w).cast("long").alias("hour_events"),
    )


ORACLE_Q130 = """
select user_id, event_id, ts,
       cast(sum(cast(value as decimal(12,2))) over w as double) as hour_sum,
       cast(count(*) over w as bigint) as hour_events
from events where value is not null
window w as (partition by user_id order by epoch_us(ts)
             range between 3600000000 preceding and current row)
"""


def q131_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id: order totals by
    (status, priority), by status alone, and grand total — the
    irregular-subtotal construct rollup/cube (q12/q33) cannot pick
    freely. One Expand-planned aggregate, no extra scans."""
    _register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        select o_orderstatus, o_orderpriority,
               cast(grouping_id(o_orderstatus, o_orderpriority) as bigint)
                 as gid,
               cast(count(*) as bigint) as n_orders,
               cast(sum(cast(o_totalprice as decimal(12,2)))
                    as decimal(18,2)) as total
        from orders
        group by grouping sets ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    ).select(
        "o_orderstatus",
        "o_orderpriority",
        "gid",
        "n_orders",
        F.col("total").cast("double").alias("total"),
    )


ORACLE_Q131 = """
select o_orderstatus, o_orderpriority,
       cast(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
            as bigint) as gid,
       cast(count(*) as bigint) as n_orders,
       cast(cast(sum(cast(o_totalprice as decimal(12,2))) as decimal(18,2))
            as double) as total
from orders
group by grouping sets ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())
"""


def q132_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation in-warehouse: confusion matrix of the
    lang-id heuristic against the fixture's true lang labels, each cell
    row-normalized by the truth class's total (recall-style rates).
    Two tiny aggregates joined back; rates are single divisions of
    exact counts."""
    d = load(spark, sf_dir, "documents")
    j = d.select("doc_id", "lang").join(textops.language_id(d), "doc_id")
    cm = j.groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("n"))
    truth = j.groupBy("lang").agg(F.count(F.lit(1)).alias("truth_total"))
    pred = j.groupBy("pred_lang").agg(F.count(F.lit(1)).alias("pred_total"))
    return (
        cm.join(F.broadcast(truth), "lang")
        .join(F.broadcast(pred), "pred_lang")
        .select(
            "lang",
            "pred_lang",
            F.col("n").cast("long").alias("n"),
            F.col("truth_total").cast("long").alias("truth_total"),
            F.col("pred_total").cast("long").alias("pred_total"),
            (F.col("n").cast("double") / F.col("truth_total").cast("double"))
            .alias("recall_rate"),
        )
    )


ORACLE_Q132 = """
with pred as (
  select doc_id,
    case when length(trim(text)) = 0 then 'unknown'
         when text like '% the %' or text like 'the %' or text like '% the'
           then 'en'
         when text like '% data %' or text like 'data %' then 'data-ish'
         else 'other' end as pred_lang
  from documents),
j as (select d.lang, p.pred_lang from documents d join pred p using (doc_id)),
cm as (select lang, pred_lang, cast(count(*) as bigint) as n
       from j group by 1, 2),
t as (select lang, cast(count(*) as bigint) as truth_total
      from j group by 1),
p as (select pred_lang, cast(count(*) as bigint) as pred_total
      from j group by 1)
select cm.lang, cm.pred_lang, cm.n, t.truth_total, p.pred_total,
       cast(cm.n as double) / cast(t.truth_total as double) as recall_rate
from cm join t using (lang) join p using (pred_lang)
"""


def q133_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins: a numeric score (n_chars) against a
    binary outcome (lang = 'en'), 10 equi-width bins over the exact
    global min/max, per-bin positive rate — the calibration profile of
    any scalar quality signal. Binning is per-row IEEE arithmetic
    identical in both engines; rates are single divisions."""
    d = load(spark, sf_dir, "documents")
    mm = d.agg(
        F.min(F.col("n_chars").cast("double")).alias("_lo"),
        F.max(F.col("n_chars").cast("double")).alias("_hi"),
    )
    x = F.col("n_chars").cast("double")
    raw_bin = F.floor((x - F.col("_lo")) * 10 / (F.col("_hi") - F.col("_lo")))
    b = d.crossJoin(F.broadcast(mm)).withColumn(
        "bin",
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0).cast("long"))
        .otherwise(F.least(F.lit(9).cast("long"), raw_bin)),
    )
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("lang") == "en").cast("long")).cast("long").alias("n_pos"),
    ).withColumn(
        "pos_rate", F.col("n_pos").cast("double") / F.col("n").cast("double")
    )


ORACLE_Q133 = """
with mm as (select min(cast(n_chars as double)) as lo,
                   max(cast(n_chars as double)) as hi from documents),
b as (
  select case when hi = lo then 0
              else least(9, cast(floor((cast(n_chars as double) - lo) * 10
                                       / (hi - lo)) as bigint)) end as bin,
         case when lang = 'en' then 1 else 0 end as pos
  from documents cross join mm)
select bin, cast(count(*) as bigint) as n,
       cast(sum(pos) as bigint) as n_pos,
       cast(sum(pos) as double) / cast(count(*) as double) as pos_rate
from b group by bin
"""


def q134_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test straight from the event log: users split
    into variants by user_id parity, conversion = at least 3 high-value
    purchases (value >= 100 — "any purchase" saturates at p = 1 on this
    fixture and the z-statistic's pooled variance degenerates); the z
    statistic is a fixed expression over four exact counts (sqrt is
    correctly rounded IEEE), so even the test statistic hash-matches.
    One per-user aggregate, one 2-row aggregate, one scalar combine."""
    ev = load(spark, sf_dir, "events")
    hi = (F.col("event_type") == "purchase") & (F.col("value") >= 100)
    per_user = ev.groupBy("user_id").agg(
        (F.sum(hi.cast("long")) >= 3).cast("long").alias("_conv")
    )
    counts = (
        per_user.withColumn("variant", F.pmod(F.col("user_id"), F.lit(2)))
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_conv").cast("long").alias("conv"),
        )
    )
    a = counts.where(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    bq = counts.where(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    j = a.crossJoin(F.broadcast(bq))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    pa, pb = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    z = (pa - pb) / F.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    return j.select(
        "n_a", "conv_a", "n_b", "conv_b",
        pa.alias("rate_a"), pb.alias("rate_b"), z.alias("z_stat"),
    )


ORACLE_Q134 = """
with per_user as (
  select user_id,
         case when sum(case when event_type = 'purchase' and value >= 100
                            then 1 else 0 end) >= 3
              then 1 else 0 end as conv
  from events group by user_id),
counts as (
  select user_id % 2 as variant, cast(count(*) as bigint) as n,
         cast(sum(conv) as bigint) as conv
  from per_user group by 1),
a as (select n as n_a, conv as conv_a from counts where variant = 0),
b as (select n as n_b, conv as conv_b from counts where variant = 1)
select n_a, conv_a, n_b, conv_b,
  (cast(conv_a as double) / cast(n_a as double)) as rate_a,
  (cast(conv_b as double) / cast(n_b as double)) as rate_b,
  ((cast(conv_a as double) / cast(n_a as double))
   - (cast(conv_b as double) / cast(n_b as double)))
  / sqrt(((cast(conv_a as double) + cast(conv_b as double))
          / (cast(n_a as double) + cast(n_b as double)))
         * (1.0 - ((cast(conv_a as double) + cast(conv_b as double))
                   / (cast(n_a as double) + cast(n_b as double))))
         * (1.0 / cast(n_a as double) + 1.0 / cast(n_b as double)))
    as z_stat
from a cross join b
"""


def q135_hash_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing bridge from text to the vector space: each token
    hashes (portable md5) onto one of the embedding rows, and each
    source's centroid in that hashed-embedding space is an exact
    quantized-integer mean per dimension (the kmeans_step discipline) —
    how a text corpus gets a cheap vector profile with no model at all.
    Shape: explode tokens (one pass), join the embedding table on the
    hash bucket (vector-table-sized side), posexplode components, one
    (source, dim) aggregate."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    n_vec = e.agg(F.count(F.lit(1)).cast("long").alias("_nv"))
    toks = (
        d.select("source", F.explode(textops.tokens("text")).alias("tok"))
        .crossJoin(F.broadcast(n_vec))
        .select(
            "source",
            F.pmod(dedup.md5_token_hash(F.col("tok")), F.col("_nv")).alias(
                "vec_id"
            ),
        )
    )
    comp = toks.join(e, "vec_id").select(
        "source",
        F.posexplode(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("dim", "_c"),
    )
    return (
        comp.groupBy("source", F.col("dim").cast("long").alias("dim"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum(
                F.floor(F.col("_c") * F.lit(1e6) + F.lit(0.5)).cast("long")
            ).alias("_s"),
        )
        .select(
            "source",
            "dim",
            "n_toks",
            (
                F.col("_s").cast("double")
                / (F.col("n_toks").cast("double") * F.lit(1e6))
            ).alias("centroid"),
        )
    )


ORACLE_Q135 = """
with nv as (select cast(count(*) as bigint) as n from embeddings),
toks as (
  select source,
         cast(cast('0x' || substring(md5(tok), 1, 15) as ubigint) as bigint)
           % (select n from nv) as vec_id
  from (select source,
               unnest(list_filter(string_split(trim(text), ' '),
                                  x -> x <> '')) as tok
        from documents)),
comp as (
  select t.source, d.dim, cast(e.embedding[d.dim + 1] as double) as c
  from toks t join embeddings e using (vec_id)
  cross join (select unnest(range(64)) as dim) d)
select source, cast(dim as bigint) as dim,
       cast(count(*) as bigint) as n_toks,
       cast(sum(cast(floor(c * 1e6 + 0.5) as bigint)) as double)
         / (cast(count(*) as double) * 1e6) as centroid
from comp group by 1, 2
"""


def q136_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete churn-hazard curve: users bucketed by observed lifetime
    (days between first and last event); at_risk(d) = users surviving
    to day d (a suffix cumsum over the TINY lifetime histogram),
    hazard = churned/at_risk — survival analysis from exact counts, no
    float folds. The only window runs over lifetime-cardinality rows
    (constant-keyed, documented tiny)."""
    ev = load(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts")))
        .cast("long")
        .alias("lifetime_days")
    )
    hist = life.groupBy("lifetime_days").agg(
        F.count(F.lit(1)).cast("long").alias("churned")
    )
    w = (
        Window.partitionBy(F.pmod(F.xxhash64("lifetime_days"), F.lit(1)))
        .orderBy(F.col("lifetime_days").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return hist.select(
        "lifetime_days",
        "churned",
        F.sum("churned").over(w).cast("long").alias("at_risk"),
    ).withColumn(
        "hazard", F.col("churned").cast("double") / F.col("at_risk").cast("double")
    )


ORACLE_Q136 = """
with life as (
  select user_id,
         cast(date_diff('day', min(cast(ts as date)), max(cast(ts as date)))
              as bigint) as lifetime_days
  from events group by user_id),
hist as (select lifetime_days, cast(count(*) as bigint) as churned
         from life group by 1)
select lifetime_days, churned,
       cast(sum(churned) over (order by lifetime_days desc
                               rows between unbounded preceding and current row)
            as bigint) as at_risk,
       cast(churned as double)
         / cast(sum(churned) over (order by lifetime_days desc
                                   rows between unbounded preceding
                                   and current row) as double) as hazard
from hist
"""


def q137_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day (ext/asof.max_concurrency):
    sweep-line +1/-1 deltas with a TWO-PHASE global cumulative sum
    (features.global_cumsum) — no single-partition window over the
    event volume."""
    return asof.max_concurrency(load(spark, sf_dir, "events"), "user_id", "ts")


ORACLE_Q137 = """
with g as (
  select user_id, ts,
         case when lag(ts) over w is null
                   or (epoch_us(ts) - epoch_us(lag(ts) over w)) > 1800000000
              then 1 else 0 end as brk
  from events window w as (partition by user_id order by ts)),
s as (
  select user_id, ts,
         sum(brk) over (partition by user_id order by ts
                        rows between unbounded preceding and current row)
           as session_id
  from g),
spans as (
  select user_id, session_id, min(ts) as t_start, max(ts) as t_end
  from s group by 1, 2),
deltas as (
  select t_start as t, cast(1 as bigint) as delta, user_id, session_id
  from spans
  union all
  select t_end, cast(-1 as bigint), user_id, session_id from spans),
cum as (
  select t, delta,
         sum(delta) over (order by t, delta desc, user_id, session_id
                          rows between unbounded preceding and current row)
           as concurrent
  from deltas)
select cast(t as date) as day,
       cast(max(concurrent) as bigint) as max_concurrent,
       cast(sum(case when delta = 1 then 1 else 0 end) as bigint)
         as n_sessions
from cum group by 1
"""


def q138_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand triangle counts in the co-purchase graph (ext/graph
    .triangle_count over q113's basket pairs): degree-ordered
    orientation enumerates each triangle once with hub-bounded join
    fanout; the oracle replays it as the canonical x<y<z triple
    join."""
    from .ext import features, graph

    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    baskets = li.join(
        F.broadcast(p.select("p_partkey", "p_brand")),
        li.l_partkey == p.p_partkey,
    ).select("l_orderkey", "p_brand")
    edges = features.cooccurrence_lift(baskets, "l_orderkey", "p_brand")
    return graph.triangle_count(edges, "item_a", "item_b")


ORACLE_Q138 = """
with items as (
  select distinct l_orderkey, p_brand
  from lineitem join part on l_partkey = p_partkey),
pairs as (
  select a.p_brand as x, b.p_brand as y
  from items a join items b using (l_orderkey)
  where a.p_brand < b.p_brand
  group by 1, 2
  having count(*) >= 2),
tri as (
  select e1.x, e1.y, e2.y as z
  from pairs e1
  join pairs e2 on e1.y = e2.x
  join pairs e3 on e3.x = e1.x and e3.y = e2.y),
corners as (
  select x as node from tri
  union all select y from tri
  union all select z from tri)
select node, cast(count(*) as bigint) as triangles
from corners group by node
"""


def q139_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-subset detection (ext/dedup.containment_pairs, t=0.9):
    |A∩B|/min(|A|,|B|) catches quote/wrapper duplicates whose Jaccard
    is tiny — same inverted-index shape as q19, different ratio."""
    return dedup.containment_pairs(load(spark, sf_dir, "documents"), 0.9)


ORACLE_Q139 = """
with docs as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
docs3 as (select * from docs where len(toks) >= 3),
sh as (
  select distinct doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] as shingle
  from docs3, unnest(range(1, len(toks) - 1)) t(i)),
sizes as (select doc_id, count(*) as n from sh group by doc_id),
common as (
  select a.doc_id as d1, b.doc_id as d2, count(*) as c
  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
  group by 1, 2)
select d1, d2,
       cast(c as double) / cast(least(na.n, nb.n) as double) as containment,
       case when na.n < nb.n then 'd1'
            when nb.n < na.n then 'd2' else 'equal' end as direction
from common
join sizes na on na.doc_id = d1
join sizes nb on nb.doc_id = d2
where cast(c as double) / cast(least(na.n, nb.n) as double) >= 0.9
"""


def q140_extract_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction table (ext/textops.extract_matches): every
    5+-letter run in every document as (doc, occurrence, match) rows —
    a narrow codegen map, appearance-order occurrence index."""
    return textops.extract_matches(
        load(spark, sf_dir, "documents"), "[a-z]{5,}"
    )


ORACLE_Q140 = """
select doc_id,
       cast(generate_subscripts(m, 1) - 1 as bigint) as occurrence,
       unnest(m) as match
from (select doc_id, regexp_extract_all(text, '[a-z]{5,}', 0) as m
      from documents)
"""


def q141_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user serving state (ext/asof.latest_state): the 5 most
    recent event types newest-first per user — the feature-store ring
    buffer, built with a per-key top-k window. The library API
    (ext/asof.latest_state) returns `recent` as array<string>; the gate
    query renders it '|'-joined so the driver harness can hash it."""
    return asof.latest_state(
        load(spark, sf_dir, "events"), "user_id", "ts", "event_id", "event_type"
    ).withColumn("recent", F.array_join("recent", "|"))


ORACLE_Q141 = """
with r as (
  select user_id, ts, event_type,
         row_number() over (partition by user_id
                            order by ts desc, event_id desc) as rn
  from events)
select user_id, max(ts) as last_ts,
       cast(count(*) as bigint) as n_recent,
       string_agg(event_type, '|' order by rn) as recent
from r where rn <= 5
group by user_id
"""


def q142_window_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window EXACT distinct users: 2-hour windows every hour
    (each event lands in 2 windows via the built-in window explode),
    epoch-aligned starts so any engine replays the assignment. The
    exact-distinct-per-window cost is the honest one; the approximate
    path at 100 TB is the same shape over KMV sketches (q85/q108)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            F.window(F.col("ts"), "2 hours", "1 hour").alias("w"), "user_id"
        )
        .groupBy(F.col("w.start").alias("win_start"))
        .agg(F.countDistinct("user_id").cast("long").alias("uniq_users"))
    )


ORACLE_Q142 = """
with ev as (select ts, user_id, epoch_us(ts) as us from events),
bounds as (select min(us) as lo, max(us) as hi from ev),
starts as (
  select unnest(range((select lo from bounds) // 3600000000 - 1,
                      (select hi from bounds) // 3600000000 + 1))
           * 3600000000 as s),
j as (
  select s, user_id from ev join starts
  on ev.us >= s and ev.us < s + 7200000000)
select make_timestamp(s) as win_start,
       cast(count(distinct user_id) as bigint) as uniq_users
from j group by s
"""


def q143_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: decimal-exact monthly sums
    (tiny aggregate), lag window over the months, growth one fixed
    double expression — the BI staple. The only window runs over
    month-cardinality rows (constant-keyed tiny partition)."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(F.sum(_dec("o_totalprice")).alias("_rev"))
    w = Window.partitionBy(
        F.pmod(F.xxhash64("month"), F.lit(1))
    ).orderBy("month")
    prev = F.lag("_rev").over(w)
    return monthly.select(
        "month",
        F.col("_rev").cast("double").alias("revenue"),
        F.when(
            prev.isNotNull(),
            (F.col("_rev").cast("double") - prev.cast("double"))
            / prev.cast("double"),
        ).alias("mom_growth"),
    )


ORACLE_Q143 = """
with m as (
  select cast(date_trunc('month', o_orderdate) as date) as month,
         sum(cast(o_totalprice as decimal(12,2))) as rev
  from orders group by 1)
select month, cast(rev as double) as revenue,
       case when lag(rev) over w is not null then
         (cast(rev as double) - cast(lag(rev) over w as double))
           / cast(lag(rev) over w as double) end as mom_growth
from m window w as (order by month)
"""


def q144_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert quartiles: per user, seconds from first click to
    first LATER purchase; exact interpolated percentiles over the
    per-user diffs (Spark percentile == DuckDB quantile_cont, the q47
    equivalence). Two per-user min aggregates, one 1-row percentile
    aggregate — no window over raw events."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = ev.where(F.col("event_type") == "click").groupBy("user_id").agg(
        F.min(us).alias("_c")
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", us.alias("_p")
    )
    diffs = (
        buys.join(clicks, "user_id")
        .where(F.col("_p") >= F.col("_c"))
        .groupBy("user_id")
        .agg(F.min(F.col("_p") - F.col("_c")).alias("_d"))
        .select((F.col("_d").cast("double") / F.lit(1e6)).alias("secs"))
    )
    return diffs.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.expr("percentile(secs, 0.25)").alias("p25"),
        F.expr("percentile(secs, 0.5)").alias("p50"),
        F.expr("percentile(secs, 0.75)").alias("p75"),
    )


ORACLE_Q144 = """
with clicks as (
  select user_id, min(epoch_us(ts)) as c
  from events where event_type = 'click' group by user_id),
diffs as (
  select b.user_id,
         cast(min(epoch_us(b.ts) - c.c) as double) / 1e6 as secs
  from events b join clicks c using (user_id)
  where b.event_type = 'purchase' and epoch_us(b.ts) >= c.c
  group by b.user_id)
select cast(count(*) as bigint) as n_converted,
       quantile_cont(secs, 0.25) as p25,
       quantile_cont(secs, 0.5) as p50,
       quantile_cont(secs, 0.75) as p75
from diffs
"""


def q145_keeper_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup canonicalization: within each near-dup
    component (exact-Jaccard pairs -> connected components), keep the
    HIGHEST-QUALITY member (longest doc, ties to the lowest id) — the
    production alternative to q49's min-id keeper, because the best
    duplicate is rarely the first-crawled one. max_by over a
    (quality, -id) struct picks the keeper per component."""
    from .ext import graph

    d = load(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(d, threshold=0.8)
    comp = graph.connected_components(pairs)
    member = comp.join(
        d.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    keeper = member.groupBy("component").agg(
        F.max_by(
            "node", F.struct(F.col("n_chars"), (-F.col("node")).alias("_t"))
        ).alias("keep_id")
    )
    return (
        member.join(keeper, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("keep_id").cast("long").alias("keep_id"),
        )
    )


# same shingle/pair/component CTEs as ORACLE_Q49, then a quality argmax
ORACLE_Q145 = """
with recursive
docs as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
docs3 as (select * from docs where len(toks) >= 3),
sh as (
  select distinct doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] as shingle
  from docs3, unnest(range(1, len(toks) - 1)) t(i)),
sizes as (select doc_id, count(*) as n from sh group by doc_id),
common as (
  select a.doc_id as d1, b.doc_id as d2, count(*) as c
  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
  group by 1, 2),
pairs as (
  select d1, d2 from common
  join sizes na on na.doc_id = d1
  join sizes nb on nb.doc_id = d2
  where cast(c as double) / cast(na.n + nb.n - c as double) >= 0.8),
edges as (select d1 as a, d2 as b from pairs
          union all select d2, d1 from pairs),
reach(a, b) as (
  select a, b from edges
  union
  select r.a, e.b from reach r join edges e on r.b = e.a),
nodes as (select distinct a as node from edges),
comp as (
  select n.node, least(n.node, min(r.b)) as component
  from nodes n left join reach r on r.a = n.node
  group by n.node),
member as (
  select c.node, c.component, d.n_chars
  from comp c join documents d on d.doc_id = c.node),
keeper as (
  select component, node as keep_id
  from (select component, node,
               row_number() over (partition by component
                                  order by n_chars desc, node) rn
        from member)
  where rn = 1)
select m.node as doc_id, cast(k.keep_id as bigint) as keep_id
from member m join keeper k using (component)
"""


def q146_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of sessions with exactly one event —
    sessionize, one (user, session) aggregate, one per-day aggregate,
    rate a single division of exact counts."""
    s = asof.sessionize(load(spark, sf_dir, "events"), "user_id", "ts", 30)
    per_sess = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.to_date(F.min("ts")).alias("day"),
    )
    return per_sess.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum((F.col("_n") == 1).cast("long")).cast("long").alias("bounces"),
    ).withColumn(
        "bounce_rate",
        F.col("bounces").cast("double") / F.col("n_sessions").cast("double"),
    )


ORACLE_Q146 = """
with g as (
  select user_id, ts,
         case when lag(ts) over w is null
                   or (epoch_us(ts) - epoch_us(lag(ts) over w)) > 1800000000
              then 1 else 0 end as brk
  from events window w as (partition by user_id order by ts)),
s as (
  select user_id, ts,
         sum(brk) over (partition by user_id order by ts
                        rows between unbounded preceding and current row)
           as session_id
  from g),
per_sess as (
  select user_id, session_id, count(*) as n,
         cast(min(ts) as date) as day
  from s group by 1, 2)
select day, cast(count(*) as bigint) as n_sessions,
       cast(sum(case when n = 1 then 1 else 0 end) as bigint) as bounces,
       cast(sum(case when n = 1 then 1 else 0 end) as double)
         / cast(count(*) as double) as bounce_rate
from per_sess group by day
"""


def q147_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup accounting per source: how many docs and tokens exact
    text-dedup removes (first occurrence by doc id survives), the
    before/after report every pipeline run publishes. One per-text
    window for first-owner, token counts a narrow map, one per-source
    aggregate; pct one division."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    flagged = d.select(
        "source",
        F.size(textops.tokens("text")).cast("long").alias("_toks"),
        (F.row_number().over(w) > 1).cast("long").alias("_dup"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("total_docs"),
        F.sum("_dup").cast("long").alias("removed_docs"),
        F.sum("_toks").cast("long").alias("total_tokens"),
        F.sum(F.col("_dup") * F.col("_toks")).cast("long").alias(
            "removed_tokens"
        ),
    ).withColumn(
        "token_savings_pct",
        F.col("removed_tokens").cast("double")
        / F.col("total_tokens").cast("double"),
    )


ORACLE_Q147 = """
with flagged as (
  select source,
         cast(len(list_filter(string_split(trim(text), ' '), x -> x <> ''))
              as bigint) as toks,
         case when row_number() over (partition by text order by doc_id) > 1
              then 1 else 0 end as dup
  from documents)
select source, cast(count(*) as bigint) as total_docs,
       cast(sum(dup) as bigint) as removed_docs,
       cast(sum(toks) as bigint) as total_tokens,
       cast(sum(dup * toks) as bigint) as removed_tokens,
       cast(sum(dup * toks) as double) / cast(sum(toks) as double)
         as token_savings_pct
from flagged group by source
"""


def q148_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table numeric reconciliation: per order status, how many
    orders' header totals EXACTLY equal the decimal-exact sum of their
    line amounts (extprice * (1-disc) * (1+tax)) — the
    invoice-vs-lines audit every finance pipeline runs. Both sides
    stay decimal end-to-end, so 'match' is exact equality, not an
    epsilon; one co-keyed join, two aggregates."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    amt = (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
        * (F.lit(1).cast("decimal(12,2)") + _dec("l_tax"))
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(amt).cast("decimal(18,2)").alias("_line_total")
    )
    j = o.join(per_order, o.o_orderkey == per_order.l_orderkey, "left")
    match = (
        F.col("_line_total").isNotNull()
        & (F.col("_line_total") == _dec("o_totalprice").cast("decimal(18,2)"))
    ).cast("long")
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(match).cast("long").alias("n_exact_match"),
        F.sum(F.col("_line_total").isNull().cast("long"))
        .cast("long")
        .alias("n_lineless"),
    )


ORACLE_Q148 = """
with per_order as (
  select l_orderkey,
         cast(sum(cast(l_extendedprice as decimal(12,2))
                  * (cast(1 as decimal(12,2))
                     - cast(l_discount as decimal(12,2)))
                  * (cast(1 as decimal(12,2))
                     + cast(l_tax as decimal(12,2)))) as decimal(18,2))
           as line_total
  from lineitem group by l_orderkey)
select o_orderstatus, cast(count(*) as bigint) as n_orders,
       cast(sum(case when line_total is not null
                      and line_total
                          = cast(cast(o_totalprice as decimal(12,2))
                                 as decimal(18,2))
                     then 1 else 0 end) as bigint) as n_exact_match,
       cast(sum(case when line_total is null then 1 else 0 end) as bigint)
         as n_lineless
from orders left join per_order on o_orderkey = l_orderkey
group by o_orderstatus
"""


def q149_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution drift (ext/textops
    .source_drift_l1): EXACT L1 distance to the corpus distribution —
    every term |cnt_s*T - cnt*T_s| accumulates in longs, one final
    division."""
    return textops.source_drift_l1(load(spark, sf_dir, "documents"))


ORACLE_Q149 = """
with toks as (
  select source,
         unnest(list_filter(string_split(trim(text), ' '), x -> x <> ''))
           as tok
  from documents),
ps as (select source, tok, cast(count(*) as bigint) as cnt_s
       from toks group by 1, 2),
c as (select tok, cast(count(*) as bigint) as cnt from toks group by 1),
ts as (select source, cast(sum(cnt_s) as bigint) as t_s from ps group by 1),
t as (select cast(sum(cnt) as bigint) as t from c),
seen as (
  select ps.source,
         cast(count(*) as bigint) as vocab_seen,
         cast(sum(abs(ps.cnt_s * t.t - c.cnt * ts.t_s)) as bigint) as seen_num,
         cast(sum(c.cnt) as bigint) as seen_cnt,
         max(ts.t_s) as t_s, max(t.t) as t
  from ps join c using (tok) join ts using (source) cross join t
  group by ps.source)
select source, vocab_seen,
       cast(seen_num + (t - seen_cnt) * t_s as double)
         / (cast(t_s as double) * cast(t as double)) as l1_distance
from seen
"""


def q150_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic (ext/features.ks_statistic):
    order-value distributions of priority '1-URGENT' vs '5-LOW' —
    ECDF differences as exact long cross-products over a two-phase
    global cumsum, max'd, one final division."""
    from .ext import features

    return features.ks_statistic(
        load(spark, sf_dir, "orders"),
        "o_orderpriority",
        "o_totalprice",
        "o_orderkey",
        "1-URGENT",
        "5-LOW",
    )


ORACLE_Q150 = """
with sub as (
  select cast(o_totalprice as double) as v, o_orderkey as id,
         case when o_orderpriority = '1-URGENT' then 1 else 0 end as ia,
         case when o_orderpriority = '5-LOW' then 1 else 0 end as ib
  from orders where o_orderpriority in ('1-URGENT', '5-LOW')),
cum as (
  select v, sum(ia) over w as ca, sum(ib) over w as cb
  from sub window w as (order by v, id
                        rows between unbounded preceding and current row)),
steps as (select v, max(ca) as ca, max(cb) as cb from cum group by v),
ns as (select cast(sum(ia) as bigint) as n_a,
              cast(sum(ib) as bigint) as n_b from sub)
select n_a, n_b,
       cast(max(abs(ca * n_b - cb * n_a)) as double)
         / (cast(n_a as double) * cast(n_b as double)) as d_stat
from steps cross join ns
group by n_a, n_b
"""


def q151_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Lorenz curve) by customer decile: rank
    customers by exact cent totals via the two-phase global rank +
    exact NTILE, sum cents per decile, cumulative share from a 10-row
    window. Every quantity until the final share divisions is an exact
    long; cent totals stay under 2^53 so the long->double conversions
    are exact in any engine. The inequality profile behind 'top decile
    owns X% of revenue' — and, run over token counts instead of cents,
    the corpus-concentration check of a training mix."""
    from .ext import features

    o = load(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        (F.sum(_dec("o_totalprice")) * 100).cast("long").alias("_cents")
    )
    ranked = features.global_rank(cust, ["_cents", "o_custkey"], "_r")
    n_row = cust.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    dec = ranked.crossJoin(F.broadcast(n_row)).withColumn(
        "decile", features.ntile_from_rank(F.col("_r"), F.col("_n"), 10)
    )
    per = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("_cents").cast("long").alias("_dc"),
    )
    w = (
        Window.partitionBy(F.pmod(F.xxhash64("decile"), F.lit(1)))
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = per.agg(F.sum("_dc").cast("long").alias("_t"))
    return (
        per.withColumn("_cum", F.sum("_dc").over(w).cast("long"))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            (F.col("_dc").cast("double") / F.col("_t").cast("double")).alias(
                "share"
            ),
            (F.col("_cum").cast("double") / F.col("_t").cast("double")).alias(
                "cum_share"
            ),
        )
    )


ORACLE_Q151 = """
with cust as (
  select o_custkey,
         cast(sum(cast(o_totalprice as decimal(12,2))) * 100 as bigint)
           as cents
  from orders group by o_custkey),
r as (select o_custkey, cents,
             ntile(10) over (order by cents, o_custkey) as decile
      from cust),
per as (select decile, cast(count(*) as bigint) as n_customers,
               cast(sum(cents) as bigint) as dc
        from r group by decile),
tot as (select cast(sum(dc) as bigint) as t from per)
select cast(decile as bigint) as decile, n_customers,
       cast(dc as double) / cast(t as double) as share,
       cast(sum(dc) over (order by decile
                          rows between unbounded preceding and current row)
            as double) / cast(t as double) as cum_share
from per cross join tot
"""


def q152_bounded_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded conversion: users whose first purchase lands within
    ONE HOUR of their first click — the deadline-constrained funnel
    (plain ordered funnels have no clock). Two per-user min aggregates
    on exact epoch micros, one join, exact counts, one division."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    first_click = ev.where(F.col("event_type") == "click").groupBy(
        "user_id"
    ).agg(F.min(us).alias("_c"))
    first_buy_after = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", us.alias("_p"))
        .join(first_click, "user_id")
        .where(F.col("_p") >= F.col("_c"))
        .groupBy("user_id")
        .agg(F.min("_p").alias("_p"), F.max("_c").alias("_c"))
    )
    flags = first_click.join(
        first_buy_after.select(
            "user_id",
            (F.col("_p") - F.col("_c") <= 3_600_000_000).cast("long").alias(
                "_in_hour"
            ),
        ),
        "user_id",
        "left",
    )
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_clickers"),
        F.sum(F.coalesce(F.col("_in_hour"), F.lit(0)))
        .cast("long")
        .alias("n_converted_1h"),
    ).withColumn(
        "conversion_1h",
        F.col("n_converted_1h").cast("double")
        / F.col("n_clickers").cast("double"),
    )


ORACLE_Q152 = """
with fc as (
  select user_id, min(epoch_us(ts)) as c
  from events where event_type = 'click' group by user_id),
fb as (
  select e.user_id, min(epoch_us(e.ts)) as p, max(fc.c) as c
  from events e join fc using (user_id)
  where e.event_type = 'purchase' and epoch_us(e.ts) >= fc.c
  group by e.user_id),
flags as (
  select fc.user_id,
         case when fb.p - fb.c <= 3600000000 then 1 else 0 end as in_hour
  from fc left join fb using (user_id))
select cast(count(*) as bigint) as n_clickers,
       cast(sum(coalesce(in_hour, 0)) as bigint) as n_converted_1h,
       cast(sum(coalesce(in_hour, 0)) as double) / cast(count(*) as double)
         as conversion_1h
from flags
"""


def q153_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order-value trend line (ext/features.ols_by_group):
    exact OLS of cent totals against epoch days — sufficient statistics
    in decimal(38,0), one float expression at the end, bit-replayable
    (DuckDB mirrors with hugeint)."""
    from .ext import features

    o = load(spark, sf_dir, "orders")
    x = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
    y = (_dec("o_totalprice") * 100).cast("long")
    return features.ols_by_group(o, "o_orderpriority", x, y)


ORACLE_Q153 = """
with base as (
  select o_orderpriority,
         cast(date_diff('day', DATE '1992-01-01', cast(o_orderdate as date))
              as hugeint) as x,
         cast(cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)
              as hugeint) as y
  from orders),
s as (
  select o_orderpriority, cast(count(*) as bigint) as n,
         sum(x) as sx, sum(y) as sy, sum(x*x) as sxx, sum(x*y) as sxy
  from base group by o_orderpriority)
select o_orderpriority, n,
       cast(cast(n as hugeint)*sxy - sx*sy as double)
         / cast(cast(n as hugeint)*sxx - sx*sx as double) as slope,
       (cast(sy as double)
        - (cast(cast(n as hugeint)*sxy - sx*sy as double)
           / cast(cast(n as hugeint)*sxx - sx*sx as double))
          * cast(sx as double)) / cast(n as double) as intercept
from s
where n >= 2 and (cast(n as hugeint)*sxx - sx*sx) <> 0
"""


def q154_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day (ext/asof.
    cumulative_distinct_daily): first-day-per-user aggregate + a
    calendar-sized running window — no running-distinct state, all
    integers."""
    return asof.cumulative_distinct_daily(
        load(spark, sf_dir, "events"), "user_id", "ts"
    )


ORACLE_Q154 = """
with first as (
  select user_id, min(cast(ts as date)) as day from events group by user_id),
per as (select day, cast(count(*) as bigint) as new_keys from first group by day)
select day, new_keys,
       cast(sum(new_keys) over (order by day
                                rows between unbounded preceding and current row)
            as bigint) as cum_distinct
from per
"""


def q155_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives split new vs returning (ext/asof.
    new_vs_returning_daily): one first-day aggregate joined back to
    per-(user, day) activity; integer counts."""
    return asof.new_vs_returning_daily(
        load(spark, sf_dir, "events"), "user_id", "ts"
    )


ORACLE_Q155 = """
with act as (select distinct user_id, cast(ts as date) as day from events),
first as (select user_id, min(day) as f from act group by user_id)
select day, cast(count(*) as bigint) as active,
       cast(sum(case when day = f then 1 else 0 end) as bigint) as new_keys,
       cast(sum(case when day > f then 1 else 0 end) as bigint)
         as returning_keys
from act join first using (user_id) group by day
"""


def q156_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average order value per priority (ext/asof.
    time_weighted_average): each order's cents hold until the group's
    next order; products in decimal(38,0), one final division — DuckDB
    mirrors with hugeint."""
    o = load(spark, sf_dir, "orders")
    cents = (_dec("o_totalprice") * 100).cast("long")
    return asof.time_weighted_average(
        o, "o_orderpriority", "o_orderdate", cents, "o_orderkey"
    )


ORACLE_Q156 = """
with base as (
  select o_orderpriority, o_orderkey,
         epoch_us(o_orderdate) // 1000000 as sec,
         cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint) as v
  from orders),
obs as (
  select o_orderpriority, v,
         lead(sec) over (partition by o_orderpriority
                         order by sec, o_orderkey) - sec as gap
  from base)
select o_orderpriority,
       cast(count(*) as bigint) as n_intervals,
       cast(sum(gap) as bigint) as total_seconds,
       cast(sum(cast(v as hugeint) * cast(gap as hugeint)) as double)
         / cast(sum(gap) as double) as twap
from obs where gap is not null group by o_orderpriority
"""


def q157_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve (ext/textops.
    vocab_growth_curve): distinct tokens after docs 1..k, sampled every
    100 docs — first-appearance aggregate + calendar-style running
    window, all integers."""
    return textops.vocab_growth_curve(
        load(spark, sf_dir, "documents"), every=100
    )


ORACLE_Q157 = """
with toks as (
  select doc_id,
         unnest(list_filter(string_split(trim(text), ' '), x -> x <> '')) as tok
  from documents),
first as (select tok, min(doc_id) as d from toks group by tok),
per as (select d, cast(count(*) as bigint) as nw from first group by d),
curve as (
  select d, cast(sum(nw) over (order by d
                               rows between unbounded preceding and current row)
               as bigint) as vocab_size
  from per)
select d as docs_ingested, vocab_size from curve where d % 100 = 0
"""


def q158_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty (ext/textops.ngram_novelty): fraction of a
    doc's shingles that occur nowhere else — inverted-index shape,
    integers until one final division."""
    return textops.ngram_novelty(load(spark, sf_dir, "documents"))


ORACLE_Q158 = """
with docs as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
docs3 as (select * from docs where len(toks) >= 3),
sh as (
  select distinct doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] as shingle
  from docs3, unnest(range(1, len(toks) - 1)) t(i)),
dfreq as (select shingle, cast(count(*) as bigint) as df
          from sh group by shingle)
select doc_id, cast(count(*) as bigint) as n_shingles,
       cast(sum(case when df = 1 then 1 else 0 end) as bigint)
         as n_unique_to_doc,
       cast(sum(case when df = 1 then 1 else 0 end) as double)
         / cast(count(*) as double) as novelty
from sh join dfreq using (shingle) group by doc_id
"""


def q159_cluster_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup dedup decision (ext/dedup.
    near_dup_cluster_keeper): MinHash+LSH pairs -> connected components
    -> one keeper per cluster by n_chars quality, ties to the smallest
    id; singletons keep themselves. LSH at threshold 0.8 equals the
    exact-Jaccard pair set on this corpus (the pinned q19==q20
    property), so the oracle clusters the exact pairs."""
    from .ext import dedup

    return dedup.near_dup_cluster_keeper(
        load(spark, sf_dir, "documents"), "n_chars"
    )


ORACLE_Q159 = """
with recursive
docs as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
docs3 as (select * from docs where len(toks) >= 3),
sh as (
  select distinct doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] as shingle
  from docs3, unnest(range(1, len(toks) - 1)) t(i)),
sizes as (select doc_id, count(*) as n from sh group by doc_id),
common as (
  select a.doc_id as d1, b.doc_id as d2, count(*) as c
  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
  group by 1, 2),
pairs as (
  select d1, d2 from common
  join sizes na on na.doc_id = d1
  join sizes nb on nb.doc_id = d2
  where cast(c as double) / cast(na.n + nb.n - c as double) >= 0.8),
edges as (select d1 as a, d2 as b from pairs
          union all select d2, d1 from pairs),
reach(a, b) as (
  select a, b from edges
  union
  select r.a, e.b from reach r join edges e on r.b = e.a),
nodes as (select distinct a as node from edges),
comp as (
  select n.node as doc_id, least(n.node, min(r.b)) as component
  from nodes n left join reach r on r.a = n.node group by n.node),
labeled as (
  select d.doc_id, cast(d.n_chars as bigint) as quality,
         coalesce(c.component, d.doc_id) as cluster_id
  from documents d left join comp c using (doc_id)),
ranked as (
  select *, row_number() over (partition by cluster_id
                               order by quality desc, doc_id asc) as rn,
         count(*) over (partition by cluster_id) as nm
  from labeled)
select doc_id, cluster_id, quality, cast(nm as bigint) as n_members,
       cast(case when rn = 1 then 1 else 0 end as bigint) as kept
from ranked
"""


def q160_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map synthesis + pruning audit (compare.zone_map_stats /
    pruning_audit): per-1000-orderkey bucket min/max of l_shipdate,
    then the fraction of buckets (and rows) a 1994 ship-date predicate
    could skip on stats alone — parquet row-group pruning as a
    queryable, auditable table."""
    from . import compare as comparemod

    li = load(spark, sf_dir, "lineitem")
    stats = comparemod.zone_map_stats(li, "l_orderkey", 1000, "l_shipdate")
    return comparemod.pruning_audit(
        stats,
        "l_shipdate",
        F.lit("1994-01-01 00:00:00").cast("timestamp"),
        F.lit("1994-12-31 23:59:59.999999").cast("timestamp"),
    )


ORACLE_Q160 = """
with stats as (
  select cast(floor(l_orderkey / 1000) as bigint) as bucket,
         cast(count(*) as bigint) as n_rows,
         min(l_shipdate) as smin, max(l_shipdate) as smax
  from lineitem group by 1),
flags as (
  select *, (smax < TIMESTAMP '1994-01-01 00:00:00'
             or smin > TIMESTAMP '1994-12-31 23:59:59.999999') as prunable
  from stats)
select cast(count(*) as bigint) as n_buckets,
       cast(sum(case when prunable then 1 else 0 end) as bigint)
         as prunable_buckets,
       cast(sum(n_rows) as bigint) as rows_total,
       cast(sum(case when prunable then n_rows else 0 end) as bigint)
         as rows_skipped,
       cast(sum(case when prunable then n_rows else 0 end) as double)
         / cast(sum(n_rows) as double) as skip_fraction
from flags
"""



def q161_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long UNPIVOT of per-doc quality metrics (n_tokens,
    char_len, stop_cnt) into a tall (doc_id, metric, value) table —
    the melt every metrics store wants; a pure narrow map (Spark's
    native unpivot/Expand, no shuffle)."""
    q = textops.quality_score(load(spark, sf_dir, "documents"))
    return q.select("doc_id", "n_tokens", "char_len", "stop_cnt").unpivot(
        ["doc_id"], ["n_tokens", "char_len", "stop_cnt"], "metric", "value"
    )


ORACLE_Q161 = """
with q as (
  select doc_id,
         cast(len(list_filter(string_split(trim(text), ' '), x -> x <> ''))
              as bigint) as n_tokens,
         cast(length(text) as bigint) as char_len,
         cast(len(list_filter(string_split(trim(text), ' '),
                              x -> x in ('the', 'a', 'of'))) as bigint)
           as stop_cnt
  from documents)
select doc_id, 'n_tokens' as metric, n_tokens as value from q
union all select doc_id, 'char_len', char_len from q
union all select doc_id, 'stop_cnt', stop_cnt from q
"""


def q162_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment + balance audit (ext/sampling.
    shard_balance_audit): portable-md5 sharding of documents weighted
    by n_chars, exact per-shard totals, one share division."""
    from .ext import sampling

    return sampling.shard_balance_audit(
        load(spark, sf_dir, "documents"), "doc_id", "n_chars", n_shards=8
    )


ORACLE_Q162 = """
with s as (
  select cast(cast('0x' || substring(md5('shard:' || cast(doc_id as varchar)),
                                     1, 15) as ubigint) % 8 as bigint) as shard,
         cast(n_chars as bigint) as w
  from documents),
per as (select shard, cast(count(*) as bigint) as n_rows,
               cast(sum(w) as bigint) as total_weight
        from s group by shard),
tot as (select cast(sum(n_rows) as bigint) as t from per)
select shard, n_rows, total_weight,
       cast(n_rows as double) / cast(t as double) as row_share
from per cross join tot
"""


def q163_bloom_semi_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join audit (ext/skew.bloom_semi_join_audit):
    customers probed against a 256-bit, 3-hash portable bloom built
    from region-2 nations — the measured false-positive cost of a
    runtime filter vs the exact semi-join, as one audit row."""
    from .ext import skew

    cust = load(spark, sf_dir, "customer")
    dim = load(spark, sf_dir, "nation").where(F.col("n_regionkey") == 2)
    return skew.bloom_semi_join_audit(
        cust, dim, "c_nationkey", "n_nationkey", m_bits=256, k=3
    )


ORACLE_Q163 = """
with bkeys as (
  select distinct n_nationkey as key from nation where n_regionkey = 2),
bpos as (
  select distinct
         cast('0x' || substring(md5('bloom:' || cast(i as varchar) || ':'
                                    || cast(key as varchar)), 1, 15)
              as ubigint) % 256 as pos
  from bkeys, unnest([0, 1, 2]) t(i)),
ppos as (
  select c_custkey, c_nationkey,
         cast('0x' || substring(md5('bloom:' || cast(i as varchar) || ':'
                                    || cast(c_nationkey as varchar)), 1, 15)
              as ubigint) % 256 as pos
  from customer, unnest([0, 1, 2]) t(i)),
flags as (
  select c_custkey,
         min(case when bp.pos is not null then 1 else 0 end) as pass,
         max(case when c_nationkey in (select key from bkeys)
                  then 1 else 0 end) as istrue
  from ppos left join bpos bp using (pos)
  group by c_custkey)
select cast(count(*) as bigint) as n_probe,
       cast(sum(pass) as bigint) as n_bloom_pass,
       cast(sum(istrue) as bigint) as n_true_match,
       cast(sum(case when pass = 1 and istrue = 0 then 1 else 0 end)
            as bigint) as false_positives,
       cast(sum(case when pass = 1 and istrue = 0 then 1 else 0 end)
            as double) / cast(count(*) as double) as fp_rate
from flags
"""



def q164_join_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size forecast (ext/skew.join_size_forecast): predicted
    |orders x lineitem on custkey-side keys| from the two per-key
    count tables — products in decimal(38,0), exact shares, top-10
    contributing keys."""
    from .ext import skew

    return skew.join_size_forecast(
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
        "o_orderkey",
        "l_orderkey",
    )


ORACLE_Q164 = """
with ca as (select o_orderkey as key, cast(count(*) as bigint) as cnt_a
            from orders group by 1),
cb as (select l_orderkey as key, cast(count(*) as bigint) as cnt_b
       from lineitem group by 1),
per as (select key, cnt_a, cnt_b,
               cast(cnt_a as hugeint) * cast(cnt_b as hugeint) as o
        from ca join cb using (key)),
tot as (select sum(o) as t from per)
select key, cnt_a, cnt_b, cast(o as bigint) as out_rows,
       cast(t as bigint) as total_out,
       cast(o as double) / cast(t as double) as share
from per cross join tot
order by o desc, key
limit 10
"""


def q165_salting_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting-effectiveness model (ext/skew.salting_effectiveness):
    what splitting every key across 8 salts buys the events
    user-shuffle — hottest-task row count before/after, one speedup
    division."""
    from .ext import skew

    return skew.salting_effectiveness(
        load(spark, sf_dir, "events"), "user_id", n_salts=8
    )


ORACLE_Q165 = """
with c as (select user_id, cast(count(*) as bigint) as c
           from events group by user_id)
select cast(count(*) as bigint) as n_keys,
       cast(sum(c) as bigint) as rows_total,
       cast(max(c) as bigint) as max_key_rows,
       cast(max(ceil(cast(c as double) / 8)) as bigint) as post_salt_max,
       cast(max(c) as double)
         / cast(max(ceil(cast(c as double) / 8)) as double) as speedup
from c
"""


def q166_partial_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Algebraic materialized-view maintenance (compare.
    partial_daily_aggregates |> merge_partials): month-grain order
    stats REBUILT from day-grain partials — the oracle aggregates the
    raw rows directly, so the hash check IS the merge-correctness
    identity."""
    from . import compare as comparemod

    o = load(spark, sf_dir, "orders")
    cents = (_dec("o_totalprice") * 100).cast("long")
    daily = comparemod.partial_daily_aggregates(
        o, "o_orderpriority", "o_orderdate", cents
    )
    return comparemod.merge_partials(daily, "o_orderpriority", "month")


ORACLE_Q166 = """
select o_orderpriority,
       cast(date_trunc('month', cast(o_orderdate as date)) as date) as period,
       cast(count(*) as bigint) as cnt,
       cast(sum(cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint))
            as bigint) as sum,
       cast(min(cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint))
            as bigint) as min,
       cast(max(cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint))
            as bigint) as max
from orders
group by 1, 2
"""



def q167_reference_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus score calibration (ext/features.
    reference_percentile): every document's n_chars percentile within
    the lang='en' reference subset — the global_cumsum merge trick, no
    sort of probe-vs-reference, exact until one division."""
    from .ext import features

    docs = load(spark, sf_dir, "documents")
    return features.reference_percentile(
        docs, docs.where(F.col("lang") == "en"), "n_chars", "doc_id"
    )


ORACLE_Q167 = """
with ref as (select cast(n_chars as bigint) as v from documents
             where lang = 'en'),
refn as (select cast(count(*) as bigint) as n from ref),
cumt as (select v, cast(count(*) as bigint) as c from ref group by v),
probe as (select doc_id, cast(n_chars as bigint) as n_chars from documents)
select p.doc_id, p.n_chars, refn.n as ref_n,
       cast((select coalesce(sum(c), 0) from cumt where cumt.v <= p.n_chars)
            as double) / cast(refn.n as double) as pct
from probe p cross join refn
"""


def q168_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient of the brand co-purchase graph
    (ext/graph.clustering_coefficient over q113's basket pairs):
    triangles / wedges per node, degree-ordered triangle enumeration,
    one exact division."""
    from .ext import features, graph

    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    baskets = li.join(
        F.broadcast(p.select("p_partkey", "p_brand")),
        li.l_partkey == p.p_partkey,
    ).select("l_orderkey", "p_brand")
    edges = features.cooccurrence_lift(baskets, "l_orderkey", "p_brand")
    return graph.clustering_coefficient(edges, "item_a", "item_b")


ORACLE_Q168 = """
with items as (
  select distinct l_orderkey, p_brand
  from lineitem join part on l_partkey = p_partkey),
pairs as (
  select a.p_brand as x, b.p_brand as y
  from items a join items b using (l_orderkey)
  where a.p_brand < b.p_brand
  group by 1, 2
  having count(*) >= 2),
deg as (
  select node, cast(count(*) as bigint) as degree
  from (select x as node from pairs union all select y from pairs)
  group by node),
tri as (
  select e1.x, e1.y, e2.y as z
  from pairs e1
  join pairs e2 on e1.y = e2.x
  join pairs e3 on e3.x = e1.x and e3.y = e2.y),
tcnt as (
  select node, cast(count(*) as bigint) as t
  from (select x as node from tri
        union all select y from tri
        union all select z from tri)
  group by node)
select d.node, d.degree, cast(coalesce(t.t, 0) as bigint) as triangles,
       case when d.degree >= 2
            then cast(coalesce(t.t, 0) as double)
                 / (cast(d.degree as double) * cast(d.degree - 1 as double) / 2)
            else 0.0 end as coefficient
from deg d left join tcnt t on t.node = d.node
"""


def q169_encoding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding / mojibake QA (ext/textops.encoding_profile): printable-
    ASCII vs non-ASCII vs U+FFFD counts per doc, narrow codegen map,
    one division."""
    return textops.encoding_profile(load(spark, sf_dir, "documents"))


ORACLE_Q169 = """
select doc_id,
       cast(length(text) as bigint) as n_chars,
       cast(length(regexp_replace(text, '[^ -~]', '', 'g')) as bigint)
         as ascii_chars,
       cast(length(text) - length(regexp_replace(text, '[^ -~]', '', 'g'))
            as bigint) as non_ascii,
       cast(length(text) - length(replace(text, chr(65533), ''))
            as bigint) as replacement_chars,
       case when length(text) > 0
            then cast(length(regexp_replace(text, '[^ -~]', '', 'g'))
                      as double) / cast(length(text) as double)
            else 1.0 end as ascii_ratio,
       cast(case when (case when length(text) > 0
                  then cast(length(regexp_replace(text, '[^ -~]', '', 'g'))
                            as double) / cast(length(text) as double)
                  else 1.0 end) >= 0.8
             and length(text) = length(replace(text, chr(65533), ''))
            then 1 else 0 end as bigint) as flag_ok
from documents
"""


def q170_quantile_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit (ext/skew.quantile_error_audit): the
    hash-sampled quantile profile's true rank error per event_type and
    quantile, measured exactly against the full events table — the
    companion honesty check to q98's profile itself."""
    from .ext import skew

    return skew.quantile_error_audit(
        load(spark, sf_dir, "events"), "event_type", "value", "event_id"
    )


ORACLE_Q170 = """
with s as (
  select event_type, cast(value as double) as v
  from events
  where cast(cast('0x' || substring(md5('sq|' || cast(event_id as varchar)),
                                    1, 15) as ubigint) as bigint)
        < 230584300921369408),
prof as (
  select event_type,
         quantile_cont(v, 0.25) as p25, quantile_cont(v, 0.5) as p50,
         quantile_cont(v, 0.75) as p75, quantile_cont(v, 0.95) as p95
  from s group by event_type),
long_form as (
  select event_type, cast(0.25 as double) as p, p25 as edge from prof
  union all select event_type, cast(0.5 as double), p50 from prof
  union all select event_type, cast(0.75 as double), p75 from prof
  union all select event_type, cast(0.95 as double), p95 from prof),
per as (
  select e.event_type, lf.p, lf.edge,
         cast(count(*) as bigint) as n_rows,
         cast(sum(case when cast(e.value as double) <= lf.edge
                       then 1 else 0 end) as bigint) as rank_le
  from events e join long_form lf using (event_type)
  group by 1, 2, 3)
select event_type, p, edge, n_rows, rank_le,
       abs(cast(rank_le as double) / cast(n_rows as double) - p)
         as rank_error
from per
"""


def q171_calendar_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-completeness monitor (ext/asof.calendar_gaps): per user,
    every calendar day inside that user's own [first, last] activity
    span with NO events — the silence that means a crawler or
    pipeline stage died. Grouped by user_id (event_type spans are
    gap-free at every SF — a 0-row gate proves nothing); the explode
    is calendar-sized (days in span), never data-sized."""
    from .ext import asof

    return asof.calendar_gaps(load(spark, sf_dir, "events"), "user_id", "ts")


ORACLE_Q171 = """
with days as (
  select distinct user_id, cast(ts as date) as d from events),
span as (
  select user_id, min(d) as lo, max(d) as hi from days group by 1),
allday as (
  select user_id,
         cast(unnest(generate_series(cast(lo as timestamp),
                                     cast(hi as timestamp),
                                     interval 1 day)) as date) as missing_day
  from span)
select a.user_id, a.missing_day
from allday a
left join days dd
  on a.user_id = dd.user_id and a.missing_day = dd.d
where dd.d is null
"""


def q172_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-release gate (ext/features.k_anonymity_audit): share of
    customer rows sitting in (nation, market-segment) quasi-identifier
    groups smaller than k=5 — the k-anonymity audit run before a
    dataset leaves the boundary. One groupBy + one tiny reduction."""
    from .ext import features

    return features.k_anonymity_audit(
        load(spark, sf_dir, "customer"), ["c_nationkey", "c_mktsegment"], k=5
    )


ORACLE_Q172 = """
with g as (
  select c_nationkey, c_mktsegment, cast(count(*) as bigint) as _n
  from customer group by 1, 2)
select cast(5 as bigint) as k,
       cast(sum(_n) as bigint) as n_rows,
       cast(count(*) as bigint) as n_groups,
       cast(sum(case when _n < 5 then 1 else 0 end) as bigint)
         as groups_below_k,
       cast(sum(case when _n < 5 then _n else 0 end) as bigint)
         as rows_at_risk,
       cast(sum(case when _n < 5 then _n else 0 end) as double)
         / cast(sum(_n) as double) as at_risk_share
from g
"""


def q173_mode_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode with a deterministic tiebreak
    (ext/features.mode_by_group): the most frequent order status per
    priority, ties broken toward the smallest value — the replayable
    version of engine MODE() aggregates whose tie choice is
    implementation-defined. Two partial-agg shuffles, no window."""
    from .ext import features

    return features.mode_by_group(
        load(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus"
    )


ORACLE_Q173 = """
with cnt as (
  select o_orderpriority, o_orderstatus, cast(count(*) as bigint) as _c
  from orders group by 1, 2),
r as (
  select *, row_number() over (
    partition by o_orderpriority order by _c desc, o_orderstatus asc) as rn
  from cnt)
select o_orderpriority, o_orderstatus as mode_value, _c as mode_count
from r where rn = 1
"""


def q174_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness (ext/asof.stickiness): per day, distinct
    users active that day vs the trailing 7-day window, exactly — the
    engagement ratio, with the trailing window built by a
    calendar-sized explode instead of a per-day self-join."""
    from .ext import asof

    return asof.stickiness(load(spark, sf_dir, "events"), "user_id", "ts", 7)


ORACLE_Q174 = """
with days as (
  select distinct cast(ts as date) as day, user_id as u from events),
dau as (
  select day, cast(count(*) as bigint) as dau from days group by 1),
cover as (
  select distinct u,
         cast(unnest(generate_series(cast(day as timestamp),
                                     cast(day as timestamp) + interval 6 day,
                                     interval 1 day)) as date) as day
  from days),
wau as (
  select day, cast(count(*) as bigint) as wau from cover group by 1)
select dau.day, dau.dau, wau.wau,
       cast(dau.dau as double) / cast(wau.wau as double) as stickiness
from dau join wau using (day)
order by dau.day
"""


def q175_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust mean (ext/features.winsorized_stats): per
    event_type, values clipped into the exact [p5, p95] band, mean
    from an exact decimal sum — the repaired aggregate companion to
    q97's MAD outlier flags."""
    from .ext import features

    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    return features.winsorized_stats(ev, "event_type", "value", 0.05, 0.95)


ORACLE_Q175 = """
with e as (
  select event_type, cast(value as double) as v
  from events where value is not null),
b as (
  select event_type,
         quantile_cont(v, 0.05) as p_lo,
         quantile_cont(v, 0.95) as p_hi
  from e group by 1),
j as (
  select e.event_type, b.p_lo, b.p_hi,
         least(greatest(e.v, b.p_lo), b.p_hi) as c,
         (case when e.v < b.p_lo then 1 else 0 end
          + case when e.v > b.p_hi then 1 else 0 end) as clip
  from e join b using (event_type))
select event_type,
       cast(count(*) as bigint) as n,
       min(p_lo) as p_lo,
       min(p_hi) as p_hi,
       cast(sum(clip) as bigint) as n_clipped,
       cast(sum(cast(c as decimal(18,6))) as double)
         / cast(count(*) as double) as winsorized_mean
from j group by event_type
"""


def q176_interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time histogram (ext/asof.interarrival_histogram):
    per event_type, how the microsecond-exact gaps between a user's
    consecutive events distribute across fixed CASE buckets — the
    burstiness profile that sizes session windows and watermarks."""
    from .ext import asof

    return asof.interarrival_histogram(
        load(spark, sf_dir, "events"), "event_type", "user_id", "ts", "event_id"
    )


ORACLE_Q176 = """
with g as (
  select event_type,
         epoch_us(ts) - lag(epoch_us(ts)) over (
           partition by event_type, user_id order by ts, event_id) as gap
  from events)
select event_type,
       case when gap <= 1000000 then '<=1s'
            when gap <= 10000000 then '<=10s'
            when gap <= 60000000 then '<=1m'
            when gap <= 600000000 then '<=10m'
            when gap <= 3600000000 then '<=1h'
            when gap <= 86400000000 then '<=1d'
            else '>1d' end as bucket,
       cast(count(*) as bigint) as n_gaps
from g where gap is not null
group by 1, 2
"""


def q177_fk_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-completeness matrix (compare.fk_completeness_matrix):
    one audit table over every declared FK — the run-this-first report
    before `add constraint` on a loaded target, generalizing q67's
    single-FK audit to the whole schema."""
    from .catalog import FIXTURE_FOREIGN_KEYS
    from .compare import fk_completeness_matrix

    pairs = [
        (
            fk.constraint_name,
            load(spark, sf_dir, fk.table),
            fk.columns[0],
            load(spark, sf_dir, fk.ref_table),
            fk.ref_columns[0],
        )
        for fk in FIXTURE_FOREIGN_KEYS
    ]
    return fk_completeness_matrix(pairs)


def _fk_audit_block(fk_name: str, child: str, ckey: str, parent: str, pkey: str) -> str:
    return f"""select '{fk_name}' as fk_name,
       cast(count(*) as bigint) as n_child,
       cast(sum(case when {ckey} is null then 1 else 0 end) as bigint)
         as n_null_key,
       cast(sum(case when {ckey} is not null and not exists
                  (select 1 from {parent} p where p.{pkey} = c.{ckey})
                then 1 else 0 end) as bigint) as n_orphans,
       cast(sum(case when {ckey} is not null and not exists
                  (select 1 from {parent} p where p.{pkey} = c.{ckey})
                then 1 else 0 end) as double)
         / cast(greatest(count(*) - sum(case when {ckey} is null then 1
                                             else 0 end), 1) as double)
         as orphan_share
from {child} c"""


def q178_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup capstone (ext/similarity.semantic_dedup_keeper):
    RP-LSH candidate pairs -> exact-cosine threshold -> connected
    components -> one highest-quality keeper per cluster — the
    embedding-space twin of q159's lexical pipeline, run AFTER minhash
    to catch near-identical meaning in different tokens. Threshold 0.42
    sits inside this synthetic corpus's similarity range so real
    multi-member clusters form at every SF."""
    from .ext import similarity

    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), F.col("n_chars").alias("quality")
    )
    # n_planes PINNED at 32 so ORACLE_Q178's inlined planes replay
    # bit-for-bit at any SF; production callers default to
    # n_planes=None -> rp_lsh_params auto-sizing (VERDICT r10 #1).
    return similarity.semantic_dedup_keeper(
        emb, docs, threshold=0.42, n_planes=32
    )


def _oracle_q178() -> str:
    """DuckDB replay of semantic_dedup_keeper: the q32 plane/band
    inlining (deterministic sha-seeded planes; both engines accumulate
    the dot products sequentially, so buckets and cosines agree
    bit-for-bit), Spark's exact cosine formula
    dot/(sqrt(ss_a)*sqrt(ss_b)) spelled out, then q159's recursive
    transitive closure + keeper. No float column in the output."""
    from .ext.similarity import _rp_planes

    n_planes, n_bands, dim = 32, 4, 64
    width = n_planes // n_bands
    planes = _rp_planes(n_planes, dim)

    def lit(plane: list) -> str:
        return "[" + ", ".join(repr(x) for x in plane) + "]"

    def bucket(bi: int) -> str:
        return " + ".join(
            f"(case when list_dot_product(v, {lit(planes[bi * width + i])}) >= 0"
            f" then {2 ** i} else 0 end)"
            for i in range(width)
        )

    keyed = "\nunion all\n".join(
        f"select vec_id, v, {bi} as band, {bucket(bi)} as bucket from e"
        for bi in range(n_bands)
    )
    return f"""
with recursive
e as (select vec_id,
             list_transform(embedding, x -> cast(x as double)) as v
      from embeddings),
keyed as (
{keyed}
),
cand as (
  select distinct a.vec_id as d1, b.vec_id as d2
  from keyed a join keyed b
    on a.band = b.band and a.bucket = b.bucket and a.vec_id < b.vec_id),
pairs as (
  select d1, d2
  from cand join e ea on ea.vec_id = cand.d1 join e eb on eb.vec_id = cand.d2
  where list_dot_product(ea.v, eb.v)
          / (sqrt(list_dot_product(ea.v, ea.v))
             * sqrt(list_dot_product(eb.v, eb.v))) >= 0.42),
edges as (select d1 as a, d2 as b from pairs
          union all select d2, d1 from pairs),
reach(a, b) as (
  select a, b from edges
  union
  select r.a, e2.b from reach r join edges e2 on r.b = e2.a),
nodes as (select distinct a as node from edges),
comp as (
  select n.node as vec_id, least(n.node, min(r.b)) as component
  from nodes n left join reach r on r.a = n.node group by n.node),
labeled as (
  select em.vec_id, cast(d.n_chars as bigint) as quality,
         coalesce(c.component, em.vec_id) as cluster_id
  from embeddings em
  join documents d on d.doc_id = em.vec_id
  left join comp c on c.vec_id = em.vec_id),
ranked as (
  select *, row_number() over (partition by cluster_id
                               order by quality desc, vec_id asc) as rn,
         count(*) over (partition by cluster_id) as nm
  from labeled)
select vec_id, cluster_id, quality, cast(nm as bigint) as n_members,
       cast(case when rn = 1 then 1 else 0 end as bigint) as kept
from ranked
"""


ORACLE_Q178 = _oracle_q178()


def q179_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-concentration profile (ext/sampling.source_concentration):
    per language, Herfindahl index + effective source count from exact
    integer aggregates — 'is this slice of the corpus one mirror site
    in a trenchcoat?' — with no order-dependent float sums anywhere."""
    from .ext import sampling

    return sampling.source_concentration(
        load(spark, sf_dir, "documents"), "lang", "source"
    )


ORACLE_Q179 = """
with cnt as (
  select lang, source, cast(count(*) as bigint) as c
  from documents group by 1, 2),
a as (
  select lang, cast(sum(c) as bigint) as n_docs,
         cast(count(*) as bigint) as n_sources,
         cast(max(c) as bigint) as top,
         sum(cast(c as hugeint) * cast(c as hugeint)) as ss
  from cnt group by lang)
select lang, n_docs, n_sources,
       cast(top as double) / cast(n_docs as double) as top_share,
       cast(ss as double)
         / (cast(n_docs as double) * cast(n_docs as double)) as hhi,
       1.0 / (cast(ss as double)
              / (cast(n_docs as double) * cast(n_docs as double)))
         as effective_sources
from a
"""


def q180_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix (ext/dedup.cross_source_dup_matrix):
    the q20 MinHash+LSH near-dup pairs rolled up to unordered source
    pairs — WHERE the duplication comes from. Oracle = the exact q19
    pair SQL + the same rollup (q20 == q19 set-exactly at gate SFs)."""
    from .ext import dedup as dd

    return dd.cross_source_dup_matrix(load(spark, sf_dir, "documents"), 0.8)


ORACLE_Q180 = f"""
with p as ({ORACLE_Q19})
select least(da.source, db.source) as source_a,
       greatest(da.source, db.source) as source_b,
       cast(count(*) as bigint) as n_pairs
from p
join documents da on da.doc_id = p.d1
join documents db on db.doc_id = p.d2
group by 1, 2
"""


def q181_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit (ext/features.benford_audit): chi2
    distance of o_totalprice's leading-digit distribution from
    Benford's law, per order priority — the synthetic-data / fraud /
    unit-mixup screen for financial columns. Digits come from the
    decimal string rendering; chi2 is a fixed-order expression chain."""
    from .ext import features

    return features.benford_audit(
        load(spark, sf_dir, "orders"), "o_orderpriority", "o_totalprice"
    )


def _oracle_q181() -> str:
    """Mirror of benford_audit in SQL: same digit extraction (decimal
    string), same inlined probability literals, same left-associative
    chi2 term order — so every double replays bit-for-bit."""
    from .ext.features import BENFORD_P

    obs = ",\n         ".join(
        f"cast(sum(case when d = '{i}' then 1 else 0 end) as bigint) as o{i}"
        for i in range(1, 10)
    )
    chi_terms = " + ".join(
        f"((cast(o{i} as double) - nd * {BENFORD_P[i - 1]!r})"
        f" * (cast(o{i} as double) - nd * {BENFORD_P[i - 1]!r})"
        f" / (nd * {BENFORD_P[i - 1]!r}))"
        for i in range(1, 10)
    )
    dev_terms = ", ".join(
        f"abs(cast(o{i} as double) / nd - {BENFORD_P[i - 1]!r})"
        for i in range(1, 10)
    )
    return f"""
with base as (
  select o_orderpriority,
         substring(cast(cast(o_totalprice as decimal(12,2)) as varchar), 1, 1)
           as d
  from orders where cast(o_totalprice as double) >= 1),
agg as (
  select o_orderpriority, cast(count(*) as bigint) as n,
         {obs}
  from base group by o_orderpriority),
x as (select *, cast(n as double) as nd from agg)
select o_orderpriority, n,
       {chi_terms} as chi2,
       greatest({dev_terms}) as max_abs_dev
from x
"""


ORACLE_Q181 = _oracle_q181()


def q182_lag1_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of daily event volume per event_type
    (ext/features.lag1_autocorr) — the trend screen before fitting any
    forecaster, with decimal-exact product sums (q103 discipline)."""
    from .ext import features

    return features.lag1_autocorr(load(spark, sf_dir, "events"), "event_type", "ts")


ORACLE_Q182 = """
with daily as (
  select event_type, cast(ts as date) as day,
         cast(count(*) as bigint) as c
  from events group by 1, 2),
pairs as (
  select event_type, c,
         lag(c) over (partition by event_type order by day) as p
  from daily),
agg as (
  select event_type,
         cast(count(*) as bigint) as n_pairs,
         cast(sum(c) as bigint) as sx,
         cast(sum(p) as bigint) as sy,
         sum(cast(c as hugeint) * cast(c as hugeint)) as sxx,
         sum(cast(p as hugeint) * cast(p as hugeint)) as syy,
         sum(cast(c as hugeint) * cast(p as hugeint)) as sxy
  from pairs where p is not null group by event_type),
x as (
  select event_type, n_pairs,
         cast(n_pairs as double) as n, cast(sx as double) as dsx,
         cast(sy as double) as dsy, cast(sxx as double) as dsxx,
         cast(syy as double) as dsyy, cast(sxy as double) as dsxy
  from agg)
select event_type, n_pairs,
       case when (n * dsxx - dsx * dsx) * (n * dsyy - dsy * dsy) > 0
            then (n * dsxy - dsx * dsy)
                 / sqrt((n * dsxx - dsx * dsx) * (n * dsyy - dsy * dsy))
            else null end as autocorr
from x
"""


def q183_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval fusion (ext/similarity.rrf_fuse): BM25 lexical
    top-15 for {data, spark, vector} fused with embedding-cosine top-15
    neighbors of vec 0 by reciprocal-rank fusion — the standard hybrid
    search combiner, scores as fixed two-term expressions."""
    from .ext import similarity as sim
    from .ext import textops

    docs = load(spark, sf_dir, "documents")
    lex = textops.bm25_topk(
        docs, ["data", "spark", "vector"], k=15, idf_mode="rational"
    )
    lex_r = sim._ranked_topk(
        lex, 15, [F.col("score").desc(), F.col("doc_id")], ["doc_id", "rnk"]
    ).withColumnRenamed("rnk", "rank_a")
    sem_r = (
        sim.knn_brute(load(spark, sf_dir, "embeddings"), query_id=0, k=15)
        .select(F.col("neighbor_id").alias("doc_id"), F.col("rnk").alias("rank_b"))
    )
    return sim.rrf_fuse(lex_r, sem_r, id_col="doc_id")


ORACLE_Q183 = f"""
with lex as ({ORACLE_Q118}),
lexr as (
  select doc_id,
         cast(row_number() over (order by score desc, doc_id) as bigint)
           as rank_a
  from lex),
q as (select embedding as qe from embeddings where vec_id = 0),
semscored as (
  select vec_id,
         list_cosine_similarity(list_transform(embedding, x -> cast(x as double)),
                                list_transform(qe,        x -> cast(x as double)))
           as cos
  from embeddings, q where vec_id <> 0),
semr as (
  select vec_id as doc_id,
         cast(row_number() over (order by cos desc, vec_id) as bigint)
           as rank_b
  from semscored order by cos desc, vec_id limit 15),
fused as (
  select coalesce(lexr.doc_id, semr.doc_id) as doc_id,
         lexr.rank_a, semr.rank_b,
         (case when lexr.rank_a is not null
               then 1.0 / (60.0 + cast(lexr.rank_a as double)) else 0.0 end)
         + (case when semr.rank_b is not null
                 then 1.0 / (60.0 + cast(semr.rank_b as double)) else 0.0 end)
           as rrf
  from lexr full outer join semr on lexr.doc_id = semr.doc_id)
select doc_id, rank_a, rank_b, rrf,
       cast(row_number() over (order by rrf desc, doc_id) as bigint)
         as fused_rank
from fused
"""


def q184_minhash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-shortcut audit (ext/dedup.minhash_recall_audit): exact
    jaccard pairs vs the MinHash+LSH pairs, with missed/extra counts
    and recall/precision — the audit family (q160/q163/q170) applied
    to dedup itself. The oracle asserts PERFECT recall at gate SFs:
    the exact-pair SQL supplies n_exact, and any pair the LSH path
    missed (or invented) makes the counts hash-mismatch."""
    from .ext import dedup as dd

    return dd.minhash_recall_audit(load(spark, sf_dir, "documents"), 0.8)


ORACLE_Q184 = f"""
with p as ({ORACLE_Q19}),
c as (select cast(count(*) as bigint) as n_exact_pairs from p),
d as (select cast(count(*) as bigint) as n_docs from documents)
select d.n_docs, c.n_exact_pairs,
       c.n_exact_pairs as n_lsh_pairs,
       cast(0 as bigint) as n_missed,
       cast(0 as bigint) as n_extra,
       cast(c.n_exact_pairs - 0 as double)
         / cast(greatest(c.n_exact_pairs, 1) as double) as recall,
       cast(c.n_exact_pairs - 0 as double)
         / cast(greatest(c.n_exact_pairs, 1) as double) as precision
from d cross join c
"""


def q185_topk_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k + '(other)' residual rollup (ext/sampling.topk_with_other):
    top-3 event types per user-id decile bucket with the long tail
    collapsed to one row — the k+1-rows-per-group dashboard shape."""
    from .ext import sampling

    ev = load(spark, sf_dir, "events").withColumn(
        "bucket", F.pmod(F.col("user_id"), F.lit(10)).cast("long")
    )
    return sampling.topk_with_other(ev, "bucket", "event_type", k=3)


ORACLE_Q185 = """
with cnt as (
  select user_id % 10 as bucket, event_type,
         cast(count(*) as bigint) as n_rows
  from events group by 1, 2),
ranked as (
  select *, cast(row_number() over (
    partition by bucket order by n_rows desc, event_type asc) as bigint)
      as rnk
  from cnt)
select bucket, event_type, n_rows, rnk from ranked where rnk <= 3
union all
select bucket, '(other)' as event_type,
       cast(sum(n_rows) as bigint) as n_rows, cast(4 as bigint) as rnk
from ranked where rnk > 3 group by bucket
"""


def q186_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness report (compare.freshness_audit): per event_type, the
    latest event, staleness vs the corpus watermark, and trailing
    1-day/7-day row counts — the is-this-feed-alive table, exact
    integer seconds."""
    from .compare import freshness_audit

    return freshness_audit(load(spark, sf_dir, "events"), "event_type", "ts")


ORACLE_Q186 = """
with wm as (select max(ts) as w from events)
select event_type,
       max(ts) as last_ts,
       cast((epoch_us(w) - epoch_us(max(ts))) // 1000000
            as bigint) as staleness_s,
       cast(sum(case when (epoch_us(w) - epoch_us(ts)) // 1000000 <= 86400
                     then 1 else 0 end) as bigint) as rows_1d,
       cast(sum(case when (epoch_us(w) - epoch_us(ts)) // 1000000 <= 604800
                     then 1 else 0 end) as bigint) as rows_7d,
       cast(count(*) as bigint) as n_rows
from events cross join wm
group by event_type, w
"""


def q187_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility profile (ext/textops.tokenizer_fertility):
    BPE-ish tokens per whitespace word per language from exact integer
    counts — which languages pay a token-budget premium."""
    from .ext import textops

    return textops.tokenizer_fertility(load(spark, sf_dir, "documents"), "lang")


ORACLE_Q187 = """
with t as (
  select lang,
         cast(len(list_filter(string_split(trim(text), ' '), x -> x <> ''))
              as bigint) as ws,
         cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
              as bigint) as bpe
  from documents)
select lang, cast(count(*) as bigint) as n_docs,
       cast(sum(ws) as bigint) as ws_tokens,
       cast(sum(bpe) as bigint) as bpe_tokens,
       cast(sum(bpe) as double)
         / cast(greatest(sum(ws), 1) as double) as fertility
from t group by lang
"""


# one block per FIXTURE_FOREIGN_KEYS row (kept literal-in-code so the
# oracle stays independent of compare.py's implementation)
ORACLE_Q177 = "\nunion all\n".join(
    _fk_audit_block(*t)
    for t in [
        ("fk_nation_region", "nation", "n_regionkey", "region", "r_regionkey"),
        ("fk_customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("fk_supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("fk_orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("fk_lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("fk_lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("fk_lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("fk_embeddings_doc", "embeddings", "vec_id", "documents", "doc_id"),
    ]
) + "\norder by fk_name"



def q188_lsh_precision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RP-LSH candidate precision profile (ext/similarity.
    lsh_precision_audit): every candidate pair bucketed by exact cosine
    (width-0.2 bins) with counts, share, and threshold flag — the
    complement of q184's recall audit, measuring what the verify stage
    PAYS for the banding. Cosines replay bit-for-bit (sequential
    folds), so the floor() binning agrees across engines. Threshold
    sits on a bin edge (0.4): above_threshold means the bin's ENTIRE
    range clears it — round 7's mid-bin 0.42 flagged the straddling
    [0.4, 0.6) bin as below-threshold (ADVICE r7)."""
    from .ext import similarity

    return similarity.lsh_precision_audit(
        load(spark, sf_dir, "embeddings"), threshold=0.4
    )


def _oracle_q188() -> str:
    """q178's inlined-plane keyed CTE + exact cosine, then the same
    floor(cos*5)/5 binning; share divides exact bigints."""
    from .ext.similarity import _rp_planes

    n_planes, n_bands, dim = 32, 4, 64
    width = n_planes // n_bands
    planes = _rp_planes(n_planes, dim)

    def lit(plane: list) -> str:
        return "[" + ", ".join(repr(x) for x in plane) + "]"

    def bucket(bi: int) -> str:
        return " + ".join(
            f"(case when list_dot_product(v, {lit(planes[bi * width + i])}) >= 0"
            f" then {2 ** i} else 0 end)"
            for i in range(width)
        )

    keyed = "\nunion all\n".join(
        f"select vec_id, v, {bi} as band, {bucket(bi)} as bucket from e"
        for bi in range(n_bands)
    )
    return f"""
with e as (select vec_id,
                  list_transform(embedding, x -> cast(x as double)) as v
           from embeddings),
keyed as (
{keyed}
),
cand as (
  select distinct a.vec_id as d1, b.vec_id as d2
  from keyed a join keyed b
    on a.band = b.band and a.bucket = b.bucket and a.vec_id < b.vec_id),
scored as (
  select list_dot_product(ea.v, eb.v)
           / (sqrt(list_dot_product(ea.v, ea.v))
              * sqrt(list_dot_product(eb.v, eb.v))) as cos
  from cand join e ea on ea.vec_id = cand.d1
            join e eb on eb.vec_id = cand.d2),
binned as (
  select cast(floor(cos * 5) as double) / cast(5.0 as double) as cos_bin,
         cast(count(*) as bigint) as n_pairs
  from scored group by 1),
tot as (select cast(sum(n_pairs) as bigint) as t from binned)
select cos_bin, n_pairs,
       cast(n_pairs as double) / cast(t as double) as share,
       cast(case when cos_bin >= cast(0.4 as double) then 1 else 0 end
            as bigint) as above_threshold
from binned, tot
"""


ORACLE_Q188 = _oracle_q188()


def q189_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source
    (ext/textops.charclass_entropy): exact ASCII-class counts + shares
    — the per-feed composition monitor that catches misclassified
    content (all-digit logs, minified code) before it poisons a
    training mix. Round 8 re-gated log-free: the round-7 entropy
    column failed hash parity by 1 ulp of ln() between JVM Math.log
    and DuckDB libm (VERDICT r7 #2); entropy stays available via
    include_entropy=True under a tolerance pytest, while the gate
    hashes only exact bigints and single divisions of them."""
    from .ext import textops

    return textops.charclass_entropy(load(spark, sf_dir, "documents"), "source")


ORACLE_Q189 = r"""
with t as (
  select source,
         cast(sum(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
              as bigint) as letters,
         cast(sum(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
              as bigint) as digits,
         cast(sum(length(text) - length(regexp_replace(text, '[ \t\n\r]', '', 'g')))
              as bigint) as spaces,
         cast(sum(length(text)) as bigint) as total_chars
  from documents group by source)
select source, letters, digits, spaces,
       cast(total_chars - letters - digits - spaces as bigint) as others,
       total_chars,
       cast(letters as double) / cast(total_chars as double) as letter_share,
       cast(digits as double) / cast(total_chars as double) as digit_share,
       cast(spaces as double) / cast(total_chars as double) as space_share,
       cast(total_chars - letters - digits - spaces as double)
         / cast(total_chars as double) as other_share
from t
"""


def q190_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation audit (ext/textops.truncation_loss):
    per source, docs over 64 whitespace tokens and the token share a
    hard cut would discard — the chunk-or-truncate decision table.
    Exact integer counts; the percentiles use exact interpolation."""
    from .ext import textops

    return textops.truncation_loss(
        load(spark, sf_dir, "documents"), "source", max_len=64
    )


ORACLE_Q190 = """
with t as (
  select source,
         cast(len(list_filter(string_split(trim(text), ' '), x -> x <> ''))
              as bigint) as ws
  from documents),
a as (
  select source,
         cast(count(*) as bigint) as n_docs,
         cast(sum(ws) as bigint) as total_tokens,
         cast(sum(case when ws > 64 then 1 else 0 end) as bigint)
           as docs_truncated,
         cast(sum(greatest(ws - 64, 0)) as bigint) as tokens_lost,
         quantile_cont(ws, 0.5) as p50_tokens,
         quantile_cont(ws, 0.95) as p95_tokens
  from t group by source)
select source, n_docs, total_tokens, docs_truncated, tokens_lost,
       cast(docs_truncated as double) / cast(n_docs as double)
         as doc_trunc_frac,
       cast(tokens_lost as double)
         / cast(greatest(total_tokens, 1) as double) as token_loss_frac,
       p50_tokens, p95_tokens
from a
"""


def q191_transitions_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day-sliced transition matrices
    (ext/asof.event_transitions_by_hour): the q96 matrix per source-
    event hour bucket, normalized within (hour, prev_type) — the
    diurnal-drift view that catches journey changes confined to one
    shift. Round 8 replaces round 7's q191, which gated the identical
    all-day matrix as q96 under renamed columns (VERDICT r7 #4/#6)."""
    from .ext import asof as asofmod

    return asofmod.event_transitions_by_hour(load(spark, sf_dir, "events"))


ORACLE_Q191 = """
with l as (
  select event_type as next_type,
         lag(event_type) over w as prev_type,
         lag(cast(extract(hour from ts) as bigint)) over w as hour
  from events
  window w as (partition by user_id order by ts, event_id)),
pairs as (
  select hour, prev_type, next_type, cast(count(*) as bigint) as n
  from l where prev_type is not null group by 1, 2, 3),
tot as (
  select hour, prev_type, cast(sum(n) as bigint) as row_n
  from pairs group by 1, 2)
select p.hour, p.prev_type, p.next_type, p.n,
       cast(p.n as double) / cast(t.row_n as double) as prob
from pairs p join tot t using (hour, prev_type)
"""


def q192_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization error audit (ext/similarity.
    quantization_error_audit): per vector, the MSE and original-vs-
    dequantized cosine under per-dimension [min, max] affine int8
    quantization — the 'is 4x smaller safe for THIS corpus' table. All
    folds are sequential and per-row, so every double replays
    bit-for-bit."""
    from .ext import similarity

    return similarity.quantization_error_audit(load(spark, sf_dir, "embeddings"))


ORACLE_Q192 = """
with e as (select vec_id,
                  list_transform(embedding, x -> cast(x as double)) as v
           from embeddings),
flat as (select generate_subscripts(v, 1) as pos, unnest(v) as x from e),
dims as (select pos, min(x) as mn, max(x) as mx from flat group by pos),
bounds as (select list(mn order by pos) as mns, list(mx order by pos) as mxs
           from dims),
deq as (
  select vec_id, v,
         list_transform(range(1, 65), i ->
           case when mxs[i] > mns[i] then
             mns[i] + floor((v[i] - mns[i]) / (mxs[i] - mns[i]) * 255
                            + cast(0.5 as double))
                      * (mxs[i] - mns[i]) / 255
           else mns[i] end) as dq
  from e, bounds)
select vec_id,
       list_reduce(list_transform(range(1, 65),
                                  i -> (v[i] - dq[i]) * (v[i] - dq[i])),
                   (a, b) -> a + b) / 64 as mse,
       list_reduce(list_transform(range(1, 65), i -> v[i] * dq[i]),
                   (a, b) -> a + b)
         / (sqrt(list_reduce(list_transform(range(1, 65), i -> v[i] * v[i]),
                             (a, b) -> a + b))
            * sqrt(list_reduce(list_transform(range(1, 65), i -> dq[i] * dq[i]),
                               (a, b) -> a + b))) as cos_orig_deq
from deq
"""


def q193_chisq_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence table for language x source
    (ext/features.chisq_independence): per-cell observed, expected
    under independence, and chi2 contribution — the audit that catches
    a language concentrated in one crawl source before a source drop
    silently drops the language. Expected divides exact bigints once."""
    from .ext import features

    return features.chisq_independence(
        load(spark, sf_dir, "documents"), "lang", "source"
    )


ORACLE_Q193 = """
with cells as (
  select lang as a, source as b, cast(count(*) as bigint) as observed
  from documents group by 1, 2),
rt as (select a, cast(sum(observed) as bigint) as ra from cells group by a),
ct as (select b, cast(sum(observed) as bigint) as cb from cells group by b),
g as (select cast(sum(observed) as bigint) as n from cells)
select c.a, c.b, c.observed,
       cast(rt.ra * ct.cb as double) / cast(g.n as double) as expected,
       (cast(c.observed as double)
          - cast(rt.ra * ct.cb as double) / cast(g.n as double))
       * (cast(c.observed as double)
          - cast(rt.ra * ct.cb as double) / cast(g.n as double))
       / (cast(rt.ra * ct.cb as double) / cast(g.n as double))
         as contribution
from cells c join rt using (a) join ct using (b), g
"""


def q194_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HyperLogLog distinct users per event type
    (ext/skew.approx_distinct_hll): md5-derived registers, rank via
    length(bin(r)) (never log2), harmonic sum in exact int64 scaled by
    2^53 — the estimate itself hash-matches the oracle, closing the
    sketch family's one rows-only gap (q48 keeps demonstrating Spark's
    native HLL++; q85's KMV is the order-statistics portable sketch,
    this is the register-max one)."""
    from .ext import skew

    return skew.approx_distinct_hll(load(spark, sf_dir, "events"), "event_type", "user_id")


def _oracle_hll(m: int) -> str:
    """DuckDB replay of approx_distinct_hll at register count m —
    shared by ORACLE_Q194 (m=256, the default) and ORACLE_Q48 (m=64),
    so both accuracy points of the parameterized sketch replay the
    identical constants (alpha, rank base, linear table) the Spark
    expression inlines."""
    from .ext.skew import _hll_linear_table, hll_alpha, hll_rank_base

    rb = hll_rank_base(m)
    two_rb = 1 << rb
    alpha = hll_alpha(m)
    # e0 suffix forces DuckDB to parse each element as DOUBLE — a bare
    # decimal literal becomes DECIMAL and re-rounds differently
    table = "[" + ", ".join(f"{x!r}e0" for x in _hll_linear_table(m)) + "]"
    return f"""
with h as (
  select event_type as grp,
         cast(cast('0x' || substring(md5(cast(user_id as varchar)), 1, 15)
                   as ubigint) as bigint) as h
  from events where user_id is not null),
rj as (
  select grp, h % {m} as j,
         case when h // {m} > 0 then {rb} - length(bin(h // {m}))
              else {rb} end as rank
  from h),
regs as (select grp, j, max(rank) as m from rj group by 1, 2),
agg as (select grp, cast(count(*) as bigint) as nreg,
               cast(sum(1::bigint << ({rb} - m)) as bigint) as sne
        from regs group by 1),
est as (
  select grp, nreg, {m} - nreg as zeros,
         cast({alpha!r} as double) * cast({m * m} as double)
           * cast({two_rb} as double)
           / cast(({m} - nreg) * {two_rb}::bigint + sne as double) as raw
  from agg)
select grp as event_type, nreg as nonzero_registers,
       case when raw <= cast({2.5 * m!r} as double) and zeros > 0
            then ({table})[greatest(zeros, 1)]
            else raw end as hll_est
from est
"""


ORACLE_Q194 = _oracle_hll(256)
ORACLE_Q48 = _oracle_hll(64)


# the q49 recursive-CTE cluster derivation (exact-Jaccard pair graph ->
# min-label transitive closure), shared by the q195/q196 oracles
_CC_CTE = """
with recursive
docs as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
docs3 as (select * from docs where len(toks) >= 3),
sh as (
  select distinct doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] as shingle
  from docs3, unnest(range(1, len(toks) - 1)) t(i)),
sizes as (select doc_id, count(*) as n from sh group by doc_id),
common as (
  select a.doc_id as d1, b.doc_id as d2, count(*) as c
  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
  group by 1, 2),
pairs as (
  select d1, d2 from common
  join sizes na on na.doc_id = d1
  join sizes nb on nb.doc_id = d2
  where cast(c as double) / cast(na.n + nb.n - c as double) >= 0.8),
edges as (select d1 as a, d2 as b from pairs
          union all select d2, d1 from pairs),
reach(a, b) as (
  select a, b from edges
  union
  select r.a, e.b from reach r join edges e on r.b = e.a),
nodes as (select distinct a as node from edges),
cc as (
  select n.node as doc_id, least(n.node, min(r.b)) as keep_id
  from nodes n left join reach r on r.a = n.node
  group by n.node)
"""


def q195_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup impact (ext/dedup.dedup_survivorship): docs
    contributed, docs in any near-dup cluster, docs the canonical-
    keeper rule drops, and the drop share — who PAYS for dedup, the
    sign-off table before a corpus cut (q180 shows where duplication
    flows between sources; this shows the cost per source). Round 9
    (VERDICT r8 #1): pair discovery is the banded MinHash+LSH scale
    path via pairs= — q159's precedent: LSH pairs against the
    exact-Jaccard oracle, bit-identical at gate SF
    (test_minhash_equals_exact_jaccard); exact discovery stays the
    function DEFAULT for oracle replay."""
    docs = load(spark, sf_dir, "documents")
    return dedup.dedup_survivorship(
        docs, pairs=dedup.minhash_dedup_pairs(docs)
    )


ORACLE_Q195 = _CC_CTE + """
select d.source,
       cast(count(*) as bigint) as n_docs,
       cast(sum(case when cc.doc_id is not null then 1 else 0 end)
            as bigint) as dup_members,
       cast(sum(case when cc.keep_id is not null and cc.keep_id <> d.doc_id
                     then 1 else 0 end) as bigint) as dropped,
       cast(sum(case when cc.keep_id is not null and cc.keep_id <> d.doc_id
                     then 1 else 0 end) as double)
         / cast(count(*) as double) as drop_share
from documents d left join cc on cc.doc_id = d.doc_id
group by 1
"""


def q196_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram (ext/dedup.
    dup_cluster_histogram): clusters and docs per size bucket
    (2, 3-5, 6-10, >10) — is duplication a trim or a template-spam
    rescue; the >10 bucket is the one _cap_buckets exists for. LSH
    pair discovery via pairs= as in q195 (exact-Jaccard oracle is
    bit-identical at gate SF)."""
    docs = load(spark, sf_dir, "documents")
    return dedup.dup_cluster_histogram(
        docs, pairs=dedup.minhash_dedup_pairs(docs)
    )


ORACLE_Q196 = _CC_CTE + """
, csz as (select keep_id, cast(count(*) as bigint) as sz from cc group by 1)
select case when sz <= 2 then '2' when sz <= 5 then '3-5'
            when sz <= 10 then '6-10' else '>10' end as size_bucket,
       cast(count(*) as bigint) as n_clusters,
       cast(sum(sz) as bigint) as n_docs
from csz group by 1
"""


def q197_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout keys over events (ext/layout.zorder_key):
    user_id x event-time bucketed to 2^16 cells and Morton-interleaved
    — the clustering key behind multi-dimension row-group pruning
    (Delta/Iceberg's OPTIMIZE ZORDER BY, composed from one min/max
    broadcast + pure integer bit math). Exact integers end to end."""
    from .ext import layout

    ev = load(spark, sf_dir, "events")
    ysec = F.expr(
        "timestampdiff(SECOND, timestamp_ntz '1970-01-01 00:00:00', ts)"
    )
    return layout.zorder_key(ev, "user_id", ysec).select(
        "event_id",
        F.col("_bx").alias("bx"),
        F.col("_by").alias("by"),
        "zval",
    )


def _zorder_interleave_sql(bx: str, by: str, bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({bx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({by} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _oracle_q197() -> str:
    return f"""
with base as (
  select event_id, cast(user_id as bigint) as zx,
         date_diff('second', timestamp '1970-01-01 00:00:00', ts) as zy
  from events),
mm as (select min(zx) as ux, max(zx) as vx,
              min(zy) as uy, max(zy) as vy from base),
b as (
  select event_id,
         ((zx - ux) * 65536) // (vx - ux + 1) as bx,
         ((zy - uy) * 65536) // (vy - uy + 1) as by
  from base, mm)
select event_id, bx, by,
       cast({_zorder_interleave_sql("bx", "by")} as bigint) as zval
from b
"""


ORACLE_Q197 = _oracle_q197()


def q198_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The layout decision PRICED from zone maps
    (ext/layout.zorder_layout_audit): the same events laid into
    256-row files under a linear user_id sort vs the z-order key, and
    the files a 2-D (user x time) range predicate skips under each —
    measure the layout before rewriting 100 TB (the measure-the-
    shortcut family applied to data layout)."""
    from .ext import layout

    ev = load(spark, sf_dir, "events")
    ysec = F.expr(
        "timestampdiff(SECOND, timestamp_ntz '1970-01-01 00:00:00', ts)"
    )
    return layout.zorder_layout_audit(
        ev, "user_id", ysec, "event_id", rows_per_file=256
    )


def _oracle_q198() -> str:
    cells = 1 << 16
    lo_x, hi_x, lo_y, hi_y = (
        cells * 25 // 100, cells * 35 // 100,
        cells * 30 // 100, cells * 50 // 100,
    )
    body = f"""
with base as (
  select event_id, cast(user_id as bigint) as zx,
         date_diff('second', timestamp '1970-01-01 00:00:00', ts) as zy
  from events),
mm as (select min(zx) as ux, max(zx) as vx,
              min(zy) as uy, max(zy) as vy from base),
b as (
  select event_id,
         ((zx - ux) * 65536) // (vx - ux + 1) as bx,
         ((zy - uy) * 65536) // (vy - uy + 1) as by
  from base, mm),
k as (select event_id, bx, by,
             cast({_zorder_interleave_sql("bx", "by")} as bigint) as zval
      from b)
"""

    def one(name: str, order: str) -> str:
        return f"""
select '{name}' as layout,
       cast(count(*) as bigint) as n_files,
       cast(sum(case when pr then 0 else 1 end) as bigint) as files_scanned,
       cast(sum(n) as bigint) as rows_total,
       cast(sum(case when pr then 0 else n end) as bigint) as rows_scanned,
       cast(sum(n) - sum(case when pr then 0 else n end) as double)
         / cast(sum(n) as double) as skip_fraction
from (
  select f, count(*) as n,
         (max(bx) < {lo_x} or min(bx) > {hi_x}
          or max(by) < {lo_y} or min(by) > {hi_y}) as pr
  from (select *, (row_number() over (order by {order}) - 1) // 256 as f
        from k)
  group by f)
"""

    return (
        body
        + one("linear_x", "bx, event_id")
        + "union all"
        + one("zorder", "zval, event_id")
    )


ORACLE_Q198 = _oracle_q198()


def q199_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed dedup sign-off report (ext/dedup.dedup_report,
    VERDICT r8 #1): corpus topline + per-source survivorship +
    cluster-size histogram + cross-source matrix from ONE MinHash+LSH
    pair discovery and ONE connected-components pass — what q159-shape
    keeper + q195 + q196 + q180 used to pay three discoveries for.
    Long format (section, key_a, key_b, n1, n2, n3, share)."""
    return dedup.dedup_report(load(spark, sf_dir, "documents"))


ORACLE_Q199 = _CC_CTE + """
, base as (
  select d.doc_id, d.source, cc.keep_id
  from documents d left join cc on cc.doc_id = d.doc_id),
surv as (
  select source as key_a,
         cast(count(*) as bigint) as n1,
         cast(sum(case when keep_id is not null then 1 else 0 end)
              as bigint) as n2,
         cast(sum(case when keep_id is not null and keep_id <> doc_id
                       then 1 else 0 end) as bigint) as n3
  from base group by 1),
csz as (select keep_id, cast(count(*) as bigint) as sz from cc group by 1),
hist as (
  select case when sz <= 2 then '2' when sz <= 5 then '3-5'
              when sz <= 10 then '6-10' else '>10' end as key_a,
         cast(count(*) as bigint) as n1,
         cast(sum(sz) as bigint) as n2
  from csz group by 1),
xs as (
  select least(s1.source, s2.source) as key_a,
         greatest(s1.source, s2.source) as key_b,
         cast(count(*) as bigint) as n1
  from pairs p
  join documents s1 on s1.doc_id = p.d1
  join documents s2 on s2.doc_id = p.d2
  group by 1, 2)
select 'topline' as section, 'corpus' as key_a,
       cast(null as varchar) as key_b,
       cast(sum(n1) as bigint) as n1, cast(sum(n2) as bigint) as n2,
       cast(sum(n3) as bigint) as n3,
       cast(sum(n3) as double) / cast(sum(n1) as double) as share
from surv
union all
select 'survivorship', key_a, cast(null as varchar), n1, n2, n3,
       cast(n3 as double) / cast(n1 as double)
from surv
union all
select 'cluster_histogram', key_a, cast(null as varchar), n1, n2,
       cast(null as bigint), cast(null as double)
from hist
union all
select 'cross_source', key_a, key_b, n1, cast(null as bigint),
       cast(null as bigint), cast(null as double)
from xs
"""


def q200_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM surprisal filter (ext/textops.ngram_lm_score) — the
    CCNet/KenLM quality-gate shape: add-one-smoothed bigram LM over a
    capped top-512 vocabulary ('<unk>' elsewhere), top-20 most
    improbable docs. The gate runs mode='fixed' (the q60/q118 no-libm
    discipline: per-bigram reciprocal likelihood in exact int64 fixed
    point, one double division per doc, so even the double score
    replays bit-for-bit); production default is standard ln
    perplexity."""
    return textops.ngram_lm_score(
        load(spark, sf_dir, "documents"), mode="fixed"
    )


ORACLE_Q200 = """
with docs as (
  select doc_id,
         list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
d2 as (select doc_id, toks from docs where len(toks) >= 2),
tok as (
  select doc_id, i as pos, toks[i] as tok
  from d2, unnest(range(1, len(toks) + 1)) t(i)),
uni as (select tok, count(*) as freq from tok group by 1),
vocab as (select tok from uni order by freq desc, tok limit 512),
mapped as (
  select t.doc_id, t.pos,
         case when v.tok is not null then t.tok else '<unk>' end as w
  from tok t left join vocab v on t.tok = v.tok),
big as (
  select doc_id, w,
         lead(w) over (partition by doc_id order by pos) as w2
  from mapped),
stats as (
  select doc_id, cast(count(*) as bigint) as n_tokens,
         cast(sum(case when w = '<unk>' then 1 else 0 end) as bigint) as n_unk
  from big group by 1),
types as (
  select doc_id, w, w2, cast(count(*) as bigint) as k
  from big where w2 is not null group by 1, 2, 3),
c12 as (select w, w2, cast(sum(k) as bigint) as c12 from types group by 1, 2),
c1 as (select w, cast(sum(c12) as bigint) as c1 from c12 group by 1),
vsz as (select cast(count(*) + 1 as bigint) as veff from vocab),
terms as (
  select t.doc_id,
         t.k * (((c.c1 + vsz.veff) * 1048576) // (b.c12 + 1)) as term,
         t.k
  from types t
  join c12 b on t.w = b.w and t.w2 = b.w2
  join c1 c on t.w = c.w
  cross join vsz),
perdoc as (
  select doc_id, cast(sum(term) as bigint) as sum_fp,
         cast(sum(k) as bigint) as n_bigrams
  from terms group by 1)
select s.doc_id, s.n_tokens, s.n_unk, p.n_bigrams,
       cast(p.sum_fp as double) / cast(p.n_bigrams * 1048576 as double)
         as lm_surprisal
from stats s join perdoc p on s.doc_id = p.doc_id
order by lm_surprisal desc, s.doc_id
limit 20
"""


def q201_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing near-dup pairs (ext/dedup.winnow_overlap_pairs): MOSS
    fingerprints — each 4-window's minimum over the ordered 3-gram
    md5-portable hash stream — self-joined into the top-20 pairs by
    shared fingerprint count. Every shared run of >= 6 tokens is
    guaranteed represented; output is all exact integers (d1, d2,
    n_shared)."""
    return dedup.winnow_overlap_pairs(
        load(spark, sf_dir, "documents"), k=3, w=4, min_shared=2, limit=20
    )


ORACLE_Q201 = """
with docs as (
  select doc_id,
         list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
dk as (
  select doc_id, toks, len(toks) - 2 as m
  from docs where len(toks) >= 3),
h as (
  select doc_id, m, i as pos,
         cast(cast('0x' || substring(md5(
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         ), 1, 15) as ubigint) as bigint) as h
  from dk, unnest(range(1, m + 1)) t(i)),
wmin as (
  select doc_id, m, pos,
         min(h) over (partition by doc_id order by pos
                      rows between current row and 3 following) as fp
  from h),
fps as (
  select distinct doc_id, fp
  from wmin where pos <= greatest(m - 3, 1)),
pairs as (
  select a.doc_id as d1, b.doc_id as d2,
         cast(count(*) as bigint) as n_shared
  from fps a join fps b on a.fp = b.fp and a.doc_id < b.doc_id
  group by 1, 2)
select d1, d2, n_shared from pairs where n_shared >= 2
order by n_shared desc, d1, d2
limit 20
"""


def q202_target_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-shaped importance scoring (ext/textops.lm_target_affinity):
    target LM (lang='en') and raw LM from ONE shared bigram pipeline
    over a shared capped vocabulary, every doc scored by how much
    better the target model predicts it; top-20 most target-like. The
    gate runs
    mode='fixed' (exact int64 reciprocal-likelihood difference, one
    double division per doc); production default is the ln
    geometric-mean likelihood ratio — the DSIR importance weight."""
    return textops.lm_target_affinity(
        load(spark, sf_dir, "documents"),
        F.col("lang") == "en",
        mode="fixed",
    )


ORACLE_Q202 = """
with docs as (
  select doc_id, lang = 'en' as tgt,
         list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
d2 as (select doc_id, tgt, toks from docs where len(toks) >= 2),
tok as (
  select doc_id, tgt, i as pos, toks[i] as tok
  from d2, unnest(range(1, len(toks) + 1)) t(i)),
uni as (select tok, count(*) as freq from tok group by 1),
vocab as (select tok from uni order by freq desc, tok limit 512),
mapped as (
  select t.doc_id, t.tgt, t.pos,
         case when v.tok is not null then t.tok else '<unk>' end as w
  from tok t left join vocab v on t.tok = v.tok),
big as (
  select doc_id, tgt, w,
         lead(w) over (partition by doc_id order by pos) as w2
  from mapped),
types as (
  select doc_id, tgt, w, w2, cast(count(*) as bigint) as k
  from big where w2 is not null group by 1, 2, 3, 4),
c12 as (
  select w, w2, cast(sum(k) as bigint) as c12r,
         cast(sum(case when tgt then k else 0 end) as bigint) as c12t
  from types group by 1, 2),
c1 as (
  select w, cast(sum(c12r) as bigint) as c1r,
         cast(sum(c12t) as bigint) as c1t
  from c12 group by 1),
vsz as (select cast(count(*) + 1 as bigint) as veff from vocab),
terms as (
  select t.doc_id, t.tgt,
         t.k * ((((c.c1r + vsz.veff) * 1048576) // (b.c12r + 1))
                - (((c.c1t + vsz.veff) * 1048576) // (b.c12t + 1))) as term,
         t.k
  from types t
  join c12 b on t.w = b.w and t.w2 = b.w2
  join c1 c on t.w = c.w
  cross join vsz),
perdoc as (
  select doc_id, tgt, cast(sum(term) as bigint) as sum_fp,
         cast(sum(k) as bigint) as n_bigrams
  from terms group by 1, 2)
select doc_id, tgt as is_target, n_bigrams,
       cast(sum_fp as double) / cast(n_bigrams * 1048576 as double)
         as target_affinity
from perdoc
order by target_affinity desc, doc_id
limit 20
"""


def q203_lm_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out LM drift monitor (ext/textops.lm_score_against_model):
    the census-once/score-later production split — vocabulary and
    bigram model frozen from the source<>'src0' slice
    (lm_vocab_census + lm_bigram_counts, a bounded <= 512-row vocab
    collect), every document scored against that EXTERNAL model.
    Unseen bigrams ride the LEFT join's zero-filled counts; top-20
    most surprising docs. Gate mode='fixed' (exact int64, one double
    division per doc); production is ln perplexity."""
    from pyspark.sql import functions as _F

    docs = load(spark, sf_dir, "documents")
    train = docs.where(_F.col("source") != "src0")
    vocab = [
        r.tok
        for r in textops.lm_vocab_census(train).orderBy("rnk").collect()
    ]
    counts = textops.lm_bigram_counts(train, vocab)
    return textops.lm_score_against_model(docs, counts, vocab, mode="fixed")


ORACLE_Q203 = """
with alld as (
  select doc_id, source,
         list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
a2 as (select doc_id, source, toks from alld where len(toks) >= 2),
tok as (
  select doc_id, source, i as pos, toks[i] as tok
  from a2, unnest(range(1, len(toks) + 1)) t(i)),
tuni as (
  select tok, count(*) as freq from tok where source <> 'src0' group by 1),
vocab as (select tok from tuni order by freq desc, tok limit 512),
vsz as (select cast(count(*) + 1 as bigint) as veff from vocab),
mapped as (
  select t.doc_id, t.source, t.pos,
         case when v.tok is not null then t.tok else '<unk>' end as w
  from tok t left join vocab v on t.tok = v.tok),
big as (
  select doc_id, source, w,
         lead(w) over (partition by doc_id order by pos) as w2
  from mapped),
c12 as (
  select w, w2, cast(count(*) as bigint) as c12
  from big where w2 is not null and source <> 'src0' group by 1, 2),
c1 as (select w, cast(sum(c12) as bigint) as c1 from c12 group by 1),
stats as (
  select doc_id, cast(count(*) as bigint) as n_tokens,
         cast(sum(case when w = '<unk>' then 1 else 0 end) as bigint) as n_unk
  from big group by 1),
types as (
  select doc_id, w, w2, cast(count(*) as bigint) as k
  from big where w2 is not null group by 1, 2, 3),
terms as (
  select t.doc_id,
         t.k * (((coalesce(c.c1, 0) + vsz.veff) * 1048576)
                // (coalesce(b.c12, 0) + 1)) as term,
         t.k
  from types t
  left join c12 b on t.w = b.w and t.w2 = b.w2
  left join c1 c on t.w = c.w
  cross join vsz),
perdoc as (
  select doc_id, cast(sum(term) as bigint) as sum_fp,
         cast(sum(k) as bigint) as n_bigrams
  from terms group by 1)
select s.doc_id, s.n_tokens, s.n_unk, p.n_bigrams,
       cast(p.sum_fp as double) / cast(p.n_bigrams * 1048576 as double)
         as lm_surprisal
from stats s join perdoc p on s.doc_id = p.doc_id
order by lm_surprisal desc, s.doc_id
limit 20
"""


def q204_winnow_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed winnowing dedup capstone (ext/dedup.
    dedup_decision_report over winnow_overlap_pairs): MOSS fingerprints
    (each 8-window's minimum over the ordered 5-gram md5-portable hash
    stream) -> >= 3 shared fingerprints -> ONE connected-components
    pass -> the full sign-off artifact: corpus topline, per-source
    survivorship, cluster-size histogram, cross-source matrix AND the
    per-document keeper decision (highest n_chars, ties to smallest
    id), in one long-format job. The position-robust pair source
    reaching the same decision path the MinHash capstones use —
    VERDICT r9 #1."""
    docs = load(spark, sf_dir, "documents")
    pairs = dedup.winnow_overlap_pairs(
        docs, k=5, w=8, min_shared=3
    )
    return dedup.dedup_decision_report(docs, pairs, quality_col="n_chars")


ORACLE_Q204 = """
with recursive
docs as (
  select doc_id,
         list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
dk as (
  select doc_id, toks, len(toks) - 4 as m
  from docs where len(toks) >= 5),
h as (
  select doc_id, m, i as pos,
         cast(cast('0x' || substring(md5(
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
             toks[i+3] || ' ' || toks[i+4]
         ), 1, 15) as ubigint) as bigint) as h
  from dk, unnest(range(1, m + 1)) t(i)),
wmin as (
  select doc_id, m, pos,
         min(h) over (partition by doc_id order by pos
                      rows between current row and 7 following) as fp
  from h),
fps as (
  select distinct doc_id, fp
  from wmin where pos <= greatest(m - 7, 1)),
prs as (
  select a.doc_id as d1, b.doc_id as d2, cast(count(*) as bigint) as ns
  from fps a join fps b on a.fp = b.fp and a.doc_id < b.doc_id
  group by 1, 2),
pairs as (select d1, d2 from prs where ns >= 3),
edges as (select d1 as a, d2 as b from pairs
          union all select d2, d1 from pairs),
reach(a, b) as (
  select a, b from edges
  union
  select r.a, e.b from reach r join edges e on r.b = e.a),
nodes as (select distinct a as node from edges),
cc as (
  select n.node as doc_id, least(n.node, min(r.b)) as keep_id
  from nodes n left join reach r on r.a = n.node
  group by n.node),
base as (
  select d.doc_id, d.source, cc.keep_id
  from documents d left join cc on cc.doc_id = d.doc_id),
surv as (
  select source as key_a,
         cast(count(*) as bigint) as n1,
         cast(sum(case when keep_id is not null then 1 else 0 end)
              as bigint) as n2,
         cast(sum(case when keep_id is not null and keep_id <> doc_id
                       then 1 else 0 end) as bigint) as n3
  from base group by 1),
csz as (select keep_id, cast(count(*) as bigint) as sz from cc group by 1),
hist as (
  select case when sz <= 2 then '2' when sz <= 5 then '3-5'
              when sz <= 10 then '6-10' else '>10' end as key_a,
         cast(count(*) as bigint) as n1,
         cast(sum(sz) as bigint) as n2
  from csz group by 1),
xs as (
  select least(s1.source, s2.source) as key_a,
         greatest(s1.source, s2.source) as key_b,
         cast(count(*) as bigint) as n1
  from pairs p
  join documents s1 on s1.doc_id = p.d1
  join documents s2 on s2.doc_id = p.d2
  group by 1, 2),
labeled as (
  select d.doc_id, cast(d.n_chars as bigint) as quality,
         coalesce(c.keep_id, d.doc_id) as cluster_id
  from documents d left join cc c using (doc_id)),
ranked as (
  select *, row_number() over (partition by cluster_id
                               order by quality desc, doc_id asc) as rn,
         count(*) over (partition by cluster_id) as nm
  from labeled)
select 'topline' as section, 'corpus' as key_a,
       cast(null as varchar) as key_b,
       cast(sum(n1) as bigint) as n1, cast(sum(n2) as bigint) as n2,
       cast(sum(n3) as bigint) as n3,
       cast(sum(n3) as double) / cast(sum(n1) as double) as share
from surv
union all
select 'survivorship', key_a, cast(null as varchar), n1, n2, n3,
       cast(n3 as double) / cast(n1 as double)
from surv
union all
select 'cluster_histogram', key_a, cast(null as varchar), n1, n2,
       cast(null as bigint), cast(null as double)
from hist
union all
select 'cross_source', key_a, key_b, n1, cast(null as bigint),
       cast(null as bigint), cast(null as double)
from xs
union all
select 'keeper', cast(doc_id as varchar), cast(cluster_id as varchar),
       quality, cast(nm as bigint),
       cast(case when rn = 1 then 1 else 0 end as bigint),
       cast(null as double)
from ranked
"""


def q205_shared_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact longest-shared-token-run pairs (ext/dedup.
    shared_run_pairs): the Lee et al. exact-substring dedup criterion
    measured for real — winnowing candidates (whose guarantee means no
    >= w+k-1 = 12-token shared run can escape the candidate set), then
    the diagonal-streak construction turns shared 5-gram positions
    into maximal contiguous spans. Top-20 pairs by longest exact run;
    all exact integers."""
    docs = load(spark, sf_dir, "documents")
    pairs = dedup.winnow_overlap_pairs(docs, k=5, w=8, min_shared=3)
    return dedup.shared_run_pairs(
        docs, pairs, k=5, min_run=12, limit=20
    )


ORACLE_Q205 = """
with
docs as (
  select doc_id,
         list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
dk as (
  select doc_id, toks, len(toks) - 4 as m
  from docs where len(toks) >= 5),
h as (
  select doc_id, m, i as pos,
         cast(cast('0x' || substring(md5(
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
             toks[i+3] || ' ' || toks[i+4]
         ), 1, 15) as ubigint) as bigint) as h
  from dk, unnest(range(1, m + 1)) t(i)),
wmin as (
  select doc_id, m, pos,
         min(h) over (partition by doc_id order by pos
                      rows between current row and 7 following) as fp
  from h),
fps as (
  select distinct doc_id, fp
  from wmin where pos <= greatest(m - 7, 1)),
prs as (
  select a.doc_id as d1, b.doc_id as d2, count(*) as ns
  from fps a join fps b on a.fp = b.fp and a.doc_id < b.doc_id
  group by 1, 2),
pairs as (select d1, d2 from prs where ns >= 3),
-- mirror of the engine's max_gram_freq=64 degenerate-doc cap
-- (ext/dedup._run_streaks): (doc, gram) groups repeating more than
-- 64x within ONE document are pruned from the match join (never from
-- the winnow fingerprints above), so gate and oracle share semantics
hc as (
  select doc_id, pos, h from (
    select doc_id, pos, h,
           count(*) over (partition by doc_id, h) as gf
    from h)
  where gf <= 64),
mtch as (
  select p.d1, p.d2, h1.pos as i, h1.pos - h2.pos as diag
  from pairs p
  join hc h1 on h1.doc_id = p.d1
  join hc h2 on h2.doc_id = p.d2 and h2.h = h1.h),
st as (
  select d1, d2, diag,
         i - row_number() over (partition by d1, d2, diag order by i) as grp
  from mtch),
runs as (
  select d1, d2, diag, grp, cast(count(*) + 4 as bigint) as run
  from st group by 1, 2, 3, 4),
q as (
  select d1, d2, cast(max(run) as bigint) as longest_run,
         cast(count(*) as bigint) as n_runs
  from runs where run >= 12 group by 1, 2)
select d1, d2, longest_run, n_runs from q
order by longest_run desc, d1, d2
limit 20
"""


def q206_trim_shared_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decision half of the exact-substring rule (ext/dedup.
    trim_shared_runs): every >= 12-token run shared verbatim between
    two documents is CUT from the higher-id copy (winnow candidates
    make the detection exact at >= w+k-1 = 12), overlapping victim
    spans island-merged, each document rebuilt from its surviving
    tokens. One row per input document: (doc_id, n_tokens, n_trimmed,
    new_text) — the corpus AFTER the Lee et al. trim."""
    docs = load(spark, sf_dir, "documents")
    pairs = dedup.winnow_overlap_pairs(docs, k=5, w=8, min_shared=3)
    return dedup.trim_shared_runs(docs, pairs, k=5, min_run=12)


ORACLE_Q206 = """
with
docs as (
  select doc_id,
         list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
dk as (
  select doc_id, toks, len(toks) - 4 as m
  from docs where len(toks) >= 5),
h as (
  select doc_id, m, i as pos,
         cast(cast('0x' || substring(md5(
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
             toks[i+3] || ' ' || toks[i+4]
         ), 1, 15) as ubigint) as bigint) as h
  from dk, unnest(range(1, m + 1)) t(i)),
wmin as (
  select doc_id, m, pos,
         min(h) over (partition by doc_id order by pos
                      rows between current row and 7 following) as fp
  from h),
fps as (
  select distinct doc_id, fp
  from wmin where pos <= greatest(m - 7, 1)),
prs as (
  select a.doc_id as d1, b.doc_id as d2, count(*) as ns
  from fps a join fps b on a.fp = b.fp and a.doc_id < b.doc_id
  group by 1, 2),
pairs as (select d1, d2 from prs where ns >= 3),
-- mirror of the engine's max_gram_freq=64 cap (see ORACLE_Q205)
hc as (
  select doc_id, pos, h from (
    select doc_id, pos, h,
           count(*) over (partition by doc_id, h) as gf
    from h)
  where gf <= 64),
mtch as (
  select p.d1, p.d2, h1.pos as i, h1.pos - h2.pos as diag
  from pairs p
  join hc h1 on h1.doc_id = p.d1
  join hc h2 on h2.doc_id = p.d2 and h2.h = h1.h),
st as (
  select d1, d2, diag, i,
         i - row_number() over (partition by d1, d2, diag order by i) as grp
  from mtch),
runs as (
  select d1, d2, diag, grp, min(i) - diag as jmin,
         cast(count(*) + 4 as bigint) as run
  from st group by 1, 2, 3, 4),
spans as (
  select d2 as doc_id, jmin as s, jmin + run - 1 as e
  from runs where run >= 12),
tokpos as (
  select doc_id, i as pos, toks[i] as tok
  from docs, unnest(range(1, len(toks) + 1)) t(i)),
kept as (
  select t.doc_id, t.pos, t.tok
  from tokpos t
  where not exists (
    select 1 from spans s
    where s.doc_id = t.doc_id and t.pos between s.s and s.e)),
agg as (
  select doc_id, cast(count(*) as bigint) as n_kept,
         string_agg(tok, ' ' order by pos) as new_text
  from kept group by 1)
select d.doc_id, cast(len(d.toks) as bigint) as n_tokens,
       cast(len(d.toks) - coalesce(a.n_kept, 0) as bigint) as n_trimmed,
       coalesce(a.new_text, '') as new_text
from docs d left join agg a using (doc_id)
"""


def q207_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-span decontamination (ext/dedup.decontaminate_runs): the
    source='src0' slice plays the benchmark, everything else the
    training corpus; every training doc sharing a >= 12-token
    VERBATIM run with any benchmark doc is flagged with the actual
    maximal overlap. min_shared=1 + the winnow guarantee make
    detection exact at this threshold — no contaminated pair can
    escape the candidate set. All contaminated pairs, exact
    integers."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.where(F.col("source") == "src0").select("doc_id", "text")
    train = docs.where(F.col("source") != "src0").select("doc_id", "text")
    return dedup.decontaminate_runs(train, bench, min_run=12)


ORACLE_Q207 = """
with
docs as (
  select doc_id, source,
         list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
dk as (
  select doc_id, source, toks, len(toks) - 4 as m
  from docs where len(toks) >= 5),
h as (
  select doc_id, source, m, i as pos,
         cast(cast('0x' || substring(md5(
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
             toks[i+3] || ' ' || toks[i+4]
         ), 1, 15) as ubigint) as bigint) as h
  from dk, unnest(range(1, m + 1)) t(i)),
wmin as (
  select doc_id, source, m, pos,
         min(h) over (partition by doc_id order by pos
                      rows between current row and 7 following) as fp
  from h),
fps as (
  select distinct doc_id, source, fp
  from wmin where pos <= greatest(m - 7, 1)),
pairs as (
  select distinct a.doc_id as bid, b.doc_id as tid
  from fps a
  join fps b on a.fp = b.fp
  where a.source = 'src0' and b.source <> 'src0'),
-- mirror of the engine's max_gram_freq=64 cap (see ORACLE_Q205);
-- both the benchmark and training sides are capped, as in
-- decontaminate_runs' union before _run_streaks
hc as (
  select doc_id, pos, h from (
    select doc_id, pos, h,
           count(*) over (partition by doc_id, h) as gf
    from h)
  where gf <= 64),
mtch as (
  select p.bid, p.tid, h1.pos as i, h1.pos - h2.pos as diag
  from pairs p
  join hc h1 on h1.doc_id = p.bid
  join hc h2 on h2.doc_id = p.tid and h2.h = h1.h),
st as (
  select bid, tid, diag, i,
         i - row_number() over (partition by bid, tid, diag order by i)
           as grp
  from mtch),
runs as (
  select bid, tid, diag, grp, cast(count(*) + 4 as bigint) as run
  from st group by 1, 2, 3, 4)
select bid as bench_id, tid as doc_id,
       cast(max(run) as bigint) as longest_run,
       cast(count(*) as bigint) as n_runs
from runs where run >= 12
group by 1, 2
"""


def q208_decontaminate_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination REMOVAL (ext/dedup.decontaminate_trim, new in
    round 11): q207 flags the contaminated (benchmark, training)
    pairs; this executes the policy — every >= 12-token verbatim
    benchmark span is CUT from the training copy (islands merged, the
    GPT-3-appendix window-removal shape rather than whole-doc drops),
    the benchmark side untouched. One row per TRAINING document
    (doc_id, n_tokens, n_trimmed, new_text): the training corpus
    AFTER decontamination."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.where(F.col("source") == "src0").select("doc_id", "text")
    train = docs.where(F.col("source") != "src0").select("doc_id", "text")
    return dedup.decontaminate_trim(train, bench, min_run=12)


ORACLE_Q208 = """
with
docs as (
  -- coalesce mirrors the engine's NULL-text contract (_trim_by_spans
  -- treats NULL text as zero tokens; ADVICE r11 #4) so a NULL-text row
  -- yields n_tokens=0 rather than NULL
  select doc_id, source,
         list_filter(string_split(trim(coalesce(text, '')), ' '),
                     x -> x <> '') as toks
  from documents),
train as (select doc_id, toks from docs where source <> 'src0'),
dk as (
  select doc_id, source, toks, len(toks) - 4 as m
  from docs where len(toks) >= 5),
h as (
  select doc_id, source, m, i as pos,
         cast(cast('0x' || substring(md5(
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
             toks[i+3] || ' ' || toks[i+4]
         ), 1, 15) as ubigint) as bigint) as h
  from dk, unnest(range(1, m + 1)) t(i)),
wmin as (
  select doc_id, source, m, pos,
         min(h) over (partition by doc_id order by pos
                      rows between current row and 7 following) as fp
  from h),
fps as (
  select distinct doc_id, source, fp
  from wmin where pos <= greatest(m - 7, 1)),
pairs as (
  select distinct a.doc_id as bid, b.doc_id as tid
  from fps a
  join fps b on a.fp = b.fp
  where a.source = 'src0' and b.source <> 'src0'),
-- mirror of the engine's max_gram_freq=64 cap (see ORACLE_Q205)
hc as (
  select doc_id, pos, h from (
    select doc_id, pos, h,
           count(*) over (partition by doc_id, h) as gf
    from h)
  where gf <= 64),
mtch as (
  select p.bid, p.tid, h1.pos as i, h1.pos - h2.pos as diag
  from pairs p
  join hc h1 on h1.doc_id = p.bid
  join hc h2 on h2.doc_id = p.tid and h2.h = h1.h),
st as (
  select bid, tid, diag, i,
         i - row_number() over (partition by bid, tid, diag order by i)
           as grp
  from mtch),
runs as (
  select bid, tid, diag, grp, min(i) - diag as jmin,
         cast(count(*) + 4 as bigint) as run
  from st group by 1, 2, 3, 4),
spans as (
  select tid as doc_id, jmin as s, jmin + run - 1 as e
  from runs where run >= 12),
tokpos as (
  select doc_id, i as pos, toks[i] as tok
  from train, unnest(range(1, len(toks) + 1)) t(i)),
kept as (
  select t.doc_id, t.pos, t.tok
  from tokpos t
  where not exists (
    select 1 from spans s
    where s.doc_id = t.doc_id and t.pos between s.s and s.e)),
agg as (
  select doc_id, cast(count(*) as bigint) as n_kept,
         string_agg(tok, ' ' order by pos) as new_text
  from kept group by 1)
select d.doc_id, cast(len(d.toks) as bigint) as n_tokens,
       cast(len(d.toks) - coalesce(a.n_kept, 0) as bigint) as n_trimmed,
       coalesce(a.new_text, '') as new_text
from train d left join agg a using (doc_id)
"""


def q209_self_trim_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document exact-substring trim (ext/dedup.
    self_trim_repeats, X205): every later occurrence of a >= 3-token
    span already seen EARLIER in the same document is cut, the first
    occurrence kept — the intra-doc half of the Lee et al. rule and
    the ACT twin of q54's repetition measurement. Params pinned at
    k=2, min_run=3: the synthetic corpus's within-doc repetition is
    short token stutter ('batch batch batch batch'), so this is the
    signal range where the fixture actually exercises the trim
    (production defaults are k=5, min_run=8, matching
    trim_shared_runs). One row per input document."""
    return dedup.self_trim_repeats(
        load(spark, sf_dir, "documents"), k=2, min_run=3
    )


ORACLE_Q209 = """
with
docs as (
  -- coalesce mirrors the engine's NULL-text contract (ADVICE r11 #4)
  select doc_id,
         list_filter(string_split(trim(coalesce(text, '')), ' '),
                     x -> x <> '') as toks
  from documents),
dk as (
  select doc_id, toks, len(toks) - 1 as m
  from docs where len(toks) >= 2),
h as (
  select doc_id, i as pos,
         cast(cast('0x' || substring(md5(
             toks[i] || ' ' || toks[i+1]
         ), 1, 15) as ubigint) as bigint) as h
  from dk, unnest(range(1, m + 1)) t(i)),
-- mirror of the engine's max_gram_freq=64 cap (see ORACLE_Q205)
hc as (
  select doc_id, pos, h from (
    select doc_id, pos, h,
           count(*) over (partition by doc_id, h) as gf
    from h)
  where gf <= 64),
mtch as (
  select a.doc_id, b.pos as j, b.pos - a.pos as diag
  from hc a
  join hc b on a.doc_id = b.doc_id and a.h = b.h and a.pos < b.pos),
st as (
  select doc_id, diag, j,
         j - row_number() over (partition by doc_id, diag order by j)
           as grp
  from mtch),
runs as (
  select doc_id, diag, grp, min(j) as jmin,
         cast(count(*) + 1 as bigint) as run
  from st group by 1, 2, 3),
spans as (
  select doc_id, jmin as s, jmin + run - 1 as e
  from runs where run >= 3),
tokpos as (
  select doc_id, i as pos, toks[i] as tok
  from docs, unnest(range(1, len(toks) + 1)) t(i)),
kept as (
  select t.doc_id, t.pos, t.tok
  from tokpos t
  where not exists (
    select 1 from spans s
    where s.doc_id = t.doc_id and t.pos between s.s and s.e)),
agg as (
  select doc_id, cast(count(*) as bigint) as n_kept,
         string_agg(tok, ' ' order by pos) as new_text
  from kept group by 1)
select d.doc_id, cast(len(d.toks) as bigint) as n_tokens,
       cast(len(d.toks) - coalesce(a.n_kept, 0) as bigint) as n_trimmed,
       coalesce(a.new_text, '') as new_text
from docs d left join agg a using (doc_id)
"""


def q210_benchmark_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-benchmark-doc contamination report (ext/dedup.
    benchmark_coverage, X206): q207 flags the contaminated (benchmark,
    training) pairs; this inverts the view to the EVAL OWNER's
    question — for every benchmark document (the source='src0' slice),
    how many training docs quote it verbatim (>= 12 tokens), the
    longest quote, and the fraction of its own tokens covered by the
    island-merged union of all quotes. One row per benchmark doc,
    clean ones at zero."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.where(F.col("source") == "src0").select("doc_id", "text")
    train = docs.where(F.col("source") != "src0").select("doc_id", "text")
    return dedup.benchmark_coverage(train, bench, min_run=12)


ORACLE_Q210 = """
with
docs as (
  select doc_id, source,
         list_filter(string_split(trim(coalesce(text, '')), ' '),
                     x -> x <> '') as toks
  from documents),
dk as (
  select doc_id, source, toks, len(toks) - 4 as m
  from docs where len(toks) >= 5),
h as (
  select doc_id, source, m, i as pos,
         cast(cast('0x' || substring(md5(
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
             toks[i+3] || ' ' || toks[i+4]
         ), 1, 15) as ubigint) as bigint) as h
  from dk, unnest(range(1, m + 1)) t(i)),
wmin as (
  select doc_id, source, m, pos,
         min(h) over (partition by doc_id order by pos
                      rows between current row and 7 following) as fp
  from h),
fps as (
  select distinct doc_id, source, fp
  from wmin where pos <= greatest(m - 7, 1)),
pairs as (
  select distinct a.doc_id as bid, b.doc_id as tid
  from fps a
  join fps b on a.fp = b.fp
  where a.source = 'src0' and b.source <> 'src0'),
-- mirror of the engine's max_gram_freq=64 cap (see ORACLE_Q205)
hc as (
  select doc_id, pos, h from (
    select doc_id, pos, h,
           count(*) over (partition by doc_id, h) as gf
    from h)
  where gf <= 64),
mtch as (
  select p.bid, p.tid, h1.pos as i, h1.pos - h2.pos as diag
  from pairs p
  join hc h1 on h1.doc_id = p.bid
  join hc h2 on h2.doc_id = p.tid and h2.h = h1.h),
st as (
  select bid, tid, diag, i,
         i - row_number() over (partition by bid, tid, diag order by i)
           as grp
  from mtch),
runs as (
  select bid, tid, diag, grp, min(i) as bmin,
         cast(count(*) + 4 as bigint) as run
  from st group by 1, 2, 3, 4),
qruns as (select bid, tid, bmin, run from runs where run >= 12),
stats as (
  select bid, cast(count(*) as bigint) as n_train_docs,
         cast(max(run) as bigint) as longest_run
  from (select bid, tid, max(run) as run from qruns group by 1, 2)
  group by 1),
spans as (select bid, bmin as s, bmin + run - 1 as e from qruns),
ord as (
  select bid, s, e,
         max(e) over (partition by bid order by s, e
                      rows between unbounded preceding and 1 preceding)
           as pmax
  from spans),
isl as (
  select bid, s, e,
         sum(case when pmax is null or s > pmax then 1 else 0 end)
           over (partition by bid order by s, e) as g
  from ord),
merged as (select bid, g, min(s) as s, max(e) as e from isl group by 1, 2),
cov as (
  select bid, cast(sum(e - s + 1) as bigint) as covered_tokens
  from merged group by 1)
select d.doc_id as bench_id,
       cast(len(d.toks) as bigint) as n_tokens,
       coalesce(st.n_train_docs, 0) as n_train_docs,
       coalesce(st.longest_run, 0) as longest_run,
       coalesce(c.covered_tokens, 0) as covered_tokens,
       cast(coalesce(c.covered_tokens, 0) as double)
         / cast(greatest(len(d.toks), 1) as double) as coverage
from docs d
left join stats st on st.bid = d.doc_id
left join cov c on c.bid = d.doc_id
where d.source = 'src0'
"""


def q211_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-guarded train/val/test split (ext/sampling.
    leakage_safe_split, X207): near-duplicate documents must never
    straddle the split boundary, so the assignment unit is the
    duplicate CLUSTER (exact-Jaccard pairs -> connected components),
    keyed by the cluster's canonical id through the same knuth bucket
    as q38. Docs in no pair split independently. One row per doc."""
    d = load(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(d, threshold=0.8)
    out = sampling.leakage_safe_split(
        d,
        pairs,
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
        method="knuth",
    )
    return out.select("doc_id", "split")


# same shingle/pair/component CTEs as ORACLE_Q49, then q38's knuth
# split keyed by the component id instead of the doc id
ORACLE_Q211 = """
with recursive
docs as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
docs3 as (select * from docs where len(toks) >= 3),
sh as (
  select distinct doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] as shingle
  from docs3, unnest(range(1, len(toks) - 1)) t(i)),
sizes as (select doc_id, count(*) as n from sh group by doc_id),
common as (
  select a.doc_id as d1, b.doc_id as d2, count(*) as c
  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
  group by 1, 2),
pairs as (
  select d1, d2 from common
  join sizes na on na.doc_id = d1
  join sizes nb on nb.doc_id = d2
  where cast(c as double) / cast(na.n + nb.n - c as double) >= 0.8),
edges as (select d1 as a, d2 as b from pairs
          union all select d2, d1 from pairs),
reach(a, b) as (
  select a, b from edges
  union
  select r.a, e.b from reach r join edges e on r.b = e.a),
nodes as (select distinct a as node from edges),
comps as (
  select n.node as doc_id, least(n.node, min(r.b)) as gid
  from nodes n left join reach r on r.a = n.node
  group by n.node)
select d.doc_id,
       case when mod(coalesce(c.gid, d.doc_id) * 2654435761, 10000) < 8000
              then 'train'
            when mod(coalesce(c.gid, d.doc_id) * 2654435761, 10000) < 9000
              then 'val'
            else 'test' end as split
from documents d left join comps c using (doc_id)
"""


def q212_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication (ext/dedup.soft_dedup, X208): keep
    ceil(sqrt(n)) members of every n-member duplicate cluster instead
    of one keeper — the duplicate-DOWNWEIGHTING policy between hard
    dedup (alpha=0) and no dedup (alpha=1). Members ranked by the
    knuth hash bucket (oracle-replayable), ties by id. One row per
    doc with its cluster, quota, and kept flag."""
    d = load(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(d, threshold=0.8)
    return dedup.soft_dedup(pairs, d, alpha=0.5, method="knuth")


# same component CTEs as ORACLE_Q211, then the per-cluster
# ceil(sqrt(n)) quota over the knuth-ranked members
ORACLE_Q212 = """
with recursive
docs as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
docs3 as (select * from docs where len(toks) >= 3),
sh as (
  select distinct doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] as shingle
  from docs3, unnest(range(1, len(toks) - 1)) t(i)),
sizes as (select doc_id, count(*) as n from sh group by doc_id),
common as (
  select a.doc_id as d1, b.doc_id as d2, count(*) as c
  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
  group by 1, 2),
pairs as (
  select d1, d2 from common
  join sizes na on na.doc_id = d1
  join sizes nb on nb.doc_id = d2
  where cast(c as double) / cast(na.n + nb.n - c as double) >= 0.8),
edges as (select d1 as a, d2 as b from pairs
          union all select d2, d1 from pairs),
reach(a, b) as (
  select a, b from edges
  union
  select r.a, e.b from reach r join edges e on r.b = e.a),
nodes as (select distinct a as node from edges),
comps as (
  select n.node as doc_id, least(n.node, min(r.b)) as gid
  from nodes n left join reach r on r.a = n.node
  group by n.node),
lab as (
  select d.doc_id, coalesce(c.gid, d.doc_id) as cluster_id
  from documents d left join comps c using (doc_id)),
rk as (
  select doc_id, cluster_id,
         cast(count(*) over (partition by cluster_id) as bigint)
           as n_members,
         row_number() over (
           partition by cluster_id
           order by mod(doc_id * 2654435761, 10000), doc_id) as rn
  from lab)
select doc_id, cluster_id, n_members,
       cast(least(n_members, ceil(pow(n_members, 0.5))) as bigint) as quota,
       cast(case when rn <= least(n_members, ceil(pow(n_members, 0.5)))
                 then 1 else 0 end as bigint) as kept
from rk
"""


def q213_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit (ext/sampling.split_leakage_audit, X209):
    measure how many near-dup pairs straddle the NAIVE doc-keyed
    train/val/test split (q38's knuth assignment) — the number q211's
    cluster-keyed split drives to zero (property-tested). Off-diagonal
    rows are leaks; the diagonal is benign within-split duplication.
    One row per unordered split pair that holds any near-dup pair."""
    d = load(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(d, threshold=0.8)
    naive = sampling.split_assign(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, method="knuth"
    )
    return sampling.split_leakage_audit(naive, pairs)


# same shingle/pair CTEs as ORACLE_Q211 (no components needed), then
# q38's knuth split on each pair end and the unordered-cell rollup
ORACLE_Q213 = """
with
docs as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
docs3 as (select * from docs where len(toks) >= 3),
sh as (
  select distinct doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] as shingle
  from docs3, unnest(range(1, len(toks) - 1)) t(i)),
sizes as (select doc_id, count(*) as n from sh group by doc_id),
common as (
  select a.doc_id as d1, b.doc_id as d2, count(*) as c
  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
  group by 1, 2),
pairs as (
  select d1, d2 from common
  join sizes na on na.doc_id = d1
  join sizes nb on nb.doc_id = d2
  where cast(c as double) / cast(na.n + nb.n - c as double) >= 0.8),
sp as (
  select doc_id,
         case when mod(doc_id * 2654435761, 10000) < 8000 then 'train'
              when mod(doc_id * 2654435761, 10000) < 9000 then 'val'
              else 'test' end as split
  from documents)
select least(a.split, b.split) as split_a,
       greatest(a.split, b.split) as split_b,
       cast(count(*) as bigint) as n_pairs
from pairs p
join sp a on a.doc_id = p.d1
join sp b on b.doc_id = p.d2
group by 1, 2
"""


def q214_boilerplate_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate fraction (ext/textops.boilerplate_score,
    X210): the fraction of each doc's distinct 3-grams whose corpus
    document frequency exceeds 10 — the per-doc decision signal fed by
    q34-family corpus ranking (a doc near 1.0 is template chrome).
    One row per document, short docs at zero."""
    return textops.boilerplate_score(
        load(spark, sf_dir, "documents"), k=3, min_df=10
    )


ORACLE_Q214 = """
with
docs as (
  select doc_id,
         list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
dk as (
  select doc_id, toks, len(toks) - 2 as m
  from docs where len(toks) >= 3),
g as (
  select distinct doc_id,
         cast(cast('0x' || substring(md5(
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         ), 1, 15) as ubigint) as bigint) as h
  from dk, unnest(range(1, m + 1)) t(i)),
census as (select h, count(*) as df from g group by h),
hot as (select h from census where df > 10),
n_all as (select doc_id, cast(count(*) as bigint) as n_grams from g group by 1),
n_hot as (
  select g.doc_id, cast(count(*) as bigint) as n_hot
  from g join hot using (h) group by 1)
select d.doc_id,
       coalesce(a.n_grams, 0) as n_grams,
       coalesce(h.n_hot, 0) as n_hot,
       cast(coalesce(h.n_hot, 0) as double)
         / cast(greatest(coalesce(a.n_grams, 0), 1) as double)
         as boilerplate_frac
from docs d
left join n_all a using (doc_id)
left join n_hot h using (doc_id)
"""


def q215_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold-sensitivity report (ext/dedup.
    dedup_threshold_sweep, X211): pair and distinct-doc counts at
    0.7/0.8/0.9/0.95 from ONE exact-Jaccard discovery at the loosest
    threshold — the audit that justifies (or indicts) the corpus's
    dedup threshold choice. Zero-pair thresholds still report 0/0."""
    pairs = dedup.jaccard_pairs(
        load(spark, sf_dir, "documents"), threshold=0.7
    )
    return dedup.dedup_threshold_sweep(
        pairs, thresholds=(0.7, 0.8, 0.9, 0.95)
    )


ORACLE_Q215 = """
with
docs as (
  select doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents),
docs3 as (select * from docs where len(toks) >= 3),
sh as (
  select distinct doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] as shingle
  from docs3, unnest(range(1, len(toks) - 1)) t(i)),
sizes as (select doc_id, count(*) as n from sh group by doc_id),
common as (
  select a.doc_id as d1, b.doc_id as d2, count(*) as c
  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
  group by 1, 2),
pairs as (
  select d1, d2,
         cast(c as double) / cast(na.n + nb.n - c as double) as jacc
  from common
  join sizes na on na.doc_id = d1
  join sizes nb on nb.doc_id = d2
  where cast(c as double) / cast(na.n + nb.n - c as double) >= 0.7),
-- the cast matters: a bare decimal list would hash-mismatch Spark's
-- double thresholds ('0.90' vs '0.9')
th as (select cast(unnest([0.7, 0.8, 0.9, 0.95]) as double) as threshold),
e as (
  select t.threshold, p.d1, p.d2
  from th t join pairs p on p.jacc >= t.threshold),
np as (select threshold, cast(count(*) as bigint) as n_pairs from e group by 1),
nd as (
  select threshold, cast(count(distinct doc) as bigint) as n_docs
  from (select threshold, d1 as doc from e
        union all select threshold, d2 from e)
  group by 1)
select t.threshold,
       coalesce(np.n_pairs, 0) as n_pairs,
       coalesce(nd.n_docs, 0) as n_docs
from th t
left join np using (threshold)
left join nd using (threshold)
"""


def q216_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (ext/sampling.cap_per_group, X212): keep
    at most 30 docs per source, chosen as the lowest knuth hash
    buckets (ties by id) — the crawl-hygiene rule that stops any one
    domain from dominating the mix, deterministic and oracle-
    replayable. Per-source counts of the kept set."""
    capped = sampling.cap_per_group(
        load(spark, sf_dir, "documents"), "source", 30, "doc_id",
        method="knuth",
    )
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


ORACLE_Q216 = """
with rk as (
  select source, doc_id,
         row_number() over (
           partition by source
           order by mod(doc_id * 2654435761, 10000), doc_id) as rn
  from documents)
select source, cast(count(*) as bigint) as n_kept,
       min(doc_id) as min_id, max(doc_id) as max_id
from rk where rn <= 30
group by source
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_notin_filter": q02_notin_filter,
    "q03_paged_scan": q03_paged_scan,
    "q04_page_plan": q04_page_plan,
    "q05_ordered_string_agg": q05_ordered_string_agg,
    "q06_meta_join": q06_meta_join,
    "q07_index_synthesis": q07_index_synthesis,
    "q08_correlated_subquery": q08_correlated_subquery,
    "q09_count_compare": q09_count_compare,
    "q10_checksum": q10_checksum,
    "q11_topk_window": q11_topk_window,
    "q12_rollup": q12_rollup,
    "q13_setops": q13_setops,
    "q14_json_extract": q14_json_extract,
    "q15_ts_bucket": q15_ts_bucket,
    "q16_shipping_priority": q16_shipping_priority,
    "q17_local_supplier": q17_local_supplier,
    "q18_dedup_exact": q18_dedup_exact,
    "q19_dedup_jaccard": q19_dedup_jaccard,
    "q20_dedup_minhash": q20_dedup_minhash,
    "q21_simhash": q21_simhash,
    "q22_knn_cosine": q22_knn_cosine,
    "q23_ivf_assign": q23_ivf_assign,
    "q24_lang_id": q24_lang_id,
    "q25_quality_score": q25_quality_score,
    "q26_token_count": q26_token_count,
    "q27_fingerprint": q27_fingerprint,
    "q28_asof_join": q28_asof_join,
    "q29_sessionize": q29_sessionize,
    "q30_distinct_agg": q30_distinct_agg,
    "q31_embedding_neardup": q31_embedding_neardup,
    "q32_embedding_neardup_lsh": q32_embedding_neardup_lsh,
    "q33_cube": q33_cube,
    "q34_ddl_typemap": q34_ddl_typemap,
    "q35_objects_ddl": q35_objects_ddl,
    "q36_simhash_pairs": q36_simhash_pairs,
    "q37_range_join": q37_range_join,
    "q38_train_split": q38_train_split,
    "q39_stratified_sample": q39_stratified_sample,
    "q40_length_histogram": q40_length_histogram,
    "q41_salted_distinct": q41_salted_distinct,
    "q42_row_diff": q42_row_diff,
    "q43_hopping_window": q43_hopping_window,
    "q44_pivot": q44_pivot,
    "q45_running_total": q45_running_total,
    "q46_ntile": q46_ntile,
    "q47_percentiles": q47_percentiles,
    "q48_approx_distinct": q48_approx_distinct,
    "q49_dedup_groups": q49_dedup_groups,
    "q50_corpus_prep": q50_corpus_prep,
    "q51_batch_knn": q51_batch_knn,
    "q52_partition_checksums": q52_partition_checksums,
    "q53_normalized_dedup": q53_normalized_dedup,
    "q54_repetition_stats": q54_repetition_stats,
    "q55_boilerplate_ngrams": q55_boilerplate_ngrams,
    "q56_decontamination": q56_decontamination,
    "q57_temperature_sample": q57_temperature_sample,
    "q58_vocab_topk": q58_vocab_topk,
    "q59_hamming_pairs": q59_hamming_pairs,
    "q60_tfidf_topk": q60_tfidf_topk,
    "q61_source_cap": q61_source_cap,
    "q62_quantize_embeddings": q62_quantize_embeddings,
    "q63_incremental_dedup": q63_incremental_dedup,
    "q64_redact_pii": q64_redact_pii,
    "q65_merge_snapshot": q65_merge_snapshot,
    "q66_table_profile": q66_table_profile,
    "q67_fk_orphans": q67_fk_orphans,
    "q68_pack_sequences": q68_pack_sequences,
    "q69_percentile_filter": q69_percentile_filter,
    "q70_gap_fill": q70_gap_fill,
    "q71_span_dedup": q71_span_dedup,
    "q72_key_skew": q72_key_skew,
    "q73_collocations": q73_collocations,
    "q74_filtered_knn": q74_filtered_knn,
    "q75_dedup_shrink": q75_dedup_shrink,
    "q76_group_normalize": q76_group_normalize,
    "q77_rarity_score": q77_rarity_score,
    "q78_budget_mix": q78_budget_mix,
    "q79_centroid_outliers": q79_centroid_outliers,
    "q80_merge_cdc": q80_merge_cdc,
    "q81_char_ngram_profile": q81_char_ngram_profile,
    "q82_chunk_documents": q82_chunk_documents,
    "q83_hamming_join": q83_hamming_join,
    "q84_filter_report": q84_filter_report,
    "q85_kmv_distinct": q85_kmv_distinct,
    "q86_ivf_batch_search": q86_ivf_batch_search,
    "q87_mixture_report": q87_mixture_report,
    "q88_funnel": q88_funnel,
    "q89_retention": q89_retention,
    "q90_pps_sample": q90_pps_sample,
    "q91_pagerank": q91_pagerank,
    "q92_heavy_hitters": q92_heavy_hitters,
    "q93_negative_pairs": q93_negative_pairs,
    "q94_source_overlap": q94_source_overlap,
    "q95_time_rollup": q95_time_rollup,
    "q96_event_transitions": q96_event_transitions,
    "q97_mad_outliers": q97_mad_outliers,
    "q98_sampled_quantiles": q98_sampled_quantiles,
    "q99_inverted_index": q99_inverted_index,
    "q100_histogram": q100_histogram,
    "q101_scd2_history": q101_scd2_history,
    "q102_equidepth_buckets": q102_equidepth_buckets,
    "q103_exact_corr": q103_exact_corr,
    "q104_group_split": q104_group_split,
    "q105_star_rollup": q105_star_rollup,
    "q106_rank_normalize": q106_rank_normalize,
    "q107_rolling_deviation": q107_rolling_deviation,
    "q108_kmv_overlap": q108_kmv_overlap,
    "q109_seasonality": q109_seasonality,
    "q110_cohort_ltv": q110_cohort_ltv,
    "q111_rfm_segments": q111_rfm_segments,
    "q112_last_touch": q112_last_touch,
    "q113_market_basket": q113_market_basket,
    "q114_session_paths": q114_session_paths,
    "q115_vocab_coverage": q115_vocab_coverage,
    "q116_pareto_front": q116_pareto_front,
    "q117_kmeans_step": q117_kmeans_step,
    "q118_bm25": q118_bm25,
    "q119_snapshots_at": q119_snapshots_at,
    "q120_editdist_pairs": q120_editdist_pairs,
    "q121_bpe_pairs": q121_bpe_pairs,
    "q122_next_event": q122_next_event,
    "q123_embedding_profile": q123_embedding_profile,
    "q124_entity_resolution": q124_entity_resolution,
    "q125_topk_with_ties": q125_topk_with_ties,
    "q126_revenue_share": q126_revenue_share,
    "q127_ma_crossover": q127_ma_crossover,
    "q128_dup_cluster_sizes": q128_dup_cluster_sizes,
    "q129_weighted_median": q129_weighted_median,
    "q130_range_frame": q130_range_frame,
    "q131_grouping_sets": q131_grouping_sets,
    "q132_lang_confusion": q132_lang_confusion,
    "q133_calibration_bins": q133_calibration_bins,
    "q134_ab_ztest": q134_ab_ztest,
    "q135_hash_embed_centroids": q135_hash_embed_centroids,
    "q136_churn_hazard": q136_churn_hazard,
    "q137_max_concurrency": q137_max_concurrency,
    "q138_triangles": q138_triangles,
    "q139_containment_pairs": q139_containment_pairs,
    "q140_extract_matches": q140_extract_matches,
    "q141_latest_state": q141_latest_state,
    "q142_window_uniques": q142_window_uniques,
    "q143_mom_growth": q143_mom_growth,
    "q144_time_to_convert": q144_time_to_convert,
    "q145_keeper_policy": q145_keeper_policy,
    "q146_bounce_rate": q146_bounce_rate,
    "q147_dedup_savings": q147_dedup_savings,
    "q148_order_reconciliation": q148_order_reconciliation,
    "q149_source_drift": q149_source_drift,
    "q150_ks_statistic": q150_ks_statistic,
    "q151_lorenz_deciles": q151_lorenz_deciles,
    "q152_bounded_conversion": q152_bounded_conversion,
    "q153_ols_trend": q153_ols_trend,
    "q154_cumulative_uniques": q154_cumulative_uniques,
    "q155_new_vs_returning": q155_new_vs_returning,
    "q156_twap": q156_twap,
    "q157_vocab_growth": q157_vocab_growth,
    "q158_ngram_novelty": q158_ngram_novelty,
    "q159_cluster_keeper": q159_cluster_keeper,
    "q160_zone_map_pruning": q160_zone_map_pruning,
    "q161_unpivot_metrics": q161_unpivot_metrics,
    "q162_shard_balance": q162_shard_balance,
    "q163_bloom_semi_audit": q163_bloom_semi_audit,
    "q164_join_forecast": q164_join_forecast,
    "q165_salting_model": q165_salting_model,
    "q166_partial_agg_merge": q166_partial_agg_merge,
    "q167_reference_percentile": q167_reference_percentile,
    "q168_clustering_coefficient": q168_clustering_coefficient,
    "q169_encoding_profile": q169_encoding_profile,
    "q170_quantile_error_audit": q170_quantile_error_audit,
    "q171_calendar_gaps": q171_calendar_gaps,
    "q172_k_anonymity_audit": q172_k_anonymity_audit,
    "q173_mode_by_group": q173_mode_by_group,
    "q174_stickiness": q174_stickiness,
    "q175_winsorized_stats": q175_winsorized_stats,
    "q176_interarrival_histogram": q176_interarrival_histogram,
    "q177_fk_completeness": q177_fk_completeness,
    "q178_semantic_dedup": q178_semantic_dedup,
    "q179_source_concentration": q179_source_concentration,
    "q180_cross_source_dup_matrix": q180_cross_source_dup_matrix,
    "q181_benford_audit": q181_benford_audit,
    "q182_lag1_autocorr": q182_lag1_autocorr,
    "q183_rrf_fusion": q183_rrf_fusion,
    "q184_minhash_recall_audit": q184_minhash_recall_audit,
    "q185_topk_with_other": q185_topk_with_other,
    "q186_freshness_audit": q186_freshness_audit,
    "q187_tokenizer_fertility": q187_tokenizer_fertility,
    "q188_lsh_precision_audit": q188_lsh_precision_audit,
    "q189_charclass_profile": q189_charclass_profile,
    "q190_truncation_loss": q190_truncation_loss,
    "q191_transitions_by_hour": q191_transitions_by_hour,
    "q192_quantization_error": q192_quantization_error,
    "q193_chisq_lang_source": q193_chisq_lang_source,
    "q194_hll_distinct": q194_hll_distinct,
    "q195_dedup_survivorship": q195_dedup_survivorship,
    "q196_cluster_size_histogram": q196_cluster_size_histogram,
    "q197_zorder_key": q197_zorder_key,
    "q198_zorder_pruning": q198_zorder_pruning,
    "q199_dedup_report": q199_dedup_report,
    "q200_lm_surprisal": q200_lm_surprisal,
    "q201_winnow_pairs": q201_winnow_pairs,
    "q202_target_affinity": q202_target_affinity,
    "q203_lm_drift": q203_lm_drift,
    "q204_winnow_dedup_report": q204_winnow_dedup_report,
    "q205_shared_runs": q205_shared_runs,
    "q206_trim_shared_runs": q206_trim_shared_runs,
    "q207_decontaminate": q207_decontaminate,
    "q208_decontaminate_trim": q208_decontaminate_trim,
    "q209_self_trim_repeats": q209_self_trim_repeats,
    "q210_benchmark_coverage": q210_benchmark_coverage,
    "q211_leakage_safe_split": q211_leakage_safe_split,
    "q212_soft_dedup": q212_soft_dedup,
    "q213_split_leakage": q213_split_leakage,
    "q214_boilerplate_score": q214_boilerplate_score,
    "q215_threshold_sweep": q215_threshold_sweep,
    "q216_source_cap": q216_source_cap,
}

ORACLES: dict[str, str] = {
    "q01_pricing_summary": ORACLE_Q01,
    "q02_notin_filter": ORACLE_Q02,
    "q03_paged_scan": ORACLE_Q03,
    "q04_page_plan": ORACLE_Q04,
    "q05_ordered_string_agg": ORACLE_Q05,
    "q06_meta_join": ORACLE_Q06,
    "q07_index_synthesis": ORACLE_Q07,
    "q08_correlated_subquery": ORACLE_Q08,
    "q09_count_compare": ORACLE_Q09,
    "q10_checksum": ORACLE_Q10,
    "q11_topk_window": ORACLE_Q11,
    "q12_rollup": ORACLE_Q12,
    "q13_setops": ORACLE_Q13,
    "q14_json_extract": ORACLE_Q14,
    "q15_ts_bucket": ORACLE_Q15,
    "q16_shipping_priority": ORACLE_Q16,
    "q17_local_supplier": ORACLE_Q17,
    "q18_dedup_exact": ORACLE_Q18,
    "q19_dedup_jaccard": ORACLE_Q19,
    "q20_dedup_minhash": ORACLE_Q20,
    "q21_simhash": ORACLE_Q21,
    "q22_knn_cosine": ORACLE_Q22,
    "q23_ivf_assign": ORACLE_Q23,
    "q24_lang_id": ORACLE_Q24,
    "q25_quality_score": ORACLE_Q25,
    "q26_token_count": ORACLE_Q26,
    "q27_fingerprint": ORACLE_Q27,
    "q28_asof_join": ORACLE_Q28,
    "q29_sessionize": ORACLE_Q29,
    "q30_distinct_agg": ORACLE_Q30,
    "q31_embedding_neardup": ORACLE_Q31,
    "q32_embedding_neardup_lsh": ORACLE_Q32,
    "q33_cube": ORACLE_Q33,
    "q34_ddl_typemap": ORACLE_Q34,
    "q35_objects_ddl": ORACLE_Q35,
    "q36_simhash_pairs": ORACLE_Q36,
    "q37_range_join": ORACLE_Q37,
    "q38_train_split": ORACLE_Q38,
    "q39_stratified_sample": ORACLE_Q39,
    "q40_length_histogram": ORACLE_Q40,
    "q41_salted_distinct": ORACLE_Q41,
    "q42_row_diff": ORACLE_Q42,
    "q43_hopping_window": ORACLE_Q43,
    "q44_pivot": ORACLE_Q44,
    "q45_running_total": ORACLE_Q45,
    "q46_ntile": ORACLE_Q46,
    "q47_percentiles": ORACLE_Q47,
    # round 11 (VERDICT r10 #5): q48 re-gated from rows-only native
    # HLL++ to the portable m=64 sketch — estimate hash-matches
    "q48_approx_distinct": ORACLE_Q48,
    "q49_dedup_groups": ORACLE_Q49,
    "q50_corpus_prep": ORACLE_Q50,
    "q51_batch_knn": ORACLE_Q51,
    "q52_partition_checksums": ORACLE_Q52,
    "q53_normalized_dedup": ORACLE_Q53,
    "q54_repetition_stats": ORACLE_Q54,
    "q55_boilerplate_ngrams": ORACLE_Q55,
    "q56_decontamination": ORACLE_Q56,
    "q57_temperature_sample": ORACLE_Q57,
    "q58_vocab_topk": ORACLE_Q58,
    "q59_hamming_pairs": ORACLE_Q59,
    "q60_tfidf_topk": ORACLE_Q60,
    "q61_source_cap": ORACLE_Q61,
    "q62_quantize_embeddings": ORACLE_Q62,
    "q63_incremental_dedup": ORACLE_Q63,
    "q64_redact_pii": ORACLE_Q64,
    "q65_merge_snapshot": ORACLE_Q65,
    "q66_table_profile": ORACLE_Q66,
    "q67_fk_orphans": ORACLE_Q67,
    "q68_pack_sequences": ORACLE_Q68,
    "q69_percentile_filter": ORACLE_Q69,
    "q70_gap_fill": ORACLE_Q70,
    "q71_span_dedup": ORACLE_Q71,
    "q72_key_skew": ORACLE_Q72,
    "q73_collocations": ORACLE_Q73,
    "q74_filtered_knn": ORACLE_Q74,
    "q75_dedup_shrink": ORACLE_Q75,
    "q76_group_normalize": ORACLE_Q76,
    "q77_rarity_score": ORACLE_Q77,
    "q78_budget_mix": ORACLE_Q78,
    "q79_centroid_outliers": ORACLE_Q79,
    "q80_merge_cdc": ORACLE_Q80,
    "q81_char_ngram_profile": ORACLE_Q81,
    "q82_chunk_documents": ORACLE_Q82,
    "q83_hamming_join": ORACLE_Q83,
    "q84_filter_report": ORACLE_Q84,
    "q85_kmv_distinct": ORACLE_Q85,
    "q86_ivf_batch_search": ORACLE_Q86,
    "q87_mixture_report": ORACLE_Q87,
    "q88_funnel": ORACLE_Q88,
    "q89_retention": ORACLE_Q89,
    "q90_pps_sample": ORACLE_Q90,
    "q91_pagerank": ORACLE_Q91,
    "q92_heavy_hitters": ORACLE_Q92,
    "q93_negative_pairs": ORACLE_Q93,
    "q94_source_overlap": ORACLE_Q94,
    "q95_time_rollup": ORACLE_Q95,
    "q96_event_transitions": ORACLE_Q96,
    "q97_mad_outliers": ORACLE_Q97,
    "q98_sampled_quantiles": ORACLE_Q98,
    "q99_inverted_index": ORACLE_Q99,
    "q100_histogram": ORACLE_Q100,
    "q101_scd2_history": ORACLE_Q101,
    "q102_equidepth_buckets": ORACLE_Q102,
    "q103_exact_corr": ORACLE_Q103,
    "q104_group_split": ORACLE_Q104,
    "q105_star_rollup": ORACLE_Q105,
    "q106_rank_normalize": ORACLE_Q106,
    "q107_rolling_deviation": ORACLE_Q107,
    "q108_kmv_overlap": ORACLE_Q108,
    "q109_seasonality": ORACLE_Q109,
    "q110_cohort_ltv": ORACLE_Q110,
    "q111_rfm_segments": ORACLE_Q111,
    "q112_last_touch": ORACLE_Q112,
    "q113_market_basket": ORACLE_Q113,
    "q114_session_paths": ORACLE_Q114,
    "q115_vocab_coverage": ORACLE_Q115,
    "q116_pareto_front": ORACLE_Q116,
    "q117_kmeans_step": ORACLE_Q117,
    "q118_bm25": ORACLE_Q118,
    "q119_snapshots_at": ORACLE_Q119,
    "q120_editdist_pairs": ORACLE_Q120,
    "q121_bpe_pairs": ORACLE_Q121,
    "q122_next_event": ORACLE_Q122,
    "q123_embedding_profile": ORACLE_Q123,
    "q124_entity_resolution": ORACLE_Q124,
    "q125_topk_with_ties": ORACLE_Q125,
    "q126_revenue_share": ORACLE_Q126,
    "q127_ma_crossover": ORACLE_Q127,
    "q128_dup_cluster_sizes": ORACLE_Q128,
    "q129_weighted_median": ORACLE_Q129,
    "q130_range_frame": ORACLE_Q130,
    "q131_grouping_sets": ORACLE_Q131,
    "q132_lang_confusion": ORACLE_Q132,
    "q133_calibration_bins": ORACLE_Q133,
    "q134_ab_ztest": ORACLE_Q134,
    "q135_hash_embed_centroids": ORACLE_Q135,
    "q136_churn_hazard": ORACLE_Q136,
    "q137_max_concurrency": ORACLE_Q137,
    "q138_triangles": ORACLE_Q138,
    "q139_containment_pairs": ORACLE_Q139,
    "q140_extract_matches": ORACLE_Q140,
    "q141_latest_state": ORACLE_Q141,
    "q142_window_uniques": ORACLE_Q142,
    "q143_mom_growth": ORACLE_Q143,
    "q144_time_to_convert": ORACLE_Q144,
    "q145_keeper_policy": ORACLE_Q145,
    "q146_bounce_rate": ORACLE_Q146,
    "q147_dedup_savings": ORACLE_Q147,
    "q148_order_reconciliation": ORACLE_Q148,
    "q149_source_drift": ORACLE_Q149,
    "q150_ks_statistic": ORACLE_Q150,
    "q151_lorenz_deciles": ORACLE_Q151,
    "q152_bounded_conversion": ORACLE_Q152,
    "q153_ols_trend": ORACLE_Q153,
    "q154_cumulative_uniques": ORACLE_Q154,
    "q155_new_vs_returning": ORACLE_Q155,
    "q156_twap": ORACLE_Q156,
    "q157_vocab_growth": ORACLE_Q157,
    "q158_ngram_novelty": ORACLE_Q158,
    "q159_cluster_keeper": ORACLE_Q159,
    "q160_zone_map_pruning": ORACLE_Q160,
    "q161_unpivot_metrics": ORACLE_Q161,
    "q162_shard_balance": ORACLE_Q162,
    "q163_bloom_semi_audit": ORACLE_Q163,
    "q164_join_forecast": ORACLE_Q164,
    "q165_salting_model": ORACLE_Q165,
    "q166_partial_agg_merge": ORACLE_Q166,
    "q167_reference_percentile": ORACLE_Q167,
    "q168_clustering_coefficient": ORACLE_Q168,
    "q169_encoding_profile": ORACLE_Q169,
    "q170_quantile_error_audit": ORACLE_Q170,
    "q171_calendar_gaps": ORACLE_Q171,
    "q172_k_anonymity_audit": ORACLE_Q172,
    "q173_mode_by_group": ORACLE_Q173,
    "q174_stickiness": ORACLE_Q174,
    "q175_winsorized_stats": ORACLE_Q175,
    "q176_interarrival_histogram": ORACLE_Q176,
    "q177_fk_completeness": ORACLE_Q177,
    "q178_semantic_dedup": ORACLE_Q178,
    "q179_source_concentration": ORACLE_Q179,
    "q180_cross_source_dup_matrix": ORACLE_Q180,
    "q181_benford_audit": ORACLE_Q181,
    "q182_lag1_autocorr": ORACLE_Q182,
    "q183_rrf_fusion": ORACLE_Q183,
    "q184_minhash_recall_audit": ORACLE_Q184,
    "q185_topk_with_other": ORACLE_Q185,
    "q186_freshness_audit": ORACLE_Q186,
    "q187_tokenizer_fertility": ORACLE_Q187,
    "q188_lsh_precision_audit": ORACLE_Q188,
    "q189_charclass_profile": ORACLE_Q189,
    "q190_truncation_loss": ORACLE_Q190,
    "q191_transitions_by_hour": ORACLE_Q191,
    "q192_quantization_error": ORACLE_Q192,
    "q193_chisq_lang_source": ORACLE_Q193,
    "q194_hll_distinct": ORACLE_Q194,
    "q195_dedup_survivorship": ORACLE_Q195,
    "q196_cluster_size_histogram": ORACLE_Q196,
    "q197_zorder_key": ORACLE_Q197,
    "q198_zorder_pruning": ORACLE_Q198,
    "q199_dedup_report": ORACLE_Q199,
    "q200_lm_surprisal": ORACLE_Q200,
    "q201_winnow_pairs": ORACLE_Q201,
    "q202_target_affinity": ORACLE_Q202,
    "q203_lm_drift": ORACLE_Q203,
    "q204_winnow_dedup_report": ORACLE_Q204,
    "q205_shared_runs": ORACLE_Q205,
    "q206_trim_shared_runs": ORACLE_Q206,
    "q207_decontaminate": ORACLE_Q207,
    "q208_decontaminate_trim": ORACLE_Q208,
    "q209_self_trim_repeats": ORACLE_Q209,
    "q210_benchmark_coverage": ORACLE_Q210,
    "q211_leakage_safe_split": ORACLE_Q211,
    "q212_soft_dedup": ORACLE_Q212,
    "q213_split_leakage": ORACLE_Q213,
    "q214_boilerplate_score": ORACLE_Q214,
    "q215_threshold_sweep": ORACLE_Q215,
    "q216_source_cap": ORACLE_Q216,
}

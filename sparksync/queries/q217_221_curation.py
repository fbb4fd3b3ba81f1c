"""Round-13 curation-planning band, q217-q221: the attrition
waterfall every corpus paper publishes (q217), the token-budget epoch
recipe — water-filling with repeat ceilings (q218), the IVF member of
the ANN audit family (q219), the context-length packing-efficiency
sweep (q220), and the signal-discrimination AUC audit (q221).

Same conventions as every band: each gate def returns a DataFrame whose
columns are aliased identically in the DuckDB oracle below it.
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared fixture/session surface
from ._base import _dec, _register_views  # noqa: F401


def q217_filter_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attrition waterfall over the filter pipeline's gates
    (ext/textops.filter_attrition, X213): per rule in pipeline order,
    docs failing it, failing ONLY it (the marginal cost of the rule),
    cut at its stage, and surviving after it — one codegen map + one
    global aggregate, 3 output rows."""
    return textops.filter_attrition(load(spark, sf_dir, "documents"))


# the flags CTE mirrors ORACLE_Q84 (corpus_filter_report's per-doc
# verdicts); the waterfall is one aggregate + a 3-row union
ORACLE_Q217 = """
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
         case when en then 1 else 0 end as is_en,
         case when n >= 20 and n <= 1000
                    and (case when n > 0
                         then cast(stop_cnt as double) / n else 0.0 end) < 0.5
              then 1 else 0 end as q_keep,
         case when
                (case when n > 0
                      then 1.0 - cast(uniq as double) / n else 0.0 end) <= 0.6
                and
                (case when n2 > 0
                      then 1.0 - cast(uniq2 as double) / n2 else 0.0 end) <= 0.05
              then 1 else 0 end as rep_keep
  from v_src),
a as (
  select count(*) as n,
         sum(case when is_en = 0 then 1 else 0 end) as f1,
         sum(case when is_en = 0 and q_keep = 1 and rep_keep = 1
                  then 1 else 0 end) as o1,
         sum(case when q_keep = 0 then 1 else 0 end) as f2,
         sum(case when is_en = 1 and q_keep = 0 and rep_keep = 1
                  then 1 else 0 end) as o2,
         sum(case when is_en = 1 and q_keep = 0 then 1 else 0 end) as c2,
         sum(case when rep_keep = 0 then 1 else 0 end) as f3,
         sum(case when is_en = 1 and q_keep = 1 and rep_keep = 0
                  then 1 else 0 end) as o3
  from v)
select cast(1 as bigint) as stage, 'lang' as rule,
       cast(f1 as bigint) as n_fail, cast(o1 as bigint) as n_fail_only,
       cast(f1 as bigint) as n_cut, cast(n - f1 as bigint) as n_surviving
from a
union all
select 2, 'quality', cast(f2 as bigint), cast(o2 as bigint),
       cast(c2 as bigint), cast(n - f1 - c2 as bigint) from a
union all
select 3, 'repetition', cast(f3 as bigint), cast(o3 as bigint),
       cast(o3 as bigint), cast(n - f1 - c2 - o3 as bigint) from a
""".replace("from v_src", "from f")


def q218_epoch_recipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget epoch planning (ext/sampling.epoch_recipe, X214):
    water-filling allocation with a 2-epoch repeat ceiling over a
    fixed 50k-token budget — small sources cap at 2 epochs, the rest
    split the remainder evenly. All doubles derive
    from exact bigint sums with integer-valued caps (max_epochs=2.0),
    so every sum is exact and DuckDB replays the allocation
    bit-for-bit."""
    # 50k tokens: at sf0.01 (~27k corpus tokens, caps 2.2-3.1k) the
    # smallest sources CAP while the rest share the water level — both
    # branches of the allocation exercise at the driver's gate SF; at
    # sf0.1 no source caps (level far below every cap), covering the
    # uniform branch
    docs = load(spark, sf_dir, "documents")
    return sampling.epoch_recipe(
        docs, budget_tokens=50_000, max_epochs=2.0
    ).orderBy("source")


ORACLE_Q218 = """
with per as (
  select source as grp,
         cast(sum(coalesce(len(list_filter(string_split(trim(text), ' '),
                                           x -> x <> '')), 0)) as bigint)
           as n_tokens
  from documents group by source),
r as (
  select grp, n_tokens,
         cast(n_tokens as double) * 2.0 as cap,
         row_number() over (order by cast(n_tokens as double) * 2.0 asc,
                            grp asc) as rn,
         count(*) over () as n,
         coalesce(sum(cast(n_tokens as double) * 2.0)
                    over (order by cast(n_tokens as double) * 2.0 asc,
                          grp asc
                          rows between unbounded preceding
                                   and 1 preceding), 0.0) as prefix
  from per),
c as (
  select *,
         cap * cast(n - rn + 1 as double) <= 50000.0 - prefix as capped
  from r),
s as (
  select sum(case when capped then cap else 0.0 end) as sum_capped,
         sum(case when capped then 1 else 0 end) as m,
         max(n) as n
  from c)
select grp as source, n_tokens, cap as cap_tokens,
       case when capped then cap
            else (50000.0 - s.sum_capped) / cast(s.n - s.m as double)
       end as allocated_tokens,
       case when n_tokens > 0
            then (case when capped then cap
                       else (50000.0 - s.sum_capped)
                            / cast(s.n - s.m as double) end)
                 / cast(n_tokens as double)
            else 0.0 end as epochs,
       capped
from c, s
order by source
"""


def q219_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall audit (ext/similarity.ivf_recall_audit, X215):
    recall@10 of the nprobe=2-of-8 IVF search against exact brute
    kNN for 5 query vectors — the ANN member of the audit family
    (the number that justifies an nprobe setting before a 100 TB
    index rollout). One row per query."""
    return similarity.ivf_recall_audit(
        load(spark, sf_dir, "embeddings"),
        query_ids=[200, 201, 202, 203, 204],
        k=10,
        n_centroids=8,
        nprobe=2,
    )


# IVF replay mirrors ORACLE_Q86 (seed centroids vec_id < 8, cosine
# assignment, nprobe probes, per-query rank), truth is the brute-force
# window; recall joins the two top-k sets
ORACLE_Q219 = """
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
      where vec_id in (200, 201, 202, 203, 204)),
truth as (
  select query_id, vec_id from (
    select q.query_id, v.vec_id,
           row_number() over (partition by q.query_id
                              order by list_cosine_similarity(v.vv, q.qv) desc,
                                       v.vec_id) rn
    from v, q where v.vec_id <> q.query_id) where rn <= 10),
probes as (
  select query_id, qv, cid from (
    select q.query_id, q.qv, c.cid,
           row_number() over (partition by q.query_id
                              order by list_cosine_similarity(qv, cv) desc, c.cid) pr
    from q, c) where pr <= 2),
approx as (
  select query_id, vec_id as neighbor_id from (
    select p.query_id, v.vec_id,
           row_number() over (partition by p.query_id
                              order by list_cosine_similarity(v.vv, p.qv) desc,
                                       v.vec_id) rn
    from v join assign a using (vec_id)
           join probes p on a.centroid_id = p.cid
    where v.vec_id <> p.query_id) where rn <= 10)
select t.query_id,
       cast(sum(case when a.neighbor_id is not null then 1 else 0 end)
            as bigint) as n_hits,
       cast(sum(case when a.neighbor_id is not null then 1 else 0 end)
            as double) / count(*) as recall_at_k
from truth t
left join approx a on a.query_id = t.query_id and a.neighbor_id = t.vec_id
group by t.query_id
"""


def q220_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length packing sweep (ext/sampling.packing_efficiency,
    X216): per candidate ctx length, doc-aligned chunk count and
    padding waste vs the cross-doc packing lower bound — one corpus
    scan, a 4-literal stack on the single aggregate row."""
    return sampling.packing_efficiency(load(spark, sf_dir, "documents"))


ORACLE_Q220 = """
with per as (
  select len(list_filter(string_split(trim(text), ' '), x -> x <> '')) as t
  from documents),
a as (
  select cast(count(*) as bigint) as n_docs,
         cast(sum(t) as bigint) as total,
         cast(sum(floor((t + 63) / 64)) as bigint) as ch64,
         cast(sum(floor((t + 127) / 128)) as bigint) as ch128,
         cast(sum(floor((t + 255) / 256)) as bigint) as ch256,
         cast(sum(floor((t + 511) / 512)) as bigint) as ch512
  from per)
select cast(c as bigint) as ctx_len, n_docs, total as total_tokens,
       ch as doc_chunks,
       cast(floor((total + c - 1) / c) as bigint) as min_sequences,
       ch * c - total as pad_tokens,
       cast(ch * c - total as double)
         / cast(greatest(ch * c, 1) as double) as pad_frac,
       cast(ch as double)
         / cast(greatest(floor((total + c - 1) / c), 1) as double) as overhead
from a, (values (64), (128), (256), (512)) l(c),
     lateral (select case c when 64 then ch64 when 128 then ch128
                            when 256 then ch256 else ch512 end as ch) x
"""


def q221_signal_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal-discrimination audit (ext/features.signal_auc, X217):
    exact tie-corrected ROC-AUC of three cheap signals (n_chars,
    n_tokens, stop_ratio) against the quality keep label — rank sums
    via the distributed global_cumsum, doubled ranks in exact
    decimals, one double division per signal. 3 rows."""
    from ..ext import features

    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " +")
    toks = F.filter(toks, lambda x: x != "")
    n = F.size(toks).cast("long")
    stop_arr = F.array(F.lit("the"), F.lit("a"), F.lit("of"))
    stop_cnt = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    stop_ratio = F.when(
        n > 0, stop_cnt.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))
    labeled = d.select(
        "n_chars",
        n.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        (
            (n >= 20) & (n <= 1000) & (stop_ratio < 0.5)
        ).cast("long").alias("keep"),
    )
    return features.signal_auc(
        labeled, "keep", ["n_chars", "n_tokens", "stop_ratio"]
    )


# one AUC block per signal (rank sums over a value-grouped window
# cumsum — ties get average ranks by construction), identical
# arithmetic order to the engine: doubled integer rank sums, one
# double division. NULL-text docs are excluded up front (`n_tokens is
# not null` ⟺ text is not null): the engine's keep label evaluates
# NULL there and signal_auc drops NULL-label rows, whereas a bare
# CASE...ELSE 0 would coerce them to label 0 (ADVICE r13 — same class
# as the r12 ORACLE_Q208/Q209 fix)
ORACLE_Q221 = """
with f as (
  select n_chars,
         len(list_filter(string_split(trim(text), ' '), x -> x <> ''))
           as n_tokens,
         list_filter(string_split(trim(text), ' '), x -> x <> '') as toks
  from documents
  where len(list_filter(string_split(trim(text), ' '), x -> x <> ''))
        is not null),
l as (
  select n_chars, n_tokens,
         case when n_tokens > 0
              then cast(len(list_filter(toks, x -> x in ('the','a','of')))
                        as double) / n_tokens
              else 0.0 end as stop_ratio,
         case when n_tokens >= 20 and n_tokens <= 1000
                   and (case when n_tokens > 0
                        then cast(len(list_filter(toks, x -> x in ('the','a','of')))
                                  as double) / n_tokens
                        else 0.0 end) < 0.5
              then 1 else 0 end as y
  from f),
auc_nc as (
  select 'n_chars' as signal, n_pos, n_neg,
         case when n_pos > 0 and n_neg > 0
              then cast(rs2 - np_h * (np_h + 1) as double)
                   / (2.0 * n_pos * n_neg) end as auc
  from (
    select sum(npos * (2 * (cum - n) + n + 1)) as rs2,
           cast(sum(npos) as bigint) as n_pos,
           cast(sum(n) - sum(npos) as bigint) as n_neg,
           cast(sum(npos) as hugeint) as np_h
    from (
      select n, npos, sum(n) over (order by v rows unbounded preceding) as cum
      from (select n_chars as v, cast(count(*) as hugeint) as n,
                   cast(sum(y) as hugeint) as npos
            from l where n_chars is not null group by n_chars)))),
auc_nt as (
  select 'n_tokens' as signal, n_pos, n_neg,
         case when n_pos > 0 and n_neg > 0
              then cast(rs2 - np_h * (np_h + 1) as double)
                   / (2.0 * n_pos * n_neg) end as auc
  from (
    select sum(npos * (2 * (cum - n) + n + 1)) as rs2,
           cast(sum(npos) as bigint) as n_pos,
           cast(sum(n) - sum(npos) as bigint) as n_neg,
           cast(sum(npos) as hugeint) as np_h
    from (
      select n, npos, sum(n) over (order by v rows unbounded preceding) as cum
      from (select n_tokens as v, cast(count(*) as hugeint) as n,
                   cast(sum(y) as hugeint) as npos
            from l group by n_tokens)))),
auc_sr as (
  select 'stop_ratio' as signal, n_pos, n_neg,
         case when n_pos > 0 and n_neg > 0
              then cast(rs2 - np_h * (np_h + 1) as double)
                   / (2.0 * n_pos * n_neg) end as auc
  from (
    select sum(npos * (2 * (cum - n) + n + 1)) as rs2,
           cast(sum(npos) as bigint) as n_pos,
           cast(sum(n) - sum(npos) as bigint) as n_neg,
           cast(sum(npos) as hugeint) as np_h
    from (
      select n, npos, sum(n) over (order by v rows unbounded preceding) as cum
      from (select stop_ratio as v, cast(count(*) as hugeint) as n,
                   cast(sum(y) as hugeint) as npos
            from l group by stop_ratio))))
select * from auc_nc
union all select * from auc_nt
union all select * from auc_sr
"""

"""Round-14 band, q222-q227: recipe EXECUTION — epoch_recipe's
water-filling allocation (X214) feeding budget_mix (X62) the per-source
token budgets it was designed to execute (X218, VERDICT r13 #5: SURVEY's
X214 row promises the composition; this gate proves it end-to-end) —
plus closed-form per-group embedding diversity (X219, q223: mean
pairwise cosine with NO pair join) and multiplicative-weights domain
reweighting (X220, q224: the DoReMi-shaped mixture update, linear MWU
so the arithmetic replays cross-engine), the deterministic global
training order (X222, q225: global_rank over the hash order) and the
length-bucketed batching padding audit (X223, q226), and global
curriculum staging with exact SQL-ntile semantics and no
single-partition sort (X224, q227).

Same conventions as every band: each gate def returns a DataFrame whose
columns are aliased identically in the DuckDB oracle below it.
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared fixture/session surface


def q222_recipe_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan-then-execute (ext/sampling.recipe_mix, X218): water-fill a
    30k-token budget over sources with a 2-epoch repeat ceiling, then
    admit each source's documents in Knuth-hash order until its
    allocation is spent. At sf0.01 the small sources cap (allocation
    > one epoch -> every doc admitted) while the big ones cut
    mid-stream; at sf0.1 no source caps and every source cuts — both
    composition branches exercise at both gate SFs. Output: one row
    per ADMITTED doc (doc_id, source, n_tokens, cum_tokens)."""
    return sampling.recipe_mix(
        load(spark, sf_dir, "documents"),
        budget_tokens=30_000,
        max_epochs=2.0,
    )


# water-filling CTEs mirror ORACLE_Q218 (budget 30k, ceiling 2.0);
# admission mirrors ORACLE_Q78 with the budget coming from the
# allocation instead of a literal CASE — floor() because the mixer's
# contract is integer budgets, > 0 because zero-allocation sources are
# dropped before the mix (engine: recipe_mix's dict comprehension)
ORACLE_Q222 = """
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
         cap * cast(n - rn + 1 as double) <= 30000.0 - prefix as capped
  from r),
s as (
  select sum(case when capped then cap else 0.0 end) as sum_capped,
         sum(case when capped then 1 else 0 end) as m,
         max(n) as n
  from c),
alloc as (
  select grp as source,
         case when capped then cap
              else (30000.0 - s.sum_capped) / cast(s.n - s.m as double)
         end as allocated
  from c, s),
base as (
  select d.doc_id, d.source,
         cast(coalesce(len(list_filter(string_split(trim(d.text), ' '),
                                       x -> x <> '')), 0) as bigint)
           as n_tokens,
         (d.doc_id * 2654435761) % 10000 as bucket,
         cast(floor(a.allocated) as bigint) as budget
  from documents d join alloc a using (source)
  where a.allocated > 0),
cum as (
  select doc_id, source, n_tokens, budget,
         cast(sum(n_tokens) over (partition by source
                                  order by bucket, doc_id
                                  rows unbounded preceding) as bigint)
           as cum_tokens
  from base)
select doc_id, source, n_tokens, cum_tokens
from cum where cum_tokens <= budget
"""


def q223_diversity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding diversity (ext/similarity.diversity_score,
    X219): mean pairwise cosine of each label's normalized vectors in
    CLOSED FORM — (||sum(v_hat)||^2 - n) / (n(n-1)) — no pair join
    anywhere; the shuffle carries labels x dim decimal aggregates.
    One row per label."""
    return similarity.diversity_score(
        load(spark, sf_dir, "embeddings"), group_col="label"
    ).orderBy("label")


# same fold recipe as ORACLE_Q192 for the norm (list_reduce == Spark's
# sequential F.aggregate), then the engine's 2^-24 integer grid: the
# power-of-two multiply and +0.5 are exact IEEE ops, floor is exact,
# so both engines quantize to the identical integer and every
# cross-row sum is pure integer arithmetic (decimal casts of doubles
# were 1-ulp-unportable — see diversity_score's docstring)
ORACLE_Q223 = """
with e as (select label,
                  list_transform(embedding, x -> cast(x as double)) as v
           from embeddings),
nn as (select label, v,
              sqrt(list_reduce(list_transform(v, x -> x * x),
                               (a, b) -> a + b)) as nrm
       from e),
nz as (select label,
              list_transform(v, x -> cast(floor(x / nrm * 16777216.0 + 0.5)
                                          as bigint)) as vq
       from nn where nrm > 0),
elems as (
  select label, i as pos, vq[i] as q
  from nz, lateral unnest(generate_series(1, len(vq))) t(i)),
sums as (select label, pos, cast(sum(q) as hugeint) as s,
         cast(count(*) as bigint) as n
         from elems group by label, pos),
g as (select label, sum(s * s) as s2, max(n) as n
      from sums group by label)
select label, n as n_vectors,
       case when n > 1
            then (cast(s2 as double) / 281474976710656.0
                  - cast(n as double))
                 / (cast(n as double) * (cast(n as double) - 1.0))
       end as mean_pairwise_cos
from g
order by label
"""


def q224_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MWU domain reweighting (ext/sampling.domain_reweight, X220):
    per-source mean difficulty proxy (chars per token — exact ints,
    one division) min-max normalized, linear multiplicative update at
    eta=0.5 over uniform priors, renormalized. One row per source;
    weights sum to 1."""
    toks = F.split(F.trim(F.col("text")), " +")
    toks = F.filter(toks, lambda x: x != "")
    n_tok = F.greatest(
        F.coalesce(F.size(toks), F.lit(0)), F.lit(1)
    ).cast("double")
    d = load(spark, sf_dir, "documents").select(
        "source",
        (F.col("n_chars").cast("double") / n_tok).alias("loss"),
    )
    return sampling.domain_reweight(
        d, "loss", group_col="source", eta=0.5
    ).orderBy("source")


# identical arithmetic order to the engine: decimal-accumulated loss
# sums, double mean, min-max z, prior * (1 + 0.5*z), decimal-summed
# normalizer, one final division
ORACLE_Q224 = """
with l as (
  select source,
         cast(n_chars as double)
           / cast(greatest(coalesce(
               len(list_filter(string_split(trim(text), ' '),
                               x -> x <> '')), 0), 1) as double) as loss
  from documents),
per as (
  select source, cast(count(*) as bigint) as n_docs,
         cast(sum(cast(loss as decimal(38,12))) as double)
           / cast(count(*) as double) as mean_loss
  from l where loss is not null group by source),
u as (select count(*) as ng, min(mean_loss) as lo, max(mean_loss) as hi
      from per),
s as (
  select source, n_docs, mean_loss,
         1.0 / cast(u.ng as double) as prior_w,
         (1.0 / cast(u.ng as double))
           * (1.0 + 0.5 * (case when u.hi > u.lo
                                then (mean_loss - u.lo) / (u.hi - u.lo)
                                else 0.0 end)) as raw
  from per, u),
t as (select sum(cast(raw as decimal(38,12))) as tot from s)
select source, n_docs, mean_loss, prior_w,
       raw / cast(t.tot as double) as weight
from s, t
order by source
"""


def q225_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training order (ext/sampling.shuffle_order,
    X222): dense 1-based rank over (knuth bucket, id) via global_rank's
    two-phase machinery — reproducible epoch order independent of file
    layout, partition count, or engine. One row per doc."""
    return sampling.shuffle_order(
        load(spark, sf_dir, "documents"), id_col="doc_id", method="knuth"
    )


# the oracle's one window IS the semantics (a global row_number over
# the hash order); the ENGINE side must reproduce it without the
# single-partition sort — that's what global_rank's two-phase
# range/offset machinery is for (plan-guarded)
ORACLE_Q225 = """
select doc_id,
       row_number() over (order by (doc_id * 2654435761) % 10000, doc_id)
         as rank
from documents
"""


def q226_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit (ext/sampling
    .length_bucket_packing, X223): per power-of-two token-length
    bucket, the padding cost of batching at the bucket's max vs the
    corpus max — the dynamic-batching planner's number. One row per
    occupied bucket."""
    return sampling.length_bucket_packing(
        load(spark, sf_dir, "documents")
    ).orderBy("bucket_bits")


# bucket index is the binary-string width (length(bin(n)) ==
# length(conv(n,10,2))) — exact integer/string ops; floor(log2) would
# ride libm and can land on the wrong side of a power of two
ORACLE_Q226 = """
with t as (
  select coalesce(len(list_filter(string_split(trim(text), ' '),
                                  x -> x <> '')), 0) as n
  from documents),
b as (
  select cast(case when n > 0 then length(bin(n)) else 0 end as bigint)
           as bucket_bits,
         n
  from t),
per as (
  select bucket_bits,
         cast(count(*) as bigint) as n_docs,
         cast(sum(n) as bigint) as total_tokens,
         cast(max(n) as bigint) as max_len
  from b group by bucket_bits),
g as (select max(max_len) as gmax from per)
select bucket_bits, n_docs, total_tokens, max_len,
       cast(n_docs * max_len - total_tokens as bigint) as pad_bucket,
       cast(n_docs * g.gmax - total_tokens as bigint) as pad_global,
       case when n_docs * max_len > 0
            then cast(n_docs * max_len - total_tokens as double)
                 / cast(n_docs * max_len as double)
            else 0.0 end as pad_frac_bucket
from per, g
order by bucket_bits
"""


def q227_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global curriculum staging (ext/sampling.curriculum_stages,
    X224): every doc's stage in a 4-stage easy-to-hard schedule by
    n_chars — exact SQL ntile semantics over the global (signal, id)
    order, computed WITHOUT a single-partition sort (two-phase
    global_rank + pure-bigint stage arithmetic). One row per doc."""
    return sampling.curriculum_stages(
        load(spark, sf_dir, "documents"), "n_chars", "doc_id", n_stages=4
    )


# the oracle's single ntile window IS the semantics; the engine must
# reproduce it rank-arithmetically off the two-phase machinery
ORACLE_Q227 = """
select doc_id, n_chars,
       row_number() over (order by n_chars, doc_id) as rank,
       cast(ntile(4) over (order by n_chars, doc_id) as bigint) as stage
from documents
where n_chars is not null
"""

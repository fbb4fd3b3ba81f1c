"""Round-14 composition band, q222: recipe EXECUTION — epoch_recipe's
water-filling allocation (X214) feeding budget_mix (X62) the per-source
token budgets it was designed to execute (X218, VERDICT r13 #5: SURVEY's
X214 row promises the composition; this gate proves it end-to-end).

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
         cast(sum(len(list_filter(string_split(trim(text), ' '),
                                  x -> x <> ''))) as bigint) as n_tokens
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
         cast(len(list_filter(string_split(trim(d.text), ' '),
                              x -> x <> '')) as bigint) as n_tokens,
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

"""Round-15 band, q231-q234: product quantization — the memory side of
the 100 TB ANN stack (IVF prunes WHICH vectors are scanned; PQ shrinks
WHAT is scanned; production indexes compose both). q231 encodes every
vector to M per-subspace codes against the deterministic seed
codebooks (the q23/_default_centroids discipline — pq_train's Lloyd's
refinement is pytest-gated because float means are not cross-engine
bit-portable), q232 runs the asymmetric-distance (ADC) top-k read
path: the query's M x n_codes distance table, summed per vector in
subspace order (an ORDERED fold — a bare double SUM would be
accumulation-order-nondeterministic, the trap the decimal-sum
discipline exists for, solved with ordered folds since these addends
are inherently floating; the squared-L2 fold itself was probed
bit-identical to DuckDB's list_sum on all 500 sf0.01 vectors).

Same conventions as every band: each gate def returns a DataFrame
whose columns are aliased identically in the DuckDB oracle below it;
the shared CTE chain is generated once by _pq_chain.
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared fixture/session surface

_PQ_M = 8
_PQ_CODES = 16
_PQ_SD = 8  # embeddings are 64-dim; 64 / 8 subspaces


def q231_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode (ext/similarity.pq_encode, X229): every vector's
    nearest seed-codebook entry per contiguous 8-dim subspace by
    squared L2 (ordered fold, ties to the lowest code) plus that
    subspace's squared reconstruction error. corpus x M rows."""
    return similarity.pq_encode(
        load(spark, sf_dir, "embeddings"),
        m_subspaces=_PQ_M,
        n_codes=_PQ_CODES,
    )


def q232_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-10 for query vec_id=0 (ext/similarity.pq_adc_topk,
    X230): M table lookups + an ordered per-vector fold — the
    PQ-compressed read path, graded against q22's exact kNN by the
    recall pytest."""
    return similarity.pq_adc_topk(
        load(spark, sf_dir, "embeddings"),
        query_id=0,
        k=10,
        m_subspaces=_PQ_M,
        n_codes=_PQ_CODES,
    )


def _pq_chain() -> str:
    """Shared CTE chain: subvector split (1-based inclusive slices),
    seed codebooks (vec_id < n_codes, the q23 discipline), all
    (vector, subspace, code) squared distances via the same ordered
    list_sum the engine's fold matches bit-for-bit, and the argmin
    window (d2 asc, code asc)."""
    m, nc, sd = _PQ_M, _PQ_CODES, _PQ_SD
    return f"""
with v as (select vec_id, list_transform(embedding, x -> cast(x as double)) as vv
           from embeddings),
sub as (select vec_id, j, vv[j*{sd}+1 : (j+1)*{sd}] as sv
        from v, (select unnest(range(0, {m})) as j)),
cb as (select j, vec_id as code, sv as cv from sub where vec_id < {nc}),
d as (select s.vec_id, s.j, c.code,
        list_sum(list_transform(range(1, {sd + 1}),
                 i -> (s.sv[i]-c.cv[i])*(s.sv[i]-c.cv[i]))) as d2
      from sub s join cb c on s.j = c.j),
r as (select vec_id, j, code, d2,
        row_number() over (partition by vec_id, j
                           order by d2 asc, code asc) as rn
      from d)"""


ORACLE_Q231 = _pq_chain() + """
select vec_id, j as subspace, cast(code as bigint) as code, d2
from r where rn = 1
"""

ORACLE_Q232 = _pq_chain() + """,
q as (select j, code, d2 as qd2 from d where vec_id = 0),
enc as (select vec_id, j, code from r where rn = 1 and vec_id <> 0),
a as (select vec_id, list_sum(list(qd2 order by j)) as approx_d2
      from (select e.vec_id, e.j, q.qd2
            from enc e join q on e.j = q.j and e.code = q.code)
      group by vec_id)
select vec_id as neighbor_id,
       cast(row_number() over (order by approx_d2 asc, vec_id asc)
            as bigint) as rnk,
       approx_d2
from a order by approx_d2, vec_id limit 10
"""


def q233_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed IVF-PQ search (ext/similarity.ivf_pq_topk, X231):
    nprobe=2 of 8 seed clusters by cosine, ADC over the surviving
    codes — top-10 for query vec_id=0."""
    return similarity.ivf_pq_topk(
        load(spark, sf_dir, "embeddings"),
        query_id=0,
        k=10,
        n_centroids=8,
        nprobe=2,
        m_subspaces=_PQ_M,
        n_codes=_PQ_CODES,
    )


ORACLE_Q233 = _pq_chain() + f""",
cents as (select vec_id as cid, vv as cv from v where vec_id < 8),
qv as (select vv as qv from v where vec_id = 0),
asn as (select vec_id, cid from (
    select v.vec_id, c.cid,
           row_number() over (partition by v.vec_id
               order by list_cosine_similarity(v.vv, c.cv) desc,
                        c.cid asc) as rnc
    from v, cents c) where rnc = 1),
probe as (select cid from cents, qv
          order by list_cosine_similarity(cv, qv) desc, cid limit 2),
mem as (select vec_id from asn where cid in (select cid from probe)),
q as (select j, code, d2 as qd2 from d where vec_id = 0),
enc as (select vec_id, j, code from r
        where rn = 1 and vec_id <> 0
          and vec_id in (select vec_id from mem)),
a as (select vec_id, list_sum(list(qd2 order by j)) as approx_d2
      from (select e.vec_id, e.j, q.qd2
            from enc e join q on e.j = q.j and e.code = q.code)
      group by vec_id)
select vec_id as neighbor_id,
       cast(row_number() over (order by approx_d2 asc, vec_id asc)
            as bigint) as rnk,
       approx_d2
from a order by approx_d2, vec_id limit 10
"""


_Q234_QUERIES = [0, 1, 2, 3, 4]


def q234_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ recall audit (ext/similarity.pq_recall_audit, X232):
    recall@10 of the ADC read path vs exact full-vector squared-L2
    top-10 for five queries — the number that justifies an
    (m_subspaces, n_codes) setting before a compressed-index
    rollout."""
    return similarity.pq_recall_audit(
        load(spark, sf_dir, "embeddings"),
        query_ids=_Q234_QUERIES,
        k=10,
        m_subspaces=_PQ_M,
        n_codes=_PQ_CODES,
    )


ORACLE_Q234 = _pq_chain() + f""",
qs as (select vec_id as query_id, vv as qv from v
       where vec_id in ({', '.join(str(i) for i in _Q234_QUERIES)})),
ex as (select query_id, vec_id,
              row_number() over (partition by query_id
                  order by d2x asc, vec_id asc) as rnx
       from (select q.query_id, v.vec_id,
                    list_sum(list_transform(range(1, {_PQ_M * _PQ_SD + 1}),
                        i -> (v.vv[i]-q.qv[i])*(v.vv[i]-q.qv[i]))) as d2x
             from v, qs q where v.vec_id <> q.query_id)),
truth as (select query_id, vec_id from ex where rnx <= 10),
qt as (select q.query_id, d.j, d.code, d.d2 as qd2
       from d join qs q on d.vec_id = q.query_id),
encq as (select vec_id, j, code from r where rn = 1),
ax as (select qt.query_id, e.vec_id,
              list_sum(list(qt.qd2 order by qt.j)) as ad2
       from encq e join qt on e.j = qt.j and e.code = qt.code
       where e.vec_id <> qt.query_id
       group by qt.query_id, e.vec_id),
adc as (select query_id, vec_id from (
        select query_id, vec_id,
               row_number() over (partition by query_id
                   order by ad2 asc, vec_id asc) as rna
        from ax) where rna <= 10),
nt as (select query_id, count(*) as n_truth from truth group by query_id),
nh as (select t.query_id, count(*) as n_hits
       from truth t join adc a
         on t.query_id = a.query_id and t.vec_id = a.vec_id
       group by t.query_id)
select nt.query_id,
       cast(coalesce(nh.n_hits, 0) as bigint) as n_hits,
       cast(coalesce(nh.n_hits, 0) as double)
         / cast(nt.n_truth as double) as recall_at_k
from nt left join nh on nt.query_id = nh.query_id
order by nt.query_id
"""

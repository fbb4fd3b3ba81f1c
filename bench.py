"""Benchmark harness: headline queries + the sync pipeline at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the COLD total: the sum of each query's FIRST sample
(round 16, VERDICT r15 #1). Earlier rounds headlined the sum of warm
medians, but pinned intermediates survive across a query's 3 samples,
so runs 2-3 of any pin-bearing query partially measure cache reads —
~5.5 s of the 74.2 s r15 headline was cross-run reuse, and for a
once-per-run 100 TB pipeline the cold number is the real cost
(BASELINE.md "Cold vs warm"). The warm per-query medians stay in
`queries` (same field, same methodology — round-over-round per-query
comparisons remain valid) and their sum moves to `warm_total`; the
cold per-query samples stay in `first_run`.

Each query runs $SPARK_GRAFT_BENCH_RUNS times (default 3); `queries`
reports the MEDIAN, so the ±6% ambient-load band documented in
BASELINE.md stops reading as per-round regression. The sync stage
also runs 3x.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HEADLINE = [
    # ported surface
    "q01_pricing_summary",
    "q07_index_synthesis",
    "q09_count_compare",
    "q10_checksum",
    "q11_topk_window",
    "q16_shipping_priority",
    "q17_local_supplier",
    # temporal operators over events (nanos-parquet path)
    "q28_asof_join",
    "q29_sessionize",
    # LLM-pipeline extensions (scale paths: LSH, not exact-pairs)
    "q18_dedup_exact",
    "q20_dedup_minhash",
    "q22_knn_cosine",
    "q25_quality_score",
    "q27_fingerprint",
    "q36_simhash_pairs",
    # capstone: full corpus-prep pipeline (lang -> quality -> dedup -> split)
    "q50_corpus_prep",
    # round-4 additions: vocab-join scoring + narrow chunking map
    "q77_rarity_score",
    "q82_chunk_documents",
    # round-4 late additions: two-phase global rank, explode-free BM25,
    # deletion-neighborhood edit-distance join
    "q111_rfm_segments",
    "q118_bm25",
    "q120_editdist_pairs",
    # round-6 additions (VERDICT r5 #6): the dedup-decision capstone
    # (LSH pairs -> connected components -> quality keeper, the heaviest
    # round-5 pipeline) and the global_cumsum percentile merge
    "q159_cluster_keeper",
    "q167_reference_percentile",
    # round-7 addition (VERDICT r6 #7): the semantic-dedup capstone —
    # RP-LSH banded pairs -> connected components -> keeper, the
    # embedding-space twin of q159's lexical pipeline
    "q178_semantic_dedup",
    # round-8 additions: the engine-portable HLL sketch (one register
    # groupBy + finisher) and the dedup-survivorship capstone (pair
    # graph -> components -> per-source cost rollup). Totals grow by
    # two queries vs BENCH_r07 — compare per-query
    "q194_hll_distinct",
    "q195_dedup_survivorship",
    # round-9 addition (VERDICT r8 #1): the composed dedup report —
    # topline + survivorship + histogram + cross-source from ONE LSH
    # discovery + ONE components pass; its median should undercut
    # q159+q195+q196 run separately. Totals grow by one query vs
    # BENCH_r08 — compare per-query
    "q199_dedup_report",
    # round-9 surface growth: the bigram-LM surprisal quality filter
    # (corpus-wide LM train + score in one plan), winnowing
    # fingerprint overlap (ordered k-gram window min + fp self-join),
    # and DSIR target affinity (two LMs from one corpus pass). Totals
    # grow by three more queries vs BENCH_r08 — compare per-query
    "q200_lm_surprisal",
    "q201_winnow_pairs",
    "q202_target_affinity",
    # round-10 additions (VERDICT r9 #2): the nightly-shaped held-out
    # drift monitor (census + frozen-model scoring join) and the
    # cluster-size histogram get recorded numbers; q204 is the new
    # composed winnowing capstone (fingerprint pairs -> one components
    # pass -> keeper + full report in one job). Totals grow by SIX
    # queries vs BENCH_r09 (q196/q203/q204/q205/q206/q207) — compare
    # per-query
    "q196_cluster_size_histogram",
    "q203_lm_drift",
    "q204_winnow_dedup_report",
    # round-10 new operators: exact longest-shared-run pairs (the
    # Lee et al. exact-substring criterion) off winnowing candidates,
    # and the decision half — cut every shared >= 12-token run from
    # the higher-id copy and rebuild the corpus
    "q205_shared_runs",
    "q206_trim_shared_runs",
    # round-10: exact-span decontamination (benchmark = the src0
    # slice; detection exact at >= w+k-1 by the winnow guarantee)
    "q207_decontaminate",
    # round-11: the removal half — cut every contaminated >= 12-token
    # span from the training copy and rebuild the corpus, and the
    # within-doc trim (doc-vs-itself diagonal streaks, zero cross-doc
    # shuffle). Totals grow by TWO queries vs BENCH_r10 — compare
    # per-query
    "q208_decontaminate_trim",
    "q209_self_trim_repeats",
    # round-12: the six new capstones — per-benchmark contamination
    # coverage (X206), leakage-safe cluster split (X207), soft dedup
    # (X208), split-leakage audit (X209), per-doc boilerplate fraction
    # (X210), dedup threshold sweep (X211), per-source cap (X212). Totals grow by SEVEN queries vs BENCH_r11 — compare
    # per-query
    "q210_benchmark_coverage",
    "q211_leakage_safe_split",
    "q212_soft_dedup",
    "q213_split_leakage",
    "q214_boilerplate_score",
    "q215_threshold_sweep",
    "q216_source_cap",
    # round-13 additions: the filter attrition waterfall (one codegen
    # map + one agg), the token-budget epoch recipe (per-source agg +
    # few-row window), the IVF recall audit (two corpus passes), and
    # the packing-efficiency sweep (one scan into one agg row), and
    # the signal-AUC audit (three value-groupBys + global_cumsum).
    # Totals grow by FIVE queries vs BENCH_r12 — compare per-query or
    # via baseline16_sum
    "q217_filter_attrition",
    "q218_epoch_recipe",
    "q219_ivf_recall",
    "q220_packing_efficiency",
    "q221_signal_auc",
    # round-14 additions: recipe execution (plan + Knuth admission,
    # two scans by construction), closed-form embedding diversity
    # (one scan, groups x dim shuffle), MWU domain reweight (one scan
    # into a pinned domains-sized agg), deterministic training order
    # (two-phase global rank), and the length-bucket padding audit
    # (one scan into a pinned <=64-row agg). Totals grow by FIVE
    # queries vs BENCH_r13 — compare per-query or via baseline16_sum
    "q222_recipe_mix",
    "q223_diversity_score",
    "q224_domain_reweight",
    "q225_shuffle_order",
    "q226_length_buckets",
    "q227_curriculum_stages",
    # round-15 additions: the full BPE trainer loop (ONE corpus scan
    # into the checkpointed vocabulary, then 6 vocab-sized argmax-merge
    # iterations), the composed curriculum loader order (two two-phase
    # global ranks + arithmetic stage_rank), and the BPE apply half
    # (train + ONE narrow chained-replace segmentation pass), plus the
    # PQ pair: seed-codebook encode (broadcast join + partitioned
    # argmin window) and the ADC top-k read path (broadcast distance
    # table + ordered per-vector fold), the composed IVF-PQ search
    # (probe-pruned ADC), and the PQ recall audit (exact L2 top-k vs
    # ADC, pinned one-scan input). Totals grow by SEVEN queries vs
    # BENCH_r14 — compare per-query or via baseline16_sum
    "q228_bpe_train",
    "q229_curriculum_order",
    "q230_bpe_segment",
    "q231_pq_encode",
    "q232_pq_adc",
    "q233_ivf_pq",
    "q234_pq_recall",
]

# The original BENCH_r03 subset (16 queries + sync): their sum is
# directly comparable to the 22.576 s driver anchor and to every prior
# round regardless of how much the headline list has grown since —
# the bench JSON carries it as `baseline16_sum` (VERDICT r12 #3) so a
# load-adjudicating reader never has to reconstruct the subset by hand.
BASELINE16 = [
    "q01_pricing_summary", "q07_index_synthesis", "q09_count_compare",
    "q10_checksum", "q11_topk_window", "q16_shipping_priority",
    "q17_local_supplier", "q28_asof_join", "q29_sessionize",
    "q18_dedup_exact", "q20_dedup_minhash", "q22_knn_cosine",
    "q25_quality_score", "q27_fingerprint", "q36_simhash_pairs",
    "q50_corpus_prep", "sync_lineitem_orders",
]


def _calibration(spark, runs: int = 3) -> float:
    """Fixed all-core reference measurement (VERDICT r6 #2): the median
    wall time of a constant JVM-side workload (sum over range(5e8),
    whole-stage codegen, no I/O). Ambient driver-machine load shows up
    here exactly as it does in the query times, so round-over-round
    comparisons can normalize by the calibration ratio instead of
    hand-diagnosing "probably load" from uniform drift."""
    samples = []
    for _ in range(runs):
        t0 = time.time()
        spark.range(500_000_000).selectExpr("sum(id) AS s").collect()
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 3)


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="bench.py")
    ap.add_argument(
        "--out",
        default=None,
        metavar="PATH",
        help="also write the JSON payload to PATH. The committed "
        "self-record convention is ONE NEW FILE PER ROUND "
        "(BENCH_SELF_r{N}.json, VERDICT r15 #2 — the single-slot "
        "BENCH_SELF.json lost the r14 record forever when r15 "
        "refreshed it); never overwrite a prior round's snapshot. "
        "Default: stdout only — VERDICT r14 #1: the old unconditional "
        "write meant every driver bench run clobbered the committed "
        "clean record with whatever load happened to be ambient.",
    )
    args = ap.parse_args(argv)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from sparksync.queries import QUERIES
    from sparksync.session import get_spark
    from sparksync.sync import SyncJob

    spark = get_spark("sparksync-bench")
    spark.sparkContext.setLogLevel("ERROR")

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    times: dict[str, float] = {}
    first_runs: dict[str, float] = {}
    # warm the JVM/session on the smallest SF so startup cost isn't
    # attributed to the first query
    QUERIES["q09_count_compare"](spark, "/root/testdata/sf0.001").collect()
    load_before = os.getloadavg()
    calibration = _calibration(spark)

    for name in HEADLINE:
        samples = []
        for _ in range(runs):
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            # noop-format write, NOT .count(): count lets Catalyst prune
            # unused projections, so narrow-map queries would be timed at
            # scan+count cost instead of the cost of computing their
            # advertised output columns (VERDICT r3 #2). The noop sink
            # materializes every output column and discards the bytes.
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        n = QUERIES[name](spark, sf_dir).count()  # untimed, reporting only
        times[name] = round(statistics.median(samples), 3)
        # cold-vs-warm split (VERDICT r8 #5): the first sample pays
        # persist/pin materialization that the median excludes — for a
        # once-per-run 100 TB pipeline the COLD number is the real
        # cost, so regressions there must stay visible
        first_runs[name] = round(samples[0], 3)
        print(
            f"# {name}: median {times[name]}s of "
            f"{[round(s, 3) for s in samples]} ({n} rows)",
            file=sys.stderr,
        )

    # end-to-end sync + checksum compare of the two biggest tables —
    # the reference's own workload shape (EP1 + EP2)
    out = "/tmp/sparksync_bench_out"
    # untimed warmup at the smallest SF: the first sync in a session pays
    # one-time parquet-writer/codegen init (~6 s measured) that would
    # otherwise dominate a 3-sample median
    warm = SyncJob(
        spark,
        "/root/testdata/sf0.001",
        out + "_warm",
        max_parallel=4,
        exclude=[
            "region", "nation", "customer", "supplier", "part",
            "documents", "embeddings", "events",
        ],
    )
    wt = warm.plan()
    warm.data_phase(wt)
    warm.compare_phase(wt, checksum=True)
    samples = []
    for _ in range(runs):
        t0 = time.time()
        job = SyncJob(
            spark,
            sf_dir,
            out,
            max_parallel=4,
            exclude=[
                "region", "nation", "customer", "supplier", "part",
                "documents", "embeddings", "events",
            ],
        )
        tables = job.plan()
        job.data_phase(tables)
        results = job.compare_phase(tables, checksum=True)
        assert all(r.is_ok for r in results), [r.table for r in results if not r.is_ok]
        samples.append(time.time() - t0)
    times["sync_lineitem_orders"] = round(statistics.median(samples), 3)
    first_runs["sync_lineitem_orders"] = round(samples[0], 3)
    print(
        f"# sync_lineitem_orders: median {times['sync_lineitem_orders']}s of "
        f"{[round(s, 3) for s in samples]}",
        file=sys.stderr,
    )

    # COLD headline (round 16, VERDICT r15 #1): the sum of first
    # samples. Warm medians' sum is kept as `warm_total` — the r15
    # headline (74.196 s) compares against THAT field, and the r15
    # `first_run` sum (113.30 s) against `value`.
    total = round(sum(first_runs.values()), 3)
    payload = json.dumps(
        {
            "metric": "headline_queries_plus_sync_wall",
            "value": total,
            "unit": "sec",
            "headline_is_cold_first_run_sum": True,
            "warm_total": round(sum(times.values()), 3),
            "queries": times,
            # first (cold) sample per query, next to the median:
            # pin/persist materialization runs 3-5x the warm
            # median on q20/q36-class queries (BASELINE.md)
            "first_run": first_runs,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            # load sentinel (VERDICT r6 #2): 1/5/15-min loadavg
            # sampled before and after the run, plus a fixed
            # calibration measurement. To compare rounds, divide
            # each round's times by its calibration ratio vs the
            # baseline round's calibration (protocol in BASELINE.md).
            "loadavg_before": [round(x, 2) for x in load_before],
            "loadavg_after": [round(x, 2) for x in os.getloadavg()],
            "calibration_range_sum_sec": calibration,
            # self-labeling (VERDICT r13 #4): records taken under
            # ambient load flag THEMSELVES so every future reader can
            # discount mechanically — the r12/r13 protocol observation
            # is that calibration >= ~0.3 reads medians ~2x the idle
            # floor (idle runs measure 0.19-0.21)
            "contamination_threshold": 0.25,
            "contaminated": calibration > 0.25,
            # fixed-subset anchor (VERDICT r12 #3): sum of the original
            # BENCH_r03 16-query+sync medians — compare directly to the
            # 22.576 s r03 driver record and across rounds; divide by
            # the calibration ratio to normalize ambient load
            "baseline16_sum": round(
                sum(times[k] for k in BASELINE16 if k in times), 3
            ),
            # the cold twin of the anchor subset (round 16): sums the
            # same 16+sync queries' FIRST samples, for cold-vs-cold
            # round comparisons under the new headline
            "baseline16_cold_sum": round(
                sum(first_runs[k] for k in BASELINE16 if k in first_runs), 3
            ),
        }
    )
    # VERDICT r10 #4 wanted a complete parseable record next to the
    # clipped stdout tail; VERDICT r14 #1 found the unconditional write
    # clobbered the committed clean self-record on every driver run.
    # Resolution: the stdout line stays the driver's contract, and the
    # file copy is opt-in via --out (BASELINE.md protocol paragraph).
    if args.out:
        try:
            with open(args.out, "w") as fh:
                fh.write(payload + "\n")
        except OSError as e:
            print(f"# {args.out} not written: {e}", file=sys.stderr)
    print(payload, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

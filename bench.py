"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full execution with the ``noop`` datasource sink
(df.write.format("noop")) so timing covers scan→shuffle→agg on the
executors, not driver-side collect serialization. One warm-up query runs
first so JVM/codegen startup is excluded from per-query numbers.

Usage: python bench.py [--sf DIR] [--runs N] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jubilant_garbanzo_spark.queries import load_all  # noqa: E402
from jubilant_garbanzo_spark.session import get_spark  # noqa: E402

#: The headline set: the flagship, the TPC-H-style relational core, the
#: heaviest join/agg/window shapes, and the LLM-pipeline ops that matter
#: at 100 TB (dedup, ANN, token stats). Kept to ~1/5 of the registry so
#: the driver's per-round bench stays fast while covering every engine
#: subsystem.
HEADLINE: tuple[str, ...] = (
    "trending_topk",  # flagship: windowed top-K over events
    "tpch_q1_pricing_summary",  # full-scan agg
    "tpch_q3_shipping_priority",  # 3-way join + agg + topk
    "tpch_q5_local_supplier_volume",  # 6-way star join
    "tpch_q6_forecast_revenue",  # pushdown filter + sum
    "tpch_q18_large_volume_customers",  # having + semi-style join
    "join_broadcast_star",  # broadcast dims
    "join_bucketed_colocated",  # shuffle-free fact join (write amortized)
    "join_asof",  # window-function as-of join
    "agg_rollup",  # multi-level agg
    "window_topn_per_group",  # partitioned ranking
    "dedup_exact_by_fingerprint",  # hash-groupBy dedup
    "dedup_minhash_lsh",  # shingle→minhash→band join
    "embed_cosine_topk",  # brute-force ANN baseline
    "embed_ann_ivf",  # IVF-pruned ANN
    "text_term_frequency",  # tokenize+explode+count
    "stream_sliding_window",  # availableNow streaming twin
    # Round-2 additions (VERDICT: cover the heavy previously-unbenched
    # queries so the cross-round comparison sees them).
    "tpch_q7_nation_volume",  # 6-way join + disjunctive nation pair filter
    "tpch_q19_disjunctive",  # OR-of-ANDs pushdown join
    "text_tfidf_top_terms",  # two-level agg + broadcast scalar + window
    # Round-5 additions (VERDICT r4 item 2: the two heaviest registry
    # queries had no regression protection, plus cheap representatives
    # of the round-4 families).
    "dedup_cluster_cc",  # LSH pairs + iterative connected components
    "dedup_ngram_jaccard",  # exact PPJoin prefix-filtered all-pairs
    "embed_knn_join",  # broadcast batch k-NN join
    # Round-5 additions: the heaviest new families (iterative graph
    # fixpoint; hour-blocked interval join).
    "graph_pagerank",  # 5-iteration integer PageRank + edge derivation
    "join_interval_overlap",  # session overlap via hour-bucket blocking
    "fuzzy_name_match",  # blocked edit-distance entity resolution
    "agg_countmin_heavy_hitters",  # r5 wave-2: from-scratch CMS sketch
    "graph_bfs_hops",  # r5 wave-2: iterative frontier propagation
    # Round-6 additions (VERDICT r5 item 4): the heaviest of the six
    # derived-partsupp TPC-H queries — q9's full 6-table join tree and
    # q21's semi/anti-join pair over three lineitem passes.
    "tpch_q9_product_profit",
    "tpch_q21_suppliers_kept_waiting",
    # Round-6 wave-3 additions: the heaviest new operators — the
    # iterative k-means loop, the LPA community rounds over the derived
    # trade graph, the basket self-join, and the bloom-prefiltered semi
    # join (regression-protects the broadcast-chain plan).
    "embed_kmeans_lloyd",
    "graph_label_propagation",
    "assoc_copurchase_lift",
    "join_bloom_prefilter",
    # Round-6 wave-5 addition: the heaviest new operator — cluster-scoped
    # semantic dedup (adaptive-k Lloyd + within-cluster cosine pairs).
    "dedup_semantic_clusters",
    # Round-6 wave-6 addition: the heaviest late operator — cascading
    # k-core peeling over the derived trade graph.
    "graph_kcore",
    # Round-10 additions (VERDICT r9 #7): the round-9 heavies join the
    # headline set — the BPE training loop, the sparse TF-IDF posting
    # join, the full IVFADC residual search, and the BPE apply path.
    "text_bpe_train",
    "text_sparse_tfidf_cosine",
    "embed_ann_ivfpq",
    "text_bpe_tokenize",
    # round-10 heavies join per the same rule — the suffix-array pair
    # (shared rank index: build paid once per session, steady-state
    # medians), span-corruption target prep, and incremental cluster
    # maintenance.
    "text_suffix_array",
    "text_longest_dup_substring",
    "text_span_corruption",
    "dedup_cluster_incremental",
    # Round-11 additions per the heaviest-member policy: the four new
    # operators — EXACTSUBSTR span removal (shares the session
    # suffix-rank index at rounds=3), perceptual-hash image dedup,
    # unigram-LM Viterbi apply, and the deterministic global shuffle.
    "dedup_exactsubstr_removal",
    "multimodal_phash_dedup",
    "text_unigram_tokenize",
    "pipeline_global_shuffle",
    # Round-11 stretch heavies: hybrid RRF fusion (BM25 + cosine arms)
    # and CCNet per-segment perplexity bucketing.
    "retrieval_rrf_fusion",
    "text_ccnet_bucket_filter",
    # Round-11 late-wave heavies per the same rule: exact-integer PCA
    # power iteration (the corpus-sized outer-product aggregate),
    # recursive-CTE reachability (Spark 4 UnionLoop), and the
    # unigram-LM Viterbi-EM training loop (three DP sweeps).
    "embed_pca_power_iteration",
    "sql_recursive_cte_reachability",
    "text_unigram_train",
    # Round-12 additions: the new WordPiece apply + likelihood-scored
    # training join their sibling tokenizer entries (BPE apply/train,
    # unigram apply/train) already in the set.
    "text_wordpiece_tokenize",
    "text_wordpiece_train",
)


#: Canary-normalized reporting (VERDICT r12 #3): the committed
#: median-of-3 rows for three queries whose code is essentially never
#: touched round-to-round, taken from BASELINE.md's latest "committed
#: headline baseline" section (round 16 tree, sf0.1). The driver's box
#: carries a 1.1-1.5× ambient load factor some rounds (BENCH_r12: 98.4 s
#: driver vs 64.6 s committed on the IDENTICAL tree, canaries inflated
#: 1.3-2.5×); dividing the run's canary medians by these rows yields an
#: inflation estimate that separates host load from real regressions.
#: Update these whenever the committed baseline is re-recorded.
#: RE-BASED round 16 (VERDICT r15 #1a): the r13 rows were recorded on
#: faster hardware — this box reads canary inflation 1.6-2.2 against
#: them at ZERO ambient load (tpch_q6 0.94 s vs the 0.24 s ref with a
#: 0.12 s spread on an idle box), so every inflation estimate measured
#: hardware drift, not load. The rows below are the round-16 closing
#: bench on THIS box (BASELINE.md "Round-16 committed headline
#: baseline" keeps the old rows in the history). Note the box's idle
#: performance itself swings ~1.4× between sessions (two idle-box
#: runs 7 h apart read q6 at 0.94 s and 0.40 s), so inflation is an
#: order-of-magnitude load signal, never a precise divisor — the
#: adjudicable cross-round instrument is scripts/ab_round.py.
CANARY_REF: dict[str, float] = {
    "trending_topk": 0.939,
    "tpch_q1_pricing_summary": 1.366,
    "tpch_q6_forecast_revenue": 0.396,
}
#: The scale factor the canary rows were committed at — ratios against
#: a different SF would measure data volume, not host load.
CANARY_REF_SF = 0.1


def canary_inflation(timings: dict[str, float], sf: float | None):
    """Median measured/committed ratio over the canaries present in
    ``timings`` — an ambient host-load estimate for this run. Returns
    ``(inflation, per_canary_ratios)`` or ``(None, {})`` when the run
    doesn't cover the canaries at the committed SF."""
    if sf != CANARY_REF_SF:
        return None, {}
    ratios = {
        n: round(timings[n] / ref, 3)
        for n, ref in CANARY_REF.items()
        if n in timings
    }
    if len(ratios) < len(CANARY_REF):  # partial runs can't adjudicate
        return None, {}
    vals = sorted(ratios.values())
    mid = len(vals) // 2
    med = vals[mid] if len(vals) % 2 else (vals[mid - 1] + vals[mid]) / 2
    return round(med, 3), ratios


def run_one(spark, spec, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = spec.fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    # median-of-3 by default: round-3 showed best-of-2 leaves ±0.3-0.5s
    # box noise per query, large enough to fake ±30% "regressions" on
    # untouched sub-second queries across rounds (VERDICT r3 "What's
    # wrong" #3). The median of three post-warm-up runs is stable to
    # ~±0.1s; the extra pass costs ~20s at sf0.1.
    ap.add_argument("--runs", type=int, default=3)
    # Where the full payload lands. The default is the committed artifact
    # next to this script (what the driver and BASELINE.md reference);
    # tests point it at a tmp path so an end-to-end format check can't
    # clobber the committed numbers.
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_out.json"
        ),
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    specs = load_all()
    names = args.names or [n for n in HEADLINE if n in specs]
    spark = get_spark("bench")

    # Warm-up: JVM classloading + codegen compile, excluded from timings.
    specs["trending_topk"].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    first_runs: dict[str, float] = {}
    for name in names:
        raw = [run_one(spark, specs[name], args.sf) for _ in range(args.runs)]
        # Run-1 wall in arrival order (VERDICT r15 #7): the queries that
        # share a session-scoped index (minhash pairs, suffix ranks) pay
        # the build on their first run only, so the median alone hides
        # that cold cost. Reported ALONGSIDE the median — the timed
        # methodology and the authoritative per-query stat are unchanged.
        first_runs[name] = round(raw[0], 3)
        runs = sorted(raw)
        med = runs[len(runs) // 2] if args.runs % 2 else sum(
            runs[len(runs) // 2 - 1 : len(runs) // 2 + 1]
        ) / 2
        timings[name] = round(med, 3)
        # Per-query noise band (max-min across runs): a cross-round
        # delta smaller than this band is box noise, not a regression.
        spreads[name] = round(runs[-1] - runs[0], 3)
        print(f"# {name}: {med:.2f}s (spread {spreads[name]:.2f}s)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(args.sf.rstrip("/")).replace("sf", "")
    # Label must match the statistic actually computed: odd runs → true
    # median; even runs → midpoint of the two middle values; one run →
    # a single measurement (warmed only by the trending_topk warm-up,
    # so other queries still pay first-run codegen — don't compare
    # runs=1 numbers across rounds).
    method = (
        "single-run"
        if args.runs == 1
        else f"median-of-{args.runs}"
        if args.runs % 2
        else f"midpoint-of-{args.runs}"
    )
    sf_val = float(sf) if sf else None
    inflation, canary_ratios = canary_inflation(timings, sf_val)
    payload = {"metric": "headline_total_wall", "value": total}
    if inflation is not None:
        # Self-adjudicating host-load record (VERDICT r12 #3): raw total
        # stays authoritative; the normalized twin says what the same
        # run would read on the baseline-recording box. A real
        # regression moves value_canary_normalized; ambient load on the
        # measuring box moves only canary_inflation. Placed BEFORE the
        # per-query dict so a truncated stdout tail still carries the
        # adjudication scalars.
        payload["value_canary_normalized"] = round(total / inflation, 3)
        payload["canary_inflation"] = inflation
        payload["canary_ratios"] = canary_ratios
    payload.update(
        {
            "unit": "sec",
            "queries": timings,
            "noise_band": spreads,
            "first_run_wall": first_runs,
            "method": method,
            "sf": sf_val,
        }
    )
    # The driver records a bounded stdout TAIL; round 6's single pretty
    # JSON line (with the noise-band twin dict) outgrew the window and
    # the recorded artifact lost its head (VERDICT r6 "What's wrong" #1).
    # Defense in depth, in tail-survival order:
    #   1. full payload → bench_out.json (readable whole, committed);
    #   2. noise-band on its OWN earlier line (sacrificial if truncated);
    #   3. LAST line = compact summary (no spaces, total before the
    #      per-query dict) so the parseable JSON always fits the tail.
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({"metric": "noise_band", "bands": spreads,
                      "first_run_wall": first_runs,
                      "method": method}, separators=(",", ":")))
    # first_run_wall rides the sacrificial line + bench_out.json only:
    # the LAST line must stay small enough to always fit the driver's
    # bounded stdout tail.
    compact = {k: v for k, v in payload.items()
               if k not in ("noise_band", "first_run_wall")}
    print(json.dumps(compact, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    sys.exit(main())

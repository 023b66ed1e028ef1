"""Standing oracle division audit (VERDICT r12 #6, round 13).

The class this guards: an oracle that divides by an expression which
can be ZERO on some legal input, and passes today only because the
installed DuckDB (1.0.0) defines x/0 = NULL for EVERY numeric type —
the same answer Spark's non-ANSI division gives. Newer DuckDB builds
flip float division to IEEE semantics (1.0/0.0 = inf), so such an
oracle is silently DuckDB-VERSION-dependent: nothing fails here, and a
rerun on another box diverges. ``profile_ks_two_sample`` (round 12)
was the first confirmed member; this sweep adjudicates the whole
registry so the class can't regrow unnoticed.

Mechanics: extract every ``/`` division in every oracle whose divisor
is NOT a pure numeric literal, then require the query to appear in
:data:`ADJUDICATIONS` with a stated reason the division is safe
(explicit CASE/NULLIF/WHERE guard, divisor provably nonzero by
construction, NULL numerator dominating, or a parser false positive on
a string literal). A query with non-literal divisors and no
adjudication FAILS the audit — forcing every new oracle's divisions
through this review.

Usage: PYTHONPATH=. python scripts/audit_divzero.py [-v]
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from jubilant_garbanzo_spark.queries import load_all  # noqa: E402

#: Pure numeric literal (possibly parenthesized / signed / scientific).
_LITERAL = re.compile(r"^\s*\(?\s*-?\d+(\.\d+)?(e[+-]?\d+)?\s*\)?\s*$", re.I)

# Shorthand reasons, composed per query below.
GUARDED = "explicit CASE WHEN / NULLIF / WHERE guard around the division"
GROUP_COUNT = (
    "divisor is a per-group count(*) or group size — a group only "
    "exists with >= 1 row"
)
SIZE_GE_1 = (
    "divisor is a set/array/token size that is >= 1 by construction "
    "(shingles() falls back to [text]; string_split never returns [])"
)
UNION_GE_1 = (
    "divisor is |A|+|B|-|A∩B| >= max(|A|,|B|) >= 1 over non-empty "
    "shingle sets (NULL-text docs are dropped upstream)"
)
SHIFTED = "divisor is shifted by a positive constant (x + c, c > 0)"
CONSTANT_DOMAIN = (
    "divisor ranges over a fixed nonzero domain (digits 1-9, ln(10), "
    "1+exp(x) >= 1, band/window constants)"
)
NULL_NUMERATOR = (
    "a zero divisor forces a NULL numerator over the same rows, and "
    "NULL/x is NULL under BOTH DuckDB semantics generations"
)
STRING_SLASH = "parser false positive: the '/' sits inside a string literal"

#: query -> (reason, detail). Every query the extractor flags must
#: appear here. When ADDING an oracle with a new non-literal division,
#: either guard it explicitly or justify it below — 'it passes the
#: driver today' is exactly the evidence this audit rejects.
ADJUDICATIONS: dict[str, str] = {
    # --- explicitly guarded (CASE WHEN / NULLIF / WHERE) -------------
    "agg_welch_ttest": GUARDED + " (round-12 constant audit)",
    "agg_regression_exact_moments": GUARDED + " (round-12 single-row audit)",
    "text_heaps_law": GUARDED + " (round-12)",
    "anomaly_zscore_outliers": GUARDED + " (NULLIF(stddev, 0))",
    "embed_quantize_int8": GUARDED + " (CASE WHEN mx = 0, zero vector)",
    "event_spike_detection": GUARDED + " (WHERE n >= 12 AND variance > 0)",
    "sample_weighted_priority": GUARDED + " (WHERE o_totalprice > 0, both engines)",
    "profile_ks_two_sample": GUARDED + " (round-12 zero-divisor fix)",
    "agg_skewness_kurtosis": GUARDED + " (round-13: CASE on zero variance)",
    "text_zipf_slope": GUARDED + " (round-13: CASE on singular fit)",
    "text_quality_calibration": GUARDED + " (round-13: CASE on singular 2x2 solve)",
    "text_robust_scale": "greatest(q3 - q1, 1) floors the IQR at 1",
    "agg_groupby_basic": GROUP_COUNT,
    "tpch_q1_pricing_summary": GROUP_COUNT,
    "tpch_q17_small_quantity_revenue": GROUP_COUNT,
    "tpch_q22_global_sales_opportunity": GROUP_COUNT,
    "window_running_frames": GROUP_COUNT + " (frame includes CURRENT ROW)",
    "text_vocab_oov": GROUP_COUNT,
    "timeseries_seasonal_decompose": GROUP_COUNT,
    "text_unigram_logprob": GROUP_COUNT
    + "; n_uni is the corpus token total, >= 1 when any doc groups",
    "multimodal_feature_extract": GROUP_COUNT,
    "event_markov_transitions": GROUP_COUNT + " (t.total sums group counts)",
    "graph_degree_distribution": GROUP_COUNT + " (t.nn counts nodes)",
    "assoc_copurchase_lift": GROUP_COUNT + " (item counts from groupBy)",
    "agg_gini_concentration": GROUP_COUNT
    + "; tot > 0 enforced by the revenue-positive filter",
    "agg_pareto_share": GROUP_COUNT + " (m.tot sums positive revenue)",
    "text_langid_eval": GROUP_COUNT + " (per-language partition count)",
    "profile_key_skew": GROUP_COUNT + " (sum over () of per-key counts)",
    "profile_length_histogram": GROUP_COUNT + " (sum over () of bucket counts)",
    "pipeline_temperature_mixture": "t.z sums pow(share, 1/T) > 0 terms",
    "sql_group_by_all_lateral_alias": GROUP_COUNT + " (n_events lateral alias)",
    "pandas_grouped_agg_seam": "trimmed-count >= 1: rn > n//10 AND "
    "rn <= n - n//10 keeps >= 1 row for every n >= 1",
    "text_bpe_fertility": GROUP_COUNT + " (sum of word counts >= 1)",
    "text_duplicated_ngram_coverage": GROUP_COUNT
    + " (sum(d.m) counts a doc's n-grams, present only for docs with rows)",
    "text_bigram_avg_nll": GROUP_COUNT
    + "; add-1 smoothing: c1.n1 + vsize >= 1",
    "text_ccnet_bucket_filter": GROUP_COUNT
    + "; add-1 smoothing + per-segment bigram count >= 1 via WHERE",
    "text_kneser_ney_nll": "4 * n1 * tt: continuation totals >= 1 on any "
    "corpus with >= 1 bigram; docs without bigrams are excluded upstream",
    "text_unigram_train": SHIFTED + " (tot + nv, nv = vocab size >= 1)",
    "timeseries_time_weighted_avg": "span_s > 0: WHERE clause keeps only "
    "users with >= 2 distinct timestamps",
    "timeseries_linear_interpolate": "d1n - d0n >= 1: bracketing days are "
    "DISTINCT by construction; n0/n1 are per-day counts >= 1",
    "dedup_shingle_containment": SIZE_GE_1 + " (x.n = containee set size)",
    "text_ngram_novelty": SIZE_GE_1 + " (t.n_shingles)",
    "quality_repetition_filter": SIZE_GE_1 + " (n_tok, len(g2) per doc)",
    "text_stats": SIZE_GE_1,
    "text_quality_score": SIZE_GE_1,
    "embed_label_centroids": GROUP_COUNT + " (per-label vector counts)",
    # --- jaccard family: union >= 1 ----------------------------------
    "dedup_minhash_lsh": UNION_GE_1,
    "dedup_minhash_accuracy": UNION_GE_1 + "; /32 is a constant",
    "dedup_cluster_cc": UNION_GE_1,
    "dedup_cluster_keep_best": UNION_GE_1,
    "dedup_cluster_incremental": UNION_GE_1,
    "dedup_ngram_jaccard": UNION_GE_1,
    # --- +constant shifts ---------------------------------------------
    "text_tfidf_top_terms": SHIFTED + " (df + 1.0)",
    "text_dsir_resample": SHIFTED + " (tot + 64 hash buckets)",
    "profile_psi_drift": SHIFTED + " (n + 6.0, c + 0.5 Laplace smoothing)",
    "text_bm25_rank": SHIFTED
    + " (df + 0.5, k1*(...) + tf with tf >= 1, sum_dl/n_docs per-group)",
    "retrieval_rrf_fusion": SHIFTED + " (same BM25 arm as text_bm25_rank)",
    "text_bigram_pmi": GROUP_COUNT + " (n_big, unigram counts >= 1)",
    "text_chi2_terms": SHIFTED
    + " (contingency margins (a+b),(c+d),(a+c),(b+d) >= 1 per emitted term)",
    "text_sparse_tfidf_cosine": "df >= 1 per posted term; sqrt(nn) > 0 — "
    "a doc posts only terms it contains, so its norm has >= 1 positive term",
    # --- fixed nonzero domains ----------------------------------------
    "quality_benford_digits": CONSTANT_DOMAIN + " (digits 1-9, ln(10))",
    "text_quality_classifier": CONSTANT_DOMAIN + " (1 + exp(x)); "
    + SIZE_GE_1 + " (n_tokens)",
    "agg_cramers_v": GROUP_COUNT + " (m.n totals the grid; a 1x1 grid is "
    "CASE-guarded since round 12)",
    "agg_mutual_information": GROUP_COUNT + " (m.n, t.ct, h.ch grid margins)",
    # --- NULL numerator dominates --------------------------------------
    "timeseries_backtest_seasonal_naive": NULL_NUMERATOR
    + " (count(forecast_cents) = 0 forces sum(|err|) = NULL)",
    "text_gopher_rules": NULL_NUMERATOR
    + " (n_docs = 0 only on an empty gradeable corpus, where every "
    "sum(CASE...) numerator is NULL); n_docs >= 1 otherwise",
    "tpch_q8_market_share": "denominator sums strictly positive revenue "
    "terms — zero rows make it NULL (x/NULL = NULL both engines), "
    "never 0",
    "tpch_q14_promo_revenue": "same positive-revenue-sum shape as q8: "
    "NULL on empty match set, nonzero otherwise",
    "sample_bootstrap_means": GUARDED
    + " (CASE WHEN sum(w) = 0, round-12 ANSI guard)",
    # --- scaled-int / domain-bounded ------------------------------------
    "stream_kmv_bottomk": "kth.hk is the k-th smallest 60-bit hash; hk = 0 "
    "needs an exact zero hash (p ~ k/2^60) — adjudicated safe by domain; "
    "Spark divides by the same value so both engines share the event",
    # --- parser false positives (slash inside a string literal) --------
    "conditional_try_functions": STRING_SLASH
    + "; the real divisions are try_divide twins guarded on both engines",
    # --- round 14: the '%' / '//' extension (ANSI mod/int-div by zero
    # --- throws exactly like '/'; the derived partsupp was the find) ---
    "tpch_q2_min_cost_supplier": "zero-supplier CASE + greatest(sc.s, 1) "
    "floor, BOTH engines (shared _PS_SUPPKEY/_PS_SUPPKEY_SQL constants, "
    "round 14)",
    "tpch_q9_product_profit": "same partsupp zero-supplier guard (round 14)",
    "tpch_q11_important_stock": "same partsupp zero-supplier guard "
    "(round 14)",
    "tpch_q16_parts_supplier_relation": "same partsupp zero-supplier "
    "guard (round 14)",
    "tpch_q20_potential_promotion": "same partsupp zero-supplier guard "
    "(round 14)",
    "dedup_embedding_cosine": "divisor 1 << (24 - bits) is a power of two "
    ">= 1 (the adaptive-bits clamp keeps bits <= 24)",
    "embed_ann_lsh": "divisor 1 << (24 - bits), power of two >= 1",
    "embed_similarity_join": "divisor 1 << (24 - bits), power of two >= 1",
    "dedup_semantic_clusters": GROUP_COUNT + " (2 * per-cluster count)",
    "embed_kmeans_lloyd": GROUP_COUNT + " (2 * per-cluster count)",
    "embed_ann_ivfpq": GROUP_COUNT + " (2 * n, n a per-bucket count)",
    "embed_pca_power_iteration": "m.mx is greatest(max|s|, 1)-floored; "
    "cnt.n rows reach the division only alongside >= 1 vector",
    "graph_clustering_coefficient": "WHERE deg >= 2 on BOTH engines "
    "before the deg*(deg-1) division",
    "graph_hits": "divisor greatest(m DIV 1e6, 1) is explicitly floored",
    "graph_link_prediction_jaccard": "da.d + db.d - c.c >= max(da.d, "
    "db.d) >= 1: union of neighbor sets of nodes that come from edges",
    "graph_pagerank": "n / nn.n count nodes (rank rows exist only per "
    "node); o.outw sums weights >= 1 per present src",
    "graph_sssp_bellman_ford": "sum(w) over weights >= 1, per src "
    "present in edges",
    "pipeline_token_budget_plan": GROUP_COUNT + " (avail_tokens / "
    "tot_nano count and sum per-source tokens >= 1)",
    "text_wordpiece_train": "ca.sc / cb.sc are subword counts >= 1 for "
    "every pair row that exists",
    "timeseries_cusum_changepoint": "k is a 1-based row_number; "
    "n - k >= 1 enforced by WHERE k < n on both engines",
}


#: Spark-side guard evidence for a GUARDED adjudication. An oracle CASE
#: alone is only HALF a guard: under Spark 4's ANSI default a plain '/'
#: THROWS DIVIDE_BY_ZERO where the oracle's CASE yields NULL, so the
#: crash-vs-NULL parity the adjudication asserts needs the Spark
#: implementation to guard the same divisor. Round 15 (VERDICT r14 #5 +
#: ADVICE r14): the check is DIVISOR-GRANULAR — the function body is
#: stripped of its decorator (the oracle SQL), comments, and docstrings
#: (a guard mentioned in prose no longer counts), every division /
#: modulus site is tokenized with the audit's own divisor tokenizer,
#: and each site must be either structurally guarded (inside a
#: ``try_divide(`` argument list, or inside a ``when(``/``otherwise(``
#: branch — CaseWhen branches evaluate lazily per row, so a branch IS
#: conditional execution — or a divisor fed by ``greatest(`` /
#: ``nullif``) or carry a per-site entry in
#: :data:`SPARK_SITE_ADJUDICATIONS`. A new unguarded division added to
#: an already-GUARDED file now fails the audit instead of riding the
#: file-granular pass (the exact hole VERDICT r14 named).

#: query -> {normalized divisor token -> reason} for division sites in
#: the SPARK implementation that are safe WITHOUT a structural guard.
#: 'site' keys are the tokens the scanner prints; whitespace-collapsed.
SPARK_SITE_ADJUDICATIONS: dict[str, dict[str, str]] = {
    "agg_welch_ttest": {
        'F.col("n1")': GROUP_COUNT + " (cohort row count)",
        'F.col("n2")': GROUP_COUNT + " (cohort row count)",
    },
    "agg_regression_exact_moments": {
        '(F.col("n").cast("double") * F.lit(100.0))': GROUP_COUNT
        + " (n is the per-group row count, scaled by a positive literal)",
    },
    "text_heaps_law": {
        'F.col("k")': "the intercept division is projected over "
        "logs x fit rows — any surviving row implies logs is "
        "non-empty, so the global count k >= 1 on that row",
    },
    "anomaly_zscore_outliers": {
        'F.col("n")': GROUP_COUNT + " (per-type event count)",
    },
    "embed_quantize_int8": {
        'F.col("mx")': "the quantizing transform is referenced ONLY in "
        "the otherwise() branch of the mx == 0 CASE — CaseWhen branches "
        "evaluate lazily, so a zero vector never runs the division",
    },
    "event_spike_detection": {
        "nd": "the sd / nd trailing-mean projection runs on rows the "
        "n >= 12 filter kept (Project sits above Filter in the plan)",
    },
    "text_zipf_slope": {
        '(F.col("n").cast("double") * 1000000000.0)': GROUP_COUNT
        + " (n counts regression points; the nano-unit scale is "
        "a positive literal)",
    },
    "text_quality_calibration": {
        '(F.lit(1000.0) * F.col("n_tokens"))': GROUP_COUNT
        + " (n_tokens is a per-group count(*))",
        "(1.0 + exp(-(beta0 + beta1 * x)))": CONSTANT_DOMAIN
        + " (1 + exp(x) >= 1 — the sigmoid denominator)",
    },
    "sample_weighted_priority": {
        "F.lit(_U_DOMAIN)": "module constant 2^20, a positive literal "
        "behind a name",
        'F.col("o_totalprice")': "upstream .filter(o_totalprice > 0) — "
        "the A-ES divisions run only on filtered rows (quality.py "
        "docstring states the exclusion)",
    },
}

#: Literal-ish Python divisors that cannot be zero: F.lit(<nonzero num>).
_PY_LITERAL = re.compile(
    r"^F\.lit\(\s*-?(?:\d*\.\d*[1-9]\d*|\d*[1-9]\d*(?:\.\d*)?)"
    r"(?:e[+-]?\d+)?\s*\)$",
    re.I,
)

#: Call names whose argument spans count as structural guards.
_GUARD_CALLS = ("try_divide(", "when(", "otherwise(")


def _cut_body(src: str) -> str:
    """Drop the decorator (including the oracle SQL) — keep ``def ...``."""
    m = re.search(r"^def\s", src, re.M)
    return src[m.start():] if m else src


def _strip_comments_docstrings(src: str) -> str:
    src = re.sub(r'"""(?:[^"\\]|\\.|"(?!""))*"""', '""', src, flags=re.S)
    src = re.sub(r"'''(?:[^'\\]|\\.|'(?!''))*'''", "''", src, flags=re.S)
    return re.sub(r"#[^\n]*", "", src)


def _string_spans(src: str) -> list[tuple[int, int, str]]:
    return [
        (m.start(), m.end(), m.group(0))
        for m in re.finditer(
            r"f?(\"(?:[^\"\\\n]|\\.)*\"|'(?:[^'\\\n]|\\.)*')", src
        )
    ]


def _call_spans(src: str, names=_GUARD_CALLS) -> list[tuple[int, int]]:
    """Argument-list spans of calls to ``names`` (balanced parens)."""
    spans = []
    for name in names:
        for m in re.finditer(re.escape(name), src):
            i = m.end() - 1
            spans.append((i, _balanced(src, i)))
    return spans


def _py_divisor_token(s: str) -> str:
    """Python-side analog of :func:`divisor_token`: balanced paren
    group, call with trailing attribute chain, or bare token."""
    s = s.lstrip()
    if not s:
        return ""
    if s[0] == "(":
        return s[: _balanced(s, 0)].strip()
    m = re.match(r"[A-Za-z_][\w.]*\s*\(", s)
    if m:
        out = s[: _balanced(s, m.end() - 1)]
        while True:  # attribute chains: F.col("x").cast("double")
            m2 = re.match(r"\s*\.\s*[A-Za-z_]\w*\s*\(", s[len(out):])
            if not m2:
                break
            out = s[: len(out) + _balanced(s[len(out):], m2.end() - 1)]
        return out.strip()
    m = re.match(r"-?[\w.$]+", s)
    return m.group(0) if m else s[:20]


def _norm_site(tok: str) -> str:
    return re.sub(r"\s+", " ", tok).strip()


def spark_division_sites(fn) -> list[tuple[str, str, str | None]]:
    """Every non-literal division/modulus site in a query's SPARK
    implementation body: ``(kind, divisor_token, guard)`` where kind is
    'py' (a Column operator) or 'sql' (inside an embedded expr string)
    and guard names the structural evidence, or None if unguarded."""
    import inspect

    src = _strip_comments_docstrings(_cut_body(inspect.getsource(fn)))
    spans = _string_spans(src)
    guards = _call_spans(src)

    def guard_at(pos: int) -> str | None:
        for a, b in guards:
            if a <= pos < b:
                call = src[max(0, a - 20): a]
                name = re.search(r"[\w.]+$", call)
                return f"inside {(name.group(0) if name else '?')}(...)"
        return None

    sites: list[tuple[str, str, str | None]] = []
    # Python-level sites: blank out strings whose content carries
    # division characters (paths, formats); keep harmless ones so the
    # divisor tokens stay readable (F.col("n") not F.col(    )).
    blanked = list(src)
    for a, b, lit in spans:
        if "/" in lit or "%" in lit:
            for i in range(a, b):
                if src[i] != "\n":
                    blanked[i] = " "
    blanked_s = "".join(blanked)
    for m in re.finditer(r"/(?!/)|%", blanked_s):
        if blanked_s[m.start() - 1: m.start()] == "/":
            continue  # the '//' floor-div spelled as two tokens
        d = _py_divisor_token(blanked_s[m.end(): m.end() + 300])
        if (
            _LITERAL.match(d)
            or _PY_LITERAL.match(_norm_site(d))
            or not re.search(r"[A-Za-z_]", d)
        ):
            continue
        g = guard_at(m.start())
        if g is None and re.search(
            r"greatest\(|nullif|try_divide", d, re.I
        ):
            g = "divisor fed by greatest/nullif/try_divide"
        sites.append(("py", _norm_site(d)[:70], g))
    # Embedded-string sites (SQL inside F.expr / selectExpr / filters).
    for a, b, lit in spans:
        if "/" not in lit and "%" not in lit:
            continue
        up = lit.upper()
        for m in re.finditer(
            r"/(?![*/])|%|(?<![A-Za-z])DIV(?![A-Za-z])", lit
        ):
            d = divisor_token(lit, m.end())
            if _LITERAL.match(d) or not re.search(r"[A-Za-z_]", d):
                continue
            g = guard_at(a + m.start())
            if g is None and (
                "CASE WHEN" in up[: m.start()] or "IF(" in up[: m.start()]
            ):
                g = "inside a CASE WHEN / IF( branch of the expr string"
            if g is None and re.search(r"greatest\(|nullif", d, re.I):
                g = "divisor fed by greatest/nullif"
            sites.append(("sql", _norm_site(d)[:70], g))
    return sites


def spark_guard_failures(verbose: bool = False) -> list[str]:
    """Divisor-granular: every division site in a GUARDED-adjudicated
    query's Spark implementation must be structurally guarded or carry
    a per-site adjudication."""
    specs = load_all()
    failures: list[str] = []
    for name, reason in sorted(ADJUDICATIONS.items()):
        if not reason.startswith(GUARDED[:20]):
            continue
        spec = specs.get(name)
        if spec is None:
            continue
        try:
            sites = spark_division_sites(spec.fn)
        except (OSError, TypeError):
            failures.append(f"{name}: Spark source unavailable")
            continue
        site_adj = SPARK_SITE_ADJUDICATIONS.get(name, {})
        claimed = set()
        n_guarded = 0
        for kind, tok, guard in sites:
            if guard is None and tok in site_adj:
                guard = f"site-adjudicated: {site_adj[tok]}"
                claimed.add(tok)
            if guard is None:
                failures.append(
                    f"{name}: UNGUARDED {kind} division by `{tok}` — "
                    "no structural guard and no per-site adjudication"
                )
            else:
                n_guarded += 1
            if verbose:
                print(f"    [{kind}] {name} / `{tok}` -> "
                      f"{guard or 'UNGUARDED'}")
        for tok in sorted(set(site_adj) - claimed):
            failures.append(
                f"{name}: stale site adjudication `{tok}` (no such "
                "division site — the body changed; re-adjudicate)"
            )
        if not sites and not verbose:
            continue
    return failures


def _balanced(s: str, start: int) -> int:
    """End index (exclusive) of the paren group opening at s[start]."""
    depth = 0
    for i in range(start, min(len(s), start + 300)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    return min(len(s), start + 300)


def divisor_token(sql: str, pos: int) -> str:
    """The RHS operand of a division/modulus at ``pos``: a balanced
    paren group, a function call with its args, or the first bare
    token — never trailing clause text (round 14: the old capture ran
    into following JOIN/GROUP/THEN clauses, flagging literal divisors
    like '% 16' as non-literal)."""
    s = sql[pos:].lstrip()
    if not s:
        return ""
    if s[0] == "(":
        return s[: _balanced(s, 0)].strip()
    m = re.match(r"[A-Za-z_][\w.]*\s*\(", s)
    if m:
        return s[: _balanced(s, m.end() - 1)].strip()
    m = re.match(r"-?[\w.$]+", s)
    return m.group(0) if m else s[:20]


def flagged_queries() -> dict[str, list[str]]:
    """Every oracle division/modulus/int-division whose RHS is not a
    pure numeric literal. String literals are stripped FIRST (round
    14): strftime formats and LIKE patterns are '%'-dense false
    positives, and the old in-string '/' hits needed STRING_SLASH
    pseudo-adjudications. '%'/'//' joined the scan in round 14 —
    under Spark's ANSI default x % 0 and x DIV 0 throw exactly like
    x / 0 (the derived-partsupp '% sc.s' was the first real find)."""
    specs = load_all()
    out: dict[str, list[str]] = {}
    for name, spec in specs.items():
        if not spec.oracle:
            continue
        sql = re.sub(r"--[^\n]*", "", spec.oracle)
        sql = re.sub(r"'[^']*'", "''", sql)  # strip string literals
        toks = []
        for pat, op in (
            (r"/(?![*/])(?<!//)", "/"),
            (r"(?<!/)//(?!/)", "//"),
            (r"%", "%"),
        ):
            for m in re.finditer(pat, sql):
                if op == "/" and sql[m.start() - 1 : m.start()] == "/":
                    continue
                d = divisor_token(sql, m.end())
                if _LITERAL.match(d) or not re.search(r"[a-zA-Z_]", d):
                    continue
                toks.append(f"{op} {d[:60]}")
        if toks:
            out[name] = sorted(set(toks))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    flagged = flagged_queries()
    missing = sorted(set(flagged) - set(ADJUDICATIONS))
    stale = sorted(set(ADJUDICATIONS) - set(flagged))
    if args.verbose:
        for n in sorted(flagged):
            mark = "ok " if n in ADJUDICATIONS else "FAIL"
            print(f"{mark} {n}: {ADJUDICATIONS.get(n, '<UNADJUDICATED>')}")
            for t in flagged[n]:
                print(f"       / {t}")
    print(
        f"divzero audit: {len(flagged)} oracles with non-literal divisors, "
        f"{len(flagged) - len(missing)} adjudicated, {len(missing)} missing"
    )
    if stale:
        print(f"note: {len(stale)} stale adjudications (no longer flagged): "
              f"{stale}")
    n_sites = sum(len(v) for v in flagged.values())
    print(f"oracle sites: {n_sites} non-literal divisors across "
          f"{len(flagged)} oracles")
    guard_failures = spark_guard_failures(verbose=args.verbose)
    print(
        f"spark-side guard check (divisor-granular): "
        f"{len([r for r in ADJUDICATIONS.values() if r.startswith(GUARDED[:20])])}"
        f" GUARDED adjudications, {len(guard_failures)} unguarded/stale sites"
    )
    if missing or guard_failures:
        for n in missing:
            print(f"UNADJUDICATED {n}: {flagged[n]}")
        for f in guard_failures:
            print(f"SPARK-GUARD-MISSING {f}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Distributed suffix-array construction by prefix doubling.

Manber & Myers (SIAM J. Comput. 1990) / the Larsson–Sadakane doubling
scheme, re-expressed as DataFrame rounds — the index structure behind
suffix-array exact-substring dedup (Lee et al., "Deduplicating Training
Data Makes Language Models Better", ACL'22 §4.1: their EXACTSUBSTR
implementation builds exactly this array over the corpus).

Token-level, within-doc suffixes (a "suffix" is the token sequence from
position ``pos`` to the end of its document — repeated substrings never
meaningfully span document boundaries, which is also why Lee et al.
insert document separators before indexing).

The doubling invariant: after round ``k`` every suffix holds a DENSE
rank that orders suffixes by their first ``2^k`` tokens. One round:

1. pair each position's rank with the rank ``2^k`` positions ahead
   (0 when past the end of the doc — a shorter suffix sorts before
   every extension of it, since real ranks start at 1);
2. dense-rank the (r, r_ahead) pairs;
3. the new rank orders by ``2^(k+1)`` tokens.

``ROUNDS`` bounds the discriminating prefix at ``2^ROUNDS`` tokens:
suffixes identical for that long keep equal (dense) ranks — both
engines agree on that semantics exactly, and equal final ranks are
precisely the "duplicated >= 2^ROUNDS-token span" signal exact-substring
dedup consumes. Production sizes ROUNDS as ceil(log2(max doc tokens)).

Distribution discipline (the part that must survive 100 TB):

- NO global single-partition window anywhere. Dense ranks are computed
  with the two-phase bucket-offset pattern (the
  ``ids_global_row_number`` decomposition): distinct keys -> contiguous
  range buckets -> per-bucket window (each task sorts one bucket) ->
  bucket offsets from a window over the <=64-row counts table.
- Bucket ranges: round 0 buckets by the leading character's CAPPED
  codepoint (``least(63, codepoint DIV 4)`` — contiguous in
  lexicographic order and bounded at ``N_BUCKETS`` for ANY alphabet;
  ADVICE r10 flagged the raw leading-character bucket as unbounded on
  Unicode-heavy corpora. Codepoints ≥ 252 collapse into the last
  bucket, so a non-Latin corpus skews there — a perf property, not a
  correctness one; a cluster deploy would use sampled range splits,
  i.e. Spark's own RangePartitioner). Every later round buckets by
  ``(r-1)*64 DIV M`` over the PREVIOUS dense rank r — dense ranks are
  uniform on [1, M] by construction, so the ranges are balanced for
  free. M rides in a broadcast 1-row frame
  (the argmax-frame pattern of operators/bpe.train_merges — no
  driver-side data path).
- Each round ends in an eager ``localCheckpoint``: the next round
  self-joins the output, and without truncation the lineage (and
  Catalyst analysis time) doubles per round — the duplicate_clusters
  lesson.
- Round 15 (VERDICT r14 #3): each round FREES the previous round's
  checkpoint blocks once its own checkpoint has materialized. Without
  this, all ~ROUNDS+1 checkpointed corpus-position frames stay pinned
  in the block manager for the whole build — an O(rounds · N) storage
  footprint that OOM'd the 27M-suffix x100 corpus on the 8 g
  single-JVM default (driver heap IS executor heap in local mode).
  With it, live storage is bounded at TWO rounds (the one being read
  and the one being written) regardless of ``rounds`` — the same
  discipline an iterative cluster job needs, since executor storage
  is finite there too.

Shuffle count: 3 per round (distinct, per-bucket window, join-back)
plus the pos+gap self-join — O(N log L) total work, the textbook
distributed suffix-array cost.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Storage level for the INTERMEDIATE round checkpoints. DISK_ONLY, not
#: the MEMORY_AND_DISK(deserialized) default: caching a partition as
#: values unrolls the whole partition into object heap
#: (MemoryStore.putIteratorAsValues — the allocation site of the x100
#: OOM at the 8 g default), and an intermediate round is read exactly
#: once (by the next round, through the OS page cache) before being
#: freed, so RAM residency buys nothing. The FINAL frame keeps the
#: default level — it is the probe-many index downstream queries
#: re-read.
_ROUND_STORAGE = StorageLevel.DISK_ONLY

#: Discriminating prefix = 2^ROUNDS = 128 tokens (fixture docs max 100).
ROUNDS = 7

#: Contiguous range buckets per dense-rank pass (the only "global"
#: window in the operator touches this many rows).
N_BUCKETS = 64


def corpus_positions(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(doc_id, pos, tok) for every non-empty whitespace token; pos is
    0-based and contiguous within the doc."""
    toks = F.expr(f"filter(split({text_col}, ' '), t -> t <> '')")
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "tok")
    )


def _dense_rank(keys: DataFrame, key_cols: list[str]) -> DataFrame:
    """Append ``_r`` = dense rank of ``key_cols`` (lexicographic), via
    the two-phase bucket-offset decomposition. ``keys`` must already
    carry a ``_b`` bucket column that is monotone non-decreasing in key
    order (contiguous ranges) — a pure function of the keys, so the
    distinct is unaffected."""
    dk = keys.select("_b", *key_cols).distinct()
    w_in = Window.partitionBy("_b").orderBy(*key_cols)
    ranked = dk.withColumn("_rn", F.row_number().over(w_in))
    counts = ranked.groupBy("_b").agg(F.count("*").alias("_n"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        ranked.join(F.broadcast(offsets), "_b")
        .select(
            *key_cols,
            (F.col("_off") + F.col("_rn")).cast("bigint").alias("_r"),
        )
    )


def free_local_checkpoint(df: DataFrame) -> None:
    """Drop the block-manager storage behind an eagerly
    ``localCheckpoint``-ed frame. ONLY call when no downstream plan
    will read the frame again — a local checkpoint's lineage is
    truncated, so its blocks cannot be recomputed once dropped.
    Best-effort (storage pressure, not correctness): failures are
    swallowed."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


#: Session-scoped memo of built suffix-rank frames, keyed by
#: (applicationId, cache_key, dir-fingerprint) — the shared-index
#: pattern of operators/dedup.minhash_index: text_suffix_array and
#: text_longest_dup_substring both start from the same ranks, and at
#: cluster scale this is the deployment shape anyway (build the index
#: once, persist, probe many).
_SUFFIX_RANK_CACHE: dict[tuple, DataFrame] = {}


def suffix_ranks(
    docs: DataFrame, rounds: int = ROUNDS, cache_key: tuple | None = None
) -> DataFrame:
    """(doc_id, pos, suffix_rank): dense rank of every within-doc token
    suffix under lexicographic order of its first ``2^rounds`` tokens.
    Equal ranks <=> suffixes identical that deep (or to their ends).

    Pass ``cache_key`` ONLY for immutable inputs (fixture tables keyed
    by sf_dir); ad-hoc DataFrames must keep the default None."""
    if cache_key is not None:
        from jubilant_garbanzo_spark.operators.dedup import _dir_fingerprint

        key = (
            docs.sparkSession.sparkContext.applicationId,
            rounds,
            cache_key,
            _dir_fingerprint(cache_key),
        )
        hit = _SUFFIX_RANK_CACHE.get(key)
        if hit is not None:
            return hit
    pos = corpus_positions(docs)
    # Round 0: rank by the single token at pos. Bucket = capped leading
    # codepoint — monotone in token order (for codepoints < 252, UTF-16
    # comparison order == codepoint order; everything ≥ 252 collapses
    # into bucket 63) and bounded at N_BUCKETS for any alphabet, so the
    # offsets window really does touch ≤ 64 rows (ADVICE r10).
    r0 = _dense_rank(
        pos.select(
            "tok",
            F.expr(
                f"least({N_BUCKETS - 1}, ascii(substring(tok, 1, 1)) DIV 4)"
            ).alias("_b"),
        ),
        ["tok"],
    )
    cur = (
        pos.join(r0.select("tok", "_r"), "tok")
        .select("doc_id", "pos", F.col("_r").alias("r"))
        .localCheckpoint(
            eager=True,
            storageLevel=_ROUND_STORAGE if rounds > 0 else None,
        )
    )
    for k in range(rounds):
        gap = 1 << k
        nxt = cur.select(
            F.col("doc_id").alias("ndoc"),
            (F.col("pos") - gap).alias("npos"),
            F.col("r").alias("nr"),
        )
        paired = (
            cur.join(
                nxt,
                (cur.doc_id == nxt.ndoc) & (cur.pos == nxt.npos),
                "left",
            )
            .select(
                "doc_id",
                "pos",
                "r",
                F.coalesce("nr", F.lit(0)).cast("bigint").alias("r2"),
            )
        )
        m = paired.agg(F.max("r").alias("_m"))
        keyed = paired.crossJoin(F.broadcast(m)).withColumn(
            "_b", F.expr(f"((r - 1) * {N_BUCKETS}) DIV _m")
        )
        rk = _dense_rank(keyed.select("r", "r2", "_b"), ["r", "r2"])
        nxt_cur = (
            keyed.join(rk.select("r", "r2", "_r"), ["r", "r2"])
            .select("doc_id", "pos", F.col("_r").alias("r"))
            .localCheckpoint(
                eager=True,
                storageLevel=(
                    _ROUND_STORAGE if k < rounds - 1 else None
                ),
            )
        )
        # eager=True means nxt_cur's blocks exist before we drop the
        # previous round's — live checkpoint storage stays bounded at
        # two rounds however deep the doubling goes.
        free_local_checkpoint(cur)
        cur = nxt_cur
    out = cur.select(
        "doc_id", F.col("pos").cast("bigint").alias("pos"),
        F.col("r").alias("suffix_rank")
    )
    if cache_key is not None:
        _SUFFIX_RANK_CACHE[key] = out
    return out


def oracle_sql(rounds: int = ROUNDS) -> str:
    """DuckDB replay: the same doubling recurrence with the engine's
    dense ranks expressed as single global ``dense_rank()`` windows
    (fine single-node; the Spark side decomposes them — that equality
    is exactly what the differential check proves)."""
    parts = [
        """toks AS MATERIALIZED (
            SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos,
                   unnest(ws) AS tok
            FROM (SELECT doc_id,
                         list_filter(string_split(text, ' '),
                                     t -> t <> '') AS ws
                  FROM documents)
        )""",
        """r0 AS MATERIALIZED (
            SELECT doc_id, pos,
                   CAST(dense_rank() OVER (ORDER BY tok) AS BIGINT) AS r
            FROM toks
        )""",
    ]
    for k in range(rounds):
        gap = 1 << k
        parts.append(f"""r{k + 1} AS MATERIALIZED (
            SELECT a.doc_id, a.pos,
                   CAST(dense_rank() OVER (
                       ORDER BY a.r, coalesce(b.r, 0)) AS BIGINT) AS r
            FROM r{k} a
            LEFT JOIN r{k} b
              ON b.doc_id = a.doc_id AND b.pos = a.pos + {gap}
        )""")
    return ",\n".join(parts)

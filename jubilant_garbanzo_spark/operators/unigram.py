"""Unigram-LM (SentencePiece) tokenizer APPLY — Viterbi segmentation.

Reference behavior (public literature, not the reference repo —
``/root/reference`` has no tokenizer): Kudo, "Subword Regularization"
(ACL'18) §3 / the SentencePiece unigram model: given a piece
vocabulary with log-probabilities, segment each word into the piece
sequence maximizing the summed log-probability — a Viterbi DP over
word positions, the *global-optimal* twin of BPE's greedy merge loop
(operators/bpe.py). Characters outside the vocabulary fall back to a
per-character UNK penalty, so every word is segmentable (SentencePiece
``--byte_fallback`` plays the same totality role).

Spark-first shape — per-row only, zero shuffle until the caller
aggregates:

- the piece table ships as a ``map(...)`` PLAN LITERAL (the broadcast
  analog for a table this small; a production 32k-piece vocabulary
  would swap :func:`vocab_map_expr` for a broadcast join — the DP
  expression is unchanged);
- the DP is ONE ``aggregate`` fold over ``sequence(1, length(word))``
  whose accumulator is the growing array of per-position best states
  ``struct(s, np, seg)`` — score in exact integer milli-nats, negated
  piece count, and the segmentation string. The candidate for each
  piece length k = 1..KMAX references the accumulator via lambda
  variables only (the operators/bpe._let discipline), so the plan is
  CONSTANT-SIZE regardless of word length — the fold loops at
  runtime, nothing unrolls per position;
- the total order ``max(struct(s, np, seg))`` (score, then fewer
  pieces, then lexicographically greatest piece string) makes the
  argmax deterministic on both engines even under score ties.

Exactness: scores are integer milli-nats summed exactly; the DuckDB
oracle replays the SAME recurrence as unrolled relational rounds (one
CTE pair per position, candidates via substr joins against a VALUES
vocab, per-word argmax via a ROW_NUMBER window with the identical tie
order) — an independent formulation, so the differential check proves
the fold. A Python reference loop pins the semantics in
tests/test_llm_ops.py.
"""

from __future__ import annotations

from jubilant_garbanzo_spark.operators.bpe import _let

#: Piece vocabulary: (piece, log-prob in exact integer MILLI-NATS,
#: negative). Single characters cover the corpus alphabet (totality
#: without UNK on the fixtures); multi-char pieces are priced so the
#: DP genuinely chooses (a 4-char piece beats its character split, but
#: adjacent pieces compete — Viterbi's global optimum differs from a
#: greedy longest-match on words like "batch" and "stream").
_SINGLES = "abcdefghijklmnopqrstuvwxyz"
_MULTI = (
    # 2-char pieces
    "th", "he", "in", "er", "an", "at", "da", "ta", "or", "ro",
    "st", "sc", "ha", "sh", "ow", "ry", "ue", "am", "ch", "le",
    # 3-char pieces
    "the", "dat", "ata", "ter", "ind", "row", "ort", "can", "tab",
    "que", "ash", "tch", "eam", "umn", "ter",
    # 4-char pieces
    "data", "join", "hash", "scan", "sort", "part", "wind", "ream",
    "tabl", "lumn", "quer", "ilte", "grou", "trea", "batc",
)

#: Longest piece the DP considers (SentencePiece's max_piece_length
#: analog); bounds the per-position candidate fan-in.
KMAX = 4

#: Per-character UNK penalty (milli-nats) for characters outside the
#: vocabulary — guarantees every word segments.
UNK_MILLI = -11500

#: Words longer than this are excluded on BOTH engines (the oracle
#: unrolls one relational round per position; fixture max is 8).
MAXLEN = 12


def _dedup_keep_first(pieces):
    seen = set()
    out = []
    for p in pieces:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


def build_vocab() -> tuple[tuple[str, int], ...]:
    """The (piece, milli-logprob) table. Deterministic arithmetic
    pricing: singles ≈ -3.0 to -4.0 nats, k-char pieces priced to beat
    their character split but stay comparable to rival tilings."""
    vocab = []
    for i, c in enumerate(_SINGLES):
        vocab.append((c, -(3000 + 40 * i)))
    for i, p in enumerate(_dedup_keep_first(_MULTI)):
        base = {2: 5200, 3: 6800, 4: 8200}[len(p)]
        vocab.append((p, -(base + 37 * i)))
    return tuple(vocab)


VOCAB: tuple[tuple[str, int], ...] = build_vocab()


def vocab_map_expr() -> str:
    """SQL ``map('piece', lp, ...)`` literal (pieces are ASCII
    alphanumeric by construction; asserted so a future quoted piece
    cannot silently break either engine's SQL — the bpe.py ADVICE)."""
    assert all(p.isalnum() for p, _ in VOCAB), "pieces must stay quote-free"
    entries = ", ".join(f"'{p}', {lp}" for p, lp in VOCAB)
    return f"map({entries})"


def _candidate(k: int, vmap: str) -> str:
    """Candidate DP state for a piece of length ``k`` ending at
    position ``j`` (lambda vars ``acc``/``j`` from the enclosing
    fold): previous state + piece score, or NULL when out of range /
    unpriced. k=1 falls back to UNK_MILLI, so a 1-char candidate
    always exists and the DP is total."""
    lp = f"try_element_at({vmap}, pc)"
    if k == 1:
        lp = f"coalesce({lp}, {UNK_MILLI})"
    # greatest(..., 1): for j < k the state is unused (the IF guard
    # below is false) but the index is still EVALUATED — 0 throws
    # INVALID_INDEX_OF_ZERO and a negative would silently read from
    # the array's end.
    return _let(
        f"try_element_at(acc, greatest(j - {k} + 1, 1))",
        "pv",
        _let(
            f"substring(word, j - {k} + 1, {k})",
            "pc",
            _let(
                lp,
                "lp",
                f"IF(j >= {k} AND pv IS NOT NULL AND lp IS NOT NULL,"
                f" named_struct('s', pv.s + lp, 'np', pv.np - 1,"
                f" 'seg', concat(pv.seg, ' ', pc)), NULL)",
            ),
        ),
    )


def viterbi_expr(word_col: str = "word") -> str:
    """SQL expression: the final DP state ``struct(s, np, seg)`` for
    ``word_col`` — score in milli-nats, negated piece count, and the
    ' '-prefixed segmentation string."""
    vmap = vocab_map_expr()
    cands = ", ".join(_candidate(k, vmap) for k in range(1, KMAX + 1))
    fold = (
        f"aggregate(sequence(1, length({word_col})),"
        f" array(named_struct('s', 0, 'np', 0, 'seg', '')),"
        f" (acc, j) -> concat(acc, array("
        f"   array_max(filter(array({cands}), x -> x IS NOT NULL)))))"
    )
    return _let(fold, "dp", f"element_at(dp, length({word_col}) + 1)")


# -- DuckDB oracle replay -----------------------------------------------------


def oracle_sql(topcols: str = "") -> str:
    """Full DuckDB SELECT replaying the Viterbi DP as unrolled
    relational rounds over the distinct-word dict of ``documents``:
    one (candidates, argmax) CTE pair per position 1..MAXLEN, piece
    lookups via substr joins against a VALUES vocab, the argmax via a
    ROW_NUMBER window with the tie order (s DESC, np DESC, seg DESC) —
    exactly ``max(struct(s, np, seg))``."""
    vals = ", ".join(f"('{p}', {lp})" for p, lp in VOCAB)
    parts = [
        f"vocab(piece, lp) AS MATERIALIZED (VALUES {vals})",
        f"""wcnt AS MATERIALIZED (
            SELECT word AS wid, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS word
                  FROM documents)
            WHERE word <> '' AND len(word) <= {MAXLEN}
            GROUP BY 1
        )""",
        "d0 AS MATERIALIZED (SELECT wid, 0 AS s, 0 AS np, '' AS seg"
        " FROM wcnt)",
    ]
    for j in range(1, MAXLEN + 1):
        branches = []
        for k in range(1, min(KMAX, j) + 1):
            start = j - k + 1
            if k == 1:
                branches.append(f"""
            SELECT d.wid, d.s + coalesce(v.lp, {UNK_MILLI}) AS s,
                   d.np - 1 AS np,
                   d.seg || ' ' || substr(d.wid, {start}, 1) AS seg
            FROM d{j - 1} d
            LEFT JOIN vocab v ON v.piece = substr(d.wid, {start}, 1)
            WHERE len(d.wid) >= {j}""")
            else:
                branches.append(f"""
            SELECT d.wid, d.s + v.lp AS s, d.np - 1 AS np,
                   d.seg || ' ' || substr(d.wid, {start}, {k}) AS seg
            FROM d{j - k} d
            JOIN vocab v ON v.piece = substr(d.wid, {start}, {k})
            WHERE len(d.wid) >= {j}""")
        union = " UNION ALL ".join(branches)
        parts.append(f"c{j} AS MATERIALIZED ({union})")
        parts.append(f"""d{j} AS MATERIALIZED (
            SELECT wid, s, np, seg FROM (
                SELECT c.*, ROW_NUMBER() OVER (
                    PARTITION BY wid
                    ORDER BY s DESC, np DESC, seg DESC) AS rk
                FROM c{j} c
            ) WHERE rk = 1
        )""")
    fin = " UNION ALL ".join(
        f"SELECT * FROM d{j} WHERE len(wid) = {j}"
        for j in range(1, MAXLEN + 1)
    )
    parts.append(f"fin AS ({fin})")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT w.wid AS word, w.cnt,
               CAST(-f.np AS BIGINT) AS n_pieces,
               substr(f.seg, 2) AS segmentation,
               CAST(f.s AS BIGINT) AS score_milli
        FROM fin f JOIN wcnt w ON w.wid = f.wid{topcols}"""
    )

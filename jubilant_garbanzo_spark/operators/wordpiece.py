"""WordPiece tokenizer APPLY — greedy longest-match-first.

Reference behavior (public literature, not the reference repo —
``/root/reference`` has no tokenizer): the BERT WordPiece algorithm
(Devlin et al. NAACL'19 §2; Wu et al. 2016 §3.1; the HuggingFace
``tokenizers`` WordPiece model): each word is consumed left to right,
at every position taking the LONGEST vocabulary piece that matches —
continuation pieces carry a ``##`` prefix — and a word with no match
at any position becomes a single ``[UNK]`` token (whole-word
fallback, NOT per-character). This completes the repo's standard
tokenizer-family triple: BPE (greedy merge ranks, operators/bpe.py),
unigram-LM (global Viterbi optimum, operators/unigram.py), WordPiece
(greedy longest match) — three genuinely different segmentations of
the same corpus.

Spark-first shape — identical discipline to the unigram apply:

- the piece vocabulary ships as a ``map(...)`` PLAN LITERAL (broadcast
  analog; a production 30k-piece BERT vocab swaps in a broadcast
  join, the fold text unchanged);
- the greedy loop is ONE ``aggregate`` fold over
  ``sequence(1, length(word))`` whose accumulator is the single
  cursor state ``struct(pos, np, seg, bad)`` — every step consumes at
  least one character (or marks the word bad), so ``length(word)``
  iterations always suffice and surplus iterations are no-ops. All
  candidate references go through lambda variables (the
  operators/bpe._let discipline), so the plan is CONSTANT-SIZE in
  word length;
- greedy is deterministic (longest match, fixed vocabulary): no tie
  order is needed, unlike the Viterbi argmax.

The DuckDB oracle replays the loop as unrolled relational rounds (one
round per position, longest match via a ROW_NUMBER over the k-join,
done-rows carried), an independent formulation; a Python reference
loop with HuggingFace semantics pins both in tests/test_llm_ops.py.
"""

from __future__ import annotations

from jubilant_garbanzo_spark.operators.bpe import _let

#: Word-START pieces. Singles a-z give near-totality on the fixture's
#: lowercase vocabulary (words containing digits/punctuation become
#: [UNK] — exercising the whole-word fallback); multi-char pieces are
#: chosen so greedy longest-match genuinely diverges from both BPE
#: merges and the unigram Viterbi optimum on corpus words.
_START_MULTI = (
    "th", "st", "ba", "ta", "ca", "co", "wi", "fi",
    "the", "dat", "que", "gro", "str", "win",
    "data", "scan", "sort", "join", "hash", "part", "grou", "quer",
    "batc", "filt", "tabl", "wind", "stre", "colu",
)

#: CONTINUATION pieces (matched with the '##' prefix at pos > 1).
_CONT_MULTI = (
    "##er", "##ed", "##ry", "##ta", "##an", "##ch", "##le", "##re",
    "##on", "##in", "##at", "##or", "##am", "##um",
    "##ing", "##ery", "##ble", "##umn", "##eam", "##tch", "##ream",
    "##ion", "##her", "##ter",
)

#: Longest piece CONTENT length the matcher considers (chars of the
#: word, excluding the '##' marker) — bounds per-step candidate fan-in.
KMAX = 4

#: Words longer than this are excluded on BOTH engines (the oracle
#: unrolls one relational round per position; fixture max is 8).
MAXLEN = 12

_SINGLES = "abcdefghijklmnopqrstuvwxyz"

# Survives python -O (same rationale as operators/unigram.py).
if len(set(_START_MULTI + _CONT_MULTI)) != len(_START_MULTI + _CONT_MULTI):
    raise ValueError("duplicate piece in the WordPiece vocabulary")
if any(len(p) > KMAX for p in _START_MULTI):
    raise ValueError("start piece longer than KMAX")
if any(len(p) - 2 > KMAX or not p.startswith("##") for p in _CONT_MULTI):
    raise ValueError("continuation piece malformed or longer than KMAX")


def build_vocab() -> tuple[str, ...]:
    """The full piece set: start singles + continuation singles +
    the multi-char start/continuation pieces. Membership is all that
    matters (WordPiece is score-free), so the vocabulary is a set."""
    singles = tuple(_SINGLES) + tuple("##" + c for c in _SINGLES)
    return singles + _START_MULTI + _CONT_MULTI


VOCAB: tuple[str, ...] = build_vocab()


def vocab_map_expr() -> str:
    """SQL ``map('piece', 1, ...)`` membership literal ('#' needs no
    escaping; the alnum guard keeps future pieces quote-free, the
    bpe.py ADVICE)."""
    assert all(
        p.replace("#", "").isalnum() for p in VOCAB
    ), "pieces must stay quote-free"
    entries = ", ".join(f"'{p}', 1" for p in VOCAB)
    return f"map({entries})"


def _candidate(k: int, vmap: str) -> str:
    """Candidate struct for a match of CONTENT length ``k`` at the
    cursor (lambda var ``acc`` from the enclosing fold): the piece
    string (##-prefixed beyond position 1) when it fits the word and
    is in the vocabulary, else NULL."""
    piece = (
        f"concat(IF(acc.pos > 1, '##', ''),"
        f" substring(word, acc.pos, {k}))"
    )
    return _let(
        piece,
        "pc",
        f"IF(acc.pos + {k} - 1 <= length(word)"
        f" AND try_element_at({vmap}, pc) IS NOT NULL,"
        f" named_struct('k', {k}, 'pc', pc), NULL)",
    )


def wordpiece_expr(word_col: str = "word", vmap: str | None = None) -> str:
    """SQL expression: the terminal greedy state
    ``struct(pos, np, seg, bad)`` for ``word_col`` — cursor position,
    piece count, ' '-prefixed segmentation, and the whole-word-UNK
    flag. Callers render ``bad`` as the single ``[UNK]`` token."""
    if vmap is None:
        vmap = vocab_map_expr()
    # longest match first: coalesce tries k = KMAX .. 1 in order
    cands = ", ".join(_candidate(k, vmap) for k in range(KMAX, 0, -1))
    step = _let(
        f"coalesce({cands})",
        "c",
        "IF(c IS NULL,"
        " named_struct('pos', acc.pos, 'np', acc.np,"
        " 'seg', acc.seg, 'bad', true),"
        " named_struct('pos', acc.pos + c.k, 'np', acc.np + 1,"
        " 'seg', concat(acc.seg, ' ', c.pc), 'bad', false))",
    )
    return (
        f"aggregate(sequence(1, length({word_col})),"
        f" named_struct('pos', 1, 'np', 0, 'seg', '', 'bad', false),"
        f" (acc, j) -> IF(acc.bad OR acc.pos > length({word_col}),"
        f" acc, {step}))"
    )


def python_reference(word: str, vocab: set[str] | None = None) -> list[str]:
    """HuggingFace-semantics WordPiece for the parity test: greedy
    longest-match-first with '##' continuations, whole-word [UNK] on
    any failed position."""
    v = set(VOCAB) if vocab is None else vocab
    pieces: list[str] = []
    start = 0
    while start < len(word):
        end = min(len(word), start + KMAX)
        found = None
        while end > start:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in v:
                found = sub
                break
            end -= 1
        if found is None:
            return ["[UNK]"]
        pieces.append(found)
        start = end
    return pieces


# -- DuckDB oracle replay -----------------------------------------------------


def oracle_sql(topcols: str = "") -> str:
    """DuckDB SELECT replaying the greedy loop as unrolled relational
    rounds over the distinct-word dict of ``documents``: state table
    ``g{j}`` per position round, the longest match per word via a
    ROW_NUMBER over the 1..KMAX substr join (k DESC), finished rows
    (cursor past the end, or bad) carried unchanged — an independent
    formulation of the Spark fold."""
    vals = ", ".join(f"('{p}')" for p in VOCAB)
    parts = [
        f"vocab(piece) AS MATERIALIZED (VALUES {vals})",
        f"""wcnt AS MATERIALIZED (
            SELECT word AS wid, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS word
                  FROM documents)
            WHERE word <> '' AND len(word) <= {MAXLEN}
            GROUP BY 1
        )""",
        "g0 AS MATERIALIZED"
        " (SELECT wid, 1 AS pos, 0 AS np, '' AS seg, FALSE AS bad"
        "  FROM wcnt)",
    ]
    for j in range(1, MAXLEN + 1):
        parts.append(f"""m{j} AS MATERIALIZED (
            SELECT wid, pos, np, seg, klen, piece FROM (
                SELECT g.wid, g.pos, g.np, g.seg, k.j AS klen,
                       (CASE WHEN g.pos > 1 THEN '##' ELSE '' END
                        || substr(g.wid, g.pos, CAST(k.j AS INT)))
                           AS piece,
                       ROW_NUMBER() OVER (
                           PARTITION BY g.wid ORDER BY k.j DESC) AS rk
                FROM g{j - 1} g, UNNEST(range(1, {KMAX} + 1)) k(j)
                JOIN vocab v
                  ON v.piece = (CASE WHEN g.pos > 1 THEN '##' ELSE '' END
                                || substr(g.wid, g.pos, CAST(k.j AS INT)))
                WHERE NOT g.bad AND g.pos <= len(g.wid)
                  AND g.pos + k.j - 1 <= len(g.wid)
            ) WHERE rk = 1
        )""")
        parts.append(f"""g{j} AS MATERIALIZED (
            SELECT g.wid,
                   CASE WHEN g.bad OR g.pos > len(g.wid) THEN g.pos
                        WHEN m.wid IS NULL THEN g.pos
                        ELSE g.pos + CAST(m.klen AS INT) END AS pos,
                   CASE WHEN g.bad OR g.pos > len(g.wid) OR m.wid IS NULL
                        THEN g.np ELSE g.np + 1 END AS np,
                   CASE WHEN g.bad OR g.pos > len(g.wid) OR m.wid IS NULL
                        THEN g.seg ELSE g.seg || ' ' || m.piece END AS seg,
                   CASE WHEN g.bad THEN TRUE
                        WHEN g.pos > len(g.wid) THEN FALSE
                        WHEN m.wid IS NULL THEN TRUE
                        ELSE FALSE END AS bad
            FROM g{j - 1} g LEFT JOIN m{j} m ON m.wid = g.wid
        )""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT w.wid AS word, w.cnt,
               CAST(CASE WHEN g.bad THEN 1 ELSE g.np END AS BIGINT)
                   AS n_pieces,
               CASE WHEN g.bad THEN '[UNK]' ELSE substr(g.seg, 2) END
                   AS segmentation,
               g.bad AS is_unk
        FROM g{MAXLEN} g JOIN wcnt w ON w.wid = g.wid{topcols}"""
    )

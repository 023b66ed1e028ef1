"""Iterator-form scalar ``@pandas_udf`` factory (SCALAR_ITER).

NOTE: like functions/groupedagg.py, this module deliberately has NO
``from __future__ import annotations`` — pandas_udf infers the
SCALAR_ITER eval type from the real ``Iterator[pd.Series] ->
Iterator[pd.Series]`` signature, and stringified annotations are
unresolvable at decoration time.

The iterator form exists for ONE reason: per-worker one-time setup
(model weights, compiled automata, codebooks) amortized across every
Arrow batch the worker processes, instead of per-batch in the plain
scalar form. The setup here is just a compiled regex — a stand-in with
the same lifecycle as a real encoder load.

Factory form (round 7): built inside the factory so cloudpickle ships
the udf by value — executors never need this package importable (the
serialization contract in streaming/stateful.py).
"""

from typing import Iterator

import pandas as pd

from pyspark.sql.functions import pandas_udf


def make_alnum_count_iter():
    """Build the SCALAR_ITER udf: count of [a-z0-9] characters after
    lowercasing — computed with a regex compiled ONCE per python worker
    (the amortized-init seam), then applied vectorized per Arrow batch.
    Exact integer output, so the DuckDB twin
    (length(regexp_replace(lower(text), ...))) matches bit-for-bit."""

    @pandas_udf("long")
    def alnum_count_iter(
        batches: Iterator[pd.Series],
    ) -> Iterator[pd.Series]:
        import re

        strip_non_alnum = re.compile(r"[^a-z0-9]")
        for s in batches:
            yield (
                s.fillna("")
                .str.lower()
                .str.replace(strip_non_alnum, "", regex=True)
                .str.len()
                .astype("int64")
            )

    return alnum_count_iter

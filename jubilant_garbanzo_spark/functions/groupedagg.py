"""Grouped-aggregate ``@pandas_udf`` factory.

NOTE: this module deliberately has NO ``from __future__ import
annotations`` — pandas_udf infers the GROUPED_AGG eval type from the
REAL ``pd.Series -> scalar`` signature, and stringified annotations
(what the future import produces) are unresolvable at decoration time
(the modern alternative to the deprecated ``PandasUDFType`` enum).

Factory form (round 7): the udf is built INSIDE the factory so
cloudpickle ships the function by value — executors never need this
package importable (the serialization contract documented in
streaming/stateful.py; a module-level ``@pandas_udf`` pickles by
module reference).
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


def make_trimmed_mean_chars():
    """Build the per-group 10%-trimmed-mean GROUPED_AGG udf.

    The trim set is defined by the deterministic (n_chars, doc_id)
    order; the sum runs on exact int64 and the single int/int division
    is one IEEE double op — bit-identical to the SQL rank-window
    formulation on any engine (see ``pandas_grouped_agg_seam``).
    """

    @pandas_udf("double")
    def trimmed_mean_chars(n_chars: pd.Series, doc_id: pd.Series) -> float:
        df = pd.DataFrame({"n": n_chars, "d": doc_id}).sort_values(["n", "d"])
        k = len(df) // 10
        mid = df["n"].iloc[k : len(df) - k]
        return float(int(mid.sum()) / int(len(mid)))

    return trimmed_mean_chars

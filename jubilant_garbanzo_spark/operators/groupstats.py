"""Group-wise Pandas operators (``applyInPandas`` seam, SURVEY §2c).

This is the third and last Python seam next to ``mapInPandas``
(operators/multimodal.py) and ``applyInPandasWithState``
(streaming/stateful.py): whole-group computations that genuinely need
a dataframe library (rank statistics, model scoring, per-group
fitting). Arrow moves each group as a columnar batch; the shuffle is
the groupBy repartition — at 100 TB the group key must be chosen so
groups fit in executor memory (here: per-source statistics, ~10
groups of corpus/10 docs; for finer keys Spark splits automatically).

Cross-engine discipline: the only statistics used are DISCRETE
quantiles (numpy ``method='inverted_cdf'``), which match DuckDB's
``quantile_disc`` exactly (verified empirically: both pick the same
element for every n/q combination, unlike 'lower'/'linear'
interpolation) — so even this Python-side operator is value-hash
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

import numpy as np
import pandas as pd


def robust_scale_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "scaled",
) -> DataFrame:
    """Per-group robust scaling: ``(x − median) / max(IQR, 1)``.

    Median/quartiles are discrete (exact data elements, not
    interpolated) so every arithmetic input is an exact integer in
    double range, and the single division is bit-identical across
    engines. The IQR is clamped to ≥1 (documented) to keep degenerate
    groups (q1 == q3) NULL-free and engine-exact.
    """
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema += f", {out_col} double"

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf[value_col].to_numpy(dtype=np.float64)
        med = np.percentile(a, 50, method="inverted_cdf")
        q1 = np.percentile(a, 25, method="inverted_cdf")
        q3 = np.percentile(a, 75, method="inverted_cdf")
        denom = max(q3 - q1, 1.0)
        out = pdf.copy()
        out[out_col] = (a - med) / denom
        return out

    return df.groupBy(group_col).applyInPandas(scale, schema)

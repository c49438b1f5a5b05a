"""The engine's Python-UDF surface (SURVEY.md §2.10).

The reference applies one true scalar UDF (``assign_age_group``,
analyse.py:34-44) and two hand-rolled per-group loops (analyse.py:254-281,
445-478). The engine's native paths replace all three with column
expressions / min_by aggregation — but a real engine must still expose an
escape hatch for non-SQL-expressible logic. These are the two sanctioned
shapes, each Arrow-vectorized (never row-at-a-time Python):

- scalar: ``pandas_udf`` Series→Series
- grouped-map: ``applyInPandas`` per-group DataFrame→DataFrame

Both worked examples reproduce native operators exactly, so tests can
differential-check the UDF surface against the codegen path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# NB: the return type must be a DataType instance, not a DDL string — string
# parsing would require an active SparkSession at import time.
@F.pandas_udf(T.StringType())
def age_group_pandas_udf(age: pd.Series) -> pd.Series:
    """Arrow-vectorized equivalent of functions.scalars.age_group (F3)."""
    out = pd.Series([None] * len(age), dtype="object")
    out[(age >= 18) & (age <= 19)] = "18-19"
    out[(age >= 20) & (age <= 25)] = "20-25"
    out[age >= 26] = "26+"
    return out


def first_last_apply_in_pandas(
    df: DataFrame,
    group_keys: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Grouped-map equivalent of operators.first_last_by_order (A4) — the
    escape-hatch shape for per-group logic Spark aggregates can't express.
    Output schema matches the native operator's core columns."""
    schema = (
        ", ".join(f"{k} string" for k in group_keys)
        + f", first_value double, last_value double, first_order double, last_order double, n_rows long"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        return pd.DataFrame(
            {
                **{k: [str(pdf[k].iloc[0])] for k in group_keys},
                "first_value": [float(pdf[value_col].iloc[0])],
                "last_value": [float(pdf[value_col].iloc[-1])],
                "first_order": [float(pdf[order_col].iloc[0])],
                "last_order": [float(pdf[order_col].iloc[-1])],
                "n_rows": [len(pdf)],
            }
        )

    return df.groupBy(*group_keys).applyInPandas(fn, schema=schema)


def tokenize_udtf_class():
    """The engine's UDTF surface (SURVEY.md §2.10 'UDTF: available if
    needed'): a table function emitting (position, token) per input text,
    lazily registered so importing this module never needs a live session.
    Matches ``posexplode(tokens(text))`` exactly — the catalog entry
    differential-checks the UDTF path against that SQL."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            pos = 0
            for tok in text.strip().lower().split():
                if tok:
                    yield pos, tok
                    pos += 1

    return Tokenize

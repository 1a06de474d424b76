"""NotSoMagicFrame — the pandas facade (reference NotSoMagicTable,
notsomagictable.py:6-57: a pandas-typed view that delegates the magic
methods back to the real table).

The reference facade calls several methods that never existed
(from_polars/join_with_query/clear_all_data — dead aspirational API,
SURVEY §2.A). Here the facade is honest: `to_pandas()` is an
Arrow-batched collect (driver-memory bounded — guard with a row cap),
and every magic method (chain/transform) executes distributed on the
underlying MagicFrame before conversion.
"""

from __future__ import annotations

import pandas as pd

from magictables_spark.frame import MagicFrame


class NotSoMagicFrame:
    """Pandas-facing view over a MagicFrame. Collects via Arrow on
    demand; mutating/magic operations run distributed first."""

    DEFAULT_ROW_CAP = 1_000_000

    def __init__(self, mf: MagicFrame, row_cap: int = DEFAULT_ROW_CAP):
        self._mf = mf
        self._row_cap = row_cap

    @classmethod
    def from_pandas(cls, spark, pdf: pd.DataFrame) -> "NotSoMagicFrame":
        from magictables_spark.identity import raw_data_id

        sid = raw_data_id(pdf.to_dict(orient="records"))
        return cls(MagicFrame(spark.createDataFrame(pdf), sources=[sid]))

    @property
    def magic(self) -> MagicFrame:
        return self._mf

    def to_pandas(self) -> pd.DataFrame:
        """Arrow-batched collect, capped: an uncapped toPandas on a
        100 TB table is a driver OOM, not a conversion."""
        df = self._mf.df
        if self._row_cap is not None:
            df = df.limit(self._row_cap)
        return df.toPandas()

    # -- delegated magic (stays distributed) --------------------------------

    def chain(self, url_template: str, **kw) -> "NotSoMagicFrame":
        return NotSoMagicFrame(self._mf.chain(url_template, **kw), self._row_cap)

    def transform(self, query: str, **kw) -> "NotSoMagicFrame":
        return NotSoMagicFrame(self._mf.transform(query, **kw), self._row_cap)

    def join_with_query(self, other: "NotSoMagicFrame", query: str, **kw) -> "NotSoMagicFrame":
        """NL-described join — dead API in the reference facade
        (notsomagictable.py:21), real here (llm.nl_join)."""
        other_mf = other._mf if isinstance(other, NotSoMagicFrame) else other
        return NotSoMagicFrame(self._mf.join_with_query(other_mf, query, **kw), self._row_cap)

    def __getattr__(self, attr):
        # everything else: delegate to MagicFrame (which delegates to the
        # Spark DataFrame); re-wrap MagicFrame results
        value = getattr(self._mf, attr)
        if callable(value):

            def wrapped(*args, **kwargs):
                result = value(*args, **kwargs)
                if isinstance(result, MagicFrame):
                    return NotSoMagicFrame(result, self._row_cap)
                return result

            return wrapped
        return value

    def __repr__(self) -> str:
        return f"NotSoMagicFrame({self._mf!r})"

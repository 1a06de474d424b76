"""MagicFrame — the engine's table abstraction.

The reference's ``MagicTable`` subclasses ``polars.DataFrame`` and
monkey-patches every public Polars method so results stay MagicTables
(reference: magictables/magictable.py:39, 451-459). Spark DataFrames
are not designed for subclassing, so MagicFrame *wraps* a
``pyspark.sql.DataFrame`` and forwards every attribute via
``__getattr__``: any method that returns a DataFrame is re-wrapped,
preserving provenance — the same closure property, Spark-idiomatically
lazy (nothing executes until an action).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from magictables_spark.identity import table_name


class MagicFrame:
    """A provenance-carrying wrapper over a lazy Spark DataFrame.

    Attributes:
        df: the underlying ``pyspark.sql.DataFrame`` (lazy logical plan).
        sources: provenance source-ids in application order (§1.4 of SURVEY).
        name: provenance-derived identity, ``"_".join(sources)``.
    """

    def __init__(self, df: DataFrame, sources: list[str] | None = None, name: str | None = None):
        object.__setattr__(self, "df", df)
        object.__setattr__(self, "sources", list(sources or []))
        object.__setattr__(self, "name", name if name is not None else table_name(self.sources))

    # -- closure property: every DataFrame-returning method stays magic ----

    def __getattr__(self, attr: str) -> Any:
        value = getattr(object.__getattribute__(self, "df"), attr)
        if callable(value):

            def wrapped(*args: Any, **kwargs: Any) -> Any:
                args = [a.df if isinstance(a, MagicFrame) else a for a in args]
                kwargs = {k: (v.df if isinstance(v, MagicFrame) else v) for k, v in kwargs.items()}
                result = value(*args, **kwargs)
                if isinstance(result, DataFrame):
                    return MagicFrame(result, sources=self.sources, name=self.name)
                return result

            return wrapped
        return value

    def __repr__(self) -> str:
        return f"MagicFrame(name={self.name!r}, schema={self.df.schema.simpleString()})"

    # -- reference-parity helpers ------------------------------------------

    @property
    def spark(self) -> SparkSession:
        return self.df.sparkSession

    def summary_meta(self) -> dict:
        """Shape + schema + first row, the reference's prompt context
        (magictable.py:145-146). One count + one first(): two cheap actions."""
        first = self.df.first()
        return {
            "rows": self.df.count(),
            "columns": self.df.columns,
            "dtypes": dict(self.df.dtypes),
            "first_row": first.asDict(recursive=True) if first is not None else None,
        }

    def to_view(self, view_name: str | None = None) -> str:
        """Register as a temp view so ``spark.sql`` reaches it (the SQL
        entry point the reference lacks, SURVEY §2.C)."""
        safe = view_name or ("t_" + self.name[:32] if self.name else "t_anon")
        self.df.createOrReplaceTempView(safe)
        return safe

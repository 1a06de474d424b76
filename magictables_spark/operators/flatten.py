"""Schema-recursive JSON flattener — the reference's `json_flatten`.

Reference semantics (magictables/utils.py:36-80, reimplemented
Spark-natively, no code copied):

- scalars keep their name;
- nested struct fields become dotted columns ``parent.child``
  (recursively);
- each array field is exploded — one output row per element, with
  top-level scalars repeated (broadcast) onto each child row;
- SIBLING arrays each produce their OWN row set, unioned (reference
  emits one row per element per list with the other list keys absent —
  never a cross-product of sibling elements; absent keys surface as
  nulls in the fixed DataFrame schema);
- arrays of structs explode then flatten with dotted names;
- empty/null arrays keep one row with nulls (reference keeps the parent
  row; Spark's plain ``explode`` would drop it, so ``explode_outer``).

Where the reference walks Python dicts row by row, this walks the
**schema** once on the driver and emits a declarative
select/explode_outer plan — Catalyst sees ordinary columns, so pushdown
and codegen still apply; nothing touches Python at runtime.

Divergence (documented, SURVEY §7.3): the reference derives field order
from a Python ``set`` union (nondeterministic); we sort exploded field
names so output schemas are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def flatten(df: DataFrame, sep: str = ".", explode_arrays: bool = True) -> DataFrame:
    """Flatten every struct to dotted columns; explode arrays (outer).

    A level with several sibling array columns yields the UNION of one
    exploded row set per array (elements of the others null) — the
    reference's one-row-per-element-per-list semantics, never a
    cross-product of sibling elements. Recurses until no struct/array
    columns remain.
    """
    while True:
        # 1. flatten all structs (no row-count change)
        cols: list[Column] = []
        has_struct = False
        for f in df.schema.fields:
            if isinstance(f.dataType, StructType):
                has_struct = True
                for sub in f.dataType.fields:
                    cols.append(F.col(f"`{f.name}`.`{sub.name}`").alias(f"{f.name}{sep}{sub.name}"))
            else:
                cols.append(F.col(f"`{f.name}`"))
        if has_struct:
            df = df.select(*cols)
            continue

        if not explode_arrays:
            return df

        array_cols = sorted(f.name for f in df.schema.fields if isinstance(f.dataType, ArrayType))
        if not array_cols:
            return df
        if len(array_cols) == 1:
            # 2a. single array: plain outer explode
            target = array_cols[0]
            others = [F.col(f"`{c}`") for c in df.columns if c != target]
            df = df.select(*others, F.explode_outer(F.col(f"`{target}`")).alias(target))
            continue
        # 2b. sibling arrays: one branch per array (union preserves the
        # reference's row semantics; a single downstream union is one
        # plan node — each branch still reads the same child subtree, so
        # Catalyst/AQE can reuse the exchange underneath)
        types = {f.name: f.dataType for f in df.schema.fields}
        branches = []
        for target in array_cols:
            sel = []
            for c in df.columns:
                if c == target:
                    sel.append(F.explode_outer(F.col(f"`{c}`")).alias(c))
                elif c in array_cols:
                    # other lists absent on this branch (reference drops
                    # their keys; fixed schema -> typed null element)
                    sel.append(F.lit(None).cast(types[c].elementType).alias(c))
                else:
                    sel.append(F.col(f"`{c}`"))
            branches.append(df.select(*sel))
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        df = out


def flatten_json_column(df: DataFrame, json_col: str, sep: str = ".") -> DataFrame:
    """Parse a JSON-string column (schema inferred from the data) and
    flatten the result into dotted columns alongside the other columns.

    Schema inference samples the column once (driver-side aggregation of
    ``schema_of_json`` candidates is O(1 row)); at 100 TB pass an explicit
    schema instead via ``F.from_json`` upstream.
    """
    sample = df.select(json_col).filter(F.col(json_col).isNotNull()).first()
    if sample is None:
        return df
    schema = F.schema_of_json(F.lit(sample[0]))
    parsed = df.withColumn(json_col, F.from_json(F.col(json_col), schema))
    return flatten(parsed, sep=sep)

"""Differential test: the Spark json_flatten vs an independent pure-
Python model of the documented semantics (operators/flatten.py header,
mirroring reference utils.py:36-80):

- structs expand to dotted names in field order (None struct -> None
  children);
- a single array column outer-explodes (None/[] keeps one null row);
- SIBLING arrays produce one branch per array in sorted-name order,
  the other arrays' elements typed-null, branches unioned;
- the loop repeats until no struct/array columns remain.

Hypothesis generates random schemas (depth <= 3) and conforming rows;
the model is written against the SPEC above, not the implementation,
so a divergence in either direction fails.
"""

from __future__ import annotations

import pyspark.sql.types as T
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from magictables_spark.operators.flatten import flatten

# ---------------------------------------------------------------------------
# schema descriptors: ("int",) ("str",) ("struct", [(name, d), ...]) ("array", d)
# ---------------------------------------------------------------------------


def _desc(depth: int):
    scalar = st.sampled_from([("int",), ("str",)])
    if depth <= 0:
        return scalar
    sub = _desc(depth - 1)
    return st.one_of(
        scalar,
        st.lists(sub, min_size=1, max_size=2).map(
            lambda ds: ("struct", [(f"f{i}", d) for i, d in enumerate(ds)])
        ),
        sub.map(lambda d: ("array", d)),
    )


def _value(d, rnd: st.DataObject):
    kind = d[0]
    if kind == "int":
        return rnd.draw(st.one_of(st.none(), st.integers(-5, 5)))
    if kind == "str":
        return rnd.draw(st.one_of(st.none(), st.sampled_from(["x", "y", ""])))
    if kind == "struct":
        if rnd.draw(st.booleans()):
            return None
        return tuple(_value(sub, rnd) for _, sub in d[1])
    # array
    if rnd.draw(st.booleans()):
        n = rnd.draw(st.integers(0, 2))
        return [_value(d[1], rnd) for _ in range(n)]
    return None


def _spark_type(d):
    kind = d[0]
    if kind == "int":
        return T.IntegerType()
    if kind == "str":
        return T.StringType()
    if kind == "struct":
        return T.StructType([T.StructField(n, _spark_type(sub)) for n, sub in d[1]])
    return T.ArrayType(_spark_type(d[1]))


# ---------------------------------------------------------------------------
# the model: rows are dicts col -> python value, schema dict col -> desc
# ---------------------------------------------------------------------------


def model_flatten(rows, schema):
    rows = [dict(r) for r in rows]
    schema = dict(schema)
    while True:
        struct_cols = [c for c, d in schema.items() if d[0] == "struct"]
        if struct_cols:
            new_schema, order = {}, list(schema)
            for c in order:
                if schema[c][0] == "struct":
                    for n, sub in schema[c][1]:
                        new_schema[f"{c}.{n}"] = sub
                else:
                    new_schema[c] = schema[c]
            new_rows = []
            for r in rows:
                nr = {}
                for c in order:
                    if schema[c][0] == "struct":
                        v = r[c]
                        for i, (n, _sub) in enumerate(schema[c][1]):
                            nr[f"{c}.{n}"] = None if v is None else v[i]
                    else:
                        nr[c] = r[c]
                new_rows.append(nr)
            rows, schema = new_rows, new_schema
            continue
        arrays = sorted(c for c, d in schema.items() if d[0] == "array")
        if not arrays:
            return rows, schema
        branches = []
        for target in arrays:
            for r in rows:
                elems = r[target]
                elems = [None] if not elems else elems  # outer explode
                for e in elems:
                    nr = {}
                    for c in schema:
                        if c == target:
                            nr[c] = e
                        elif c in arrays:
                            nr[c] = None  # sibling array absent on branch
                        else:
                            nr[c] = r[c]
                    branches.append(nr)
        rows = branches
        schema = {c: (d[1] if c in arrays else d) for c, d in schema.items()}


# ---------------------------------------------------------------------------


def _canon(v):
    if isinstance(v, tuple):
        return tuple(_canon(x) for x in v)
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=st.data())
def test_flatten_matches_model(spark, data):
    descs = data.draw(st.lists(_desc(2), min_size=1, max_size=3))
    schema = {f"c{i}": d for i, d in enumerate(descs)}
    n_rows = data.draw(st.integers(1, 3))
    rows = [
        {c: _value(d, data) for c, d in schema.items()} for _ in range(n_rows)
    ]

    spark_schema = T.StructType(
        [T.StructField(c, _spark_type(d)) for c, d in schema.items()]
    )
    df = spark.createDataFrame(
        [tuple(r[c] for c in schema) for r in rows], spark_schema
    )
    out = flatten(df)

    m_rows, m_schema = model_flatten(rows, schema)
    assert sorted(out.columns) == sorted(m_schema)

    cols = sorted(m_schema)
    got = sorted(
        (tuple(_canon(r[c]) for c in cols) for r in (row.asDict() for row in out.collect())),
        key=repr,
    )
    want = sorted((tuple(_canon(r[c]) for c in cols) for r in m_rows), key=repr)
    assert got == want

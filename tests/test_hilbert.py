"""hilbert_cluster_key: the unrolled xy2d walk must agree with an
independent Python implementation of the Hilbert curve on every grid
cell present in the fixture, and the curve itself must be CONTINUOUS
(consecutive indices are Manhattan-adjacent cells — the locality
property that makes Hilbert ranges tighter than Morton's).
"""

from __future__ import annotations

from pyspark.sql import functions as F

N = 256  # 8-bit grid


def _xy2d(x: int, y: int) -> int:
    d = 0
    s = N // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _d2xy(d: int) -> tuple[int, int]:
    x = y = 0
    t = d
    s = 1
    while s < N:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def test_curve_is_continuous():
    """The defining Hilbert property, checked on the whole 2^16 curve
    with the reference implementation this test also validates the
    Spark plan against."""
    px, py = _d2xy(0)
    for d in range(1, N * N):
        x, y = _d2xy(d)
        assert abs(x - px) + abs(y - py) == 1, (d, (px, py), (x, y))
        px, py = x, y
    # and d2xy really inverts xy2d
    for d in (0, 1, 255, 4095, 65535, 32768, 12345):
        assert _xy2d(*_d2xy(d)) == d


def test_spark_walk_matches_reference(spark, sf_dir):
    """Every distinct (x, y) cell the fixture touches, keyed by the
    cell itself (lineitem's (orderkey, linenumber) is not unique, so
    the frame is driven off distinct coordinate rows — the walk only
    reads l_partkey/l_suppkey)."""
    from magictables_spark.plans.pretrain_pack import _hilbert_key_frame

    cells = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            F.expr("l_partkey % 256").alias("x"),
            F.expr("l_suppkey % 256").alias("y"),
        )
        .distinct()
        .select(
            F.col("x").alias("l_orderkey"),
            F.col("y").alias("l_linenumber"),
            F.col("x").alias("l_partkey"),
            F.col("y").alias("l_suppkey"),
        )
    )
    got = _hilbert_key_frame(cells).collect()
    assert got
    for r in got:
        assert r.hkey == _xy2d(r.l_orderkey, r.l_linenumber), (
            r.l_orderkey,
            r.l_linenumber,
            r.hkey,
        )


def test_hilbert_ranges_cut_tighter_boxes_than_morton():
    """The locality claim, measured: over UNALIGNED equal-size index
    ranges (aligned power-of-4 ranges are perfect quadrants for both
    curves), Hilbert's continuity yields strictly smaller mean
    bounding boxes than Morton's quadrant jumps (measured 384 vs 512
    cells for 256-cell ranges) — the property that makes Hilbert file
    ranges prune more 2-D predicates at the same file count."""
    import statistics

    def d2xy_z(d):
        x = y = 0
        for b in range(8):
            x |= ((d >> (2 * b)) & 1) << b
            y |= ((d >> (2 * b + 1)) & 1) << b
        return x, y

    def mean_area(f):
        areas = []
        for start in range(128, 65536 - 256, 512):
            pts = [f(d) for d in range(start, start + 256)]
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            areas.append((max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1))
        return statistics.mean(areas)

    h, z = mean_area(_d2xy), mean_area(d2xy_z)
    assert h < z, (h, z)

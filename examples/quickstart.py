"""End-to-end quickstart — the reference's README flow, fully offline.

Mirrors what a lekt9/magictables user does (reference README.md:25-90):
ingest a source, enrich it row-by-row against an API ("chain"),
transform it with a natural-language query, and get caching + lineage
for free — then goes where the reference only gestures: dedup,
similarity search, and funnel analytics over the test fixtures.

Everything runs offline: the API is a local closure fetcher, the LLM
is a scripted mock. Swap `fetcher=` for a real HTTP function and
`llm=` for `litellm_client()` to go live.

Run:  python examples/quickstart.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from magictables_spark.frame import MagicFrame
from magictables_spark.llm import MockLLM
from magictables_spark.session import get_spark
from magictables_spark.sources import RawSource
from magictables_spark.warehouse import Warehouse

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    wh = Warehouse(tempfile.mkdtemp(prefix="quickstart_wh_"))

    # 1. ingest: list-of-dicts -> cached, lineage-tracked frame ----------
    movies = MagicFrame.from_source(
        spark,
        RawSource(
            [
                {"movie_id": 1, "title": "Alpha", "rating": 8.1},
                {"movie_id": 2, "title": "Beta", "rating": 9.2},
                {"movie_id": 3, "title": "Gamma", "rating": 7.4},
            ]
        ),
        warehouse=wh,
    )
    print("ingested:", movies.df.columns, movies.df.count(), "rows")

    # 2. chain: per-row API enrichment join (distributed fetch + cache) --
    def fake_api(url: str, params=None) -> dict:  # closure: pickled to workers
        movie_id = int(url.rsplit("/", 1)[-1])
        return {"box_office": movie_id * 100, "country": "US"}

    enriched = movies.chain(
        "http://api.example.com/movies/{movie_id}", fetcher=fake_api, warehouse=wh
    )
    print("chained:", [c for c in enriched.df.columns if c.startswith("api_")])

    # 3. transform: natural language -> validated Spark SQL (cached) ----
    llm = MockLLM(
        ["```sql\nSELECT title, rating, api_box_office AS box_office "
         "FROM df WHERE rating > 8 ORDER BY rating DESC\n```"]
    )
    top = enriched.transform("top movies by rating with box office", llm=llm, warehouse=wh)
    for row in top.df.collect():
        print("top:", row.asDict())
    # second call: served from the warehouse code cache, zero LLM calls
    again = enriched.transform("top movies by rating with box office", llm=None, warehouse=wh)
    assert again.df.count() == top.df.count()
    print("transform cache: second run used 0 LLM calls")

    # 3b. the non-LLM twin: hand-written SQL over the same frame --------
    manual = enriched.sql(
        "SELECT title, rating FROM df WHERE rating > 8 ORDER BY rating DESC"
    )
    assert manual.df.count() == top.df.count()
    print("direct sql: same rows as the NL transform")

    # 4. the scale layer: fixture-backed analytics operators ------------
    from magictables_spark.plans.queries import REGISTRY

    for slug in ["dedup_exact", "sim_cosine_topk", "funnel_conversion"]:
        out = REGISTRY[slug].fn(spark, SF_DIR)
        print(f"{slug}: {out.count()} rows, e.g. {out.limit(1).collect()}")

    print("lineage chains recorded:", len(wh.get_chains()))
    print("OK")


if __name__ == "__main__":
    main()

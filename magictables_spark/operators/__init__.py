"""Custom operators — compositions of built-in DataFrame ops (SURVEY
§7.4: the only custom layers are the chain fetch stage, the flattener,
and the scale helpers; everything else is Catalyst's job).
"""

from magictables_spark.operators.asof import asof_join
from magictables_spark.operators.chain import chain_enrich, fetch_urls, url_expr
from magictables_spark.operators.embed import embed_texts, hash_embedder
from magictables_spark.operators.flatten import flatten, flatten_json_column
from magictables_spark.operators.multimodal import extract_features, read_media
from magictables_spark.operators.scale import bucketed_join, salted_join, write_bucketed

__all__ = [
    "asof_join",
    "bucketed_join",
    "chain_enrich",
    "embed_texts",
    "extract_features",
    "fetch_urls",
    "flatten",
    "flatten_json_column",
    "hash_embedder",
    "read_media",
    "salted_join",
    "url_expr",
    "write_bucketed",
]

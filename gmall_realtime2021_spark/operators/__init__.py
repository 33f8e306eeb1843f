"""Reusable operator builders (the engine's public operator API).

Each builder takes DataFrames/columns and returns a DataFrame — pure
logical-plan construction, no actions — so Catalyst sees one
composable plan and can push filters/prune columns across operator
boundaries. The ``plans`` package instantiates these on the test
star schema with oracle twins.
"""

from gmall_realtime2021_spark.operators.dedup import (
    exact_dedup_summary,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from gmall_realtime2021_spark.operators.routing import route_by_config
from gmall_realtime2021_spark.operators.similarity import cosine_topk, lsh_bucket_topk

__all__ = [
    "cosine_topk",
    "exact_dedup_summary",
    "lsh_bucket_topk",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "route_by_config",
    "simhash_fingerprints",
]

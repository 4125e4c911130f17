"""Large-scale training-data pipeline operators (beyond-parity
surface, BASELINE.json north star): dedup families, similarity
search, text analysis, multimodal column plumbing.

Design: everything is expressed as DataFrame ops (explode / join /
groupBy / higher-order array functions) so the same code shuffles
correctly on a 1000-executor cluster. Hashes are md5-derived so an
independent SQL engine (the DuckDB oracle) reproduces them bit-for-bit.
"""

from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
    pack_assignments,
    prune_boilerplate,
    shuffle_shards,
    stratified_sample,
)
from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
    exact_duplicate_groups,
    lsh_candidate_pairs,
    minhash_bands,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
    brute_force_neighbors,
    ivf_assignments,
    ivf_topk_neighbors,
)

__all__ = [
    "pack_assignments",
    "prune_boilerplate",
    "shuffle_shards",
    "stratified_sample",
    "exact_duplicate_groups",
    "lsh_candidate_pairs",
    "minhash_bands",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "brute_force_neighbors",
    "ivf_assignments",
    "ivf_topk_neighbors",
]

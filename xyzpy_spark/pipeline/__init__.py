from .text import (
    add_fingerprint,
    add_language_id,
    add_quality,
    add_repetition,
    add_token_count,
    tokenize,
)
from .dedup import (
    dedup_exact,
    embedding_cosine_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_64,
    simhash_near_pairs,
)
from .export import read_training_shards, write_training_shards
from .similarity import cosine_topk, ivf_build, ivf_topk

__all__ = [
    "add_fingerprint",
    "add_repetition",
    "add_language_id",
    "add_quality",
    "add_token_count",
    "tokenize",
    "dedup_exact",
    "embedding_cosine_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_64",
    "simhash_near_pairs",
    "cosine_topk",
    "ivf_build",
    "ivf_topk",
    "read_training_shards",
    "write_training_shards",
]

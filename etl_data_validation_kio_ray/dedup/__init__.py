from .exact import dedup_exact, exact_dup_groups
from .minhash import minhash_dedup_pairs, add_minhash_bands
from .simhash import simhash_dedup_pairs
from .ngram import jaccard_pairs_exact
from .embedding import embedding_dup_pairs

__all__ = [
    "dedup_exact",
    "exact_dup_groups",
    "minhash_dedup_pairs",
    "add_minhash_bands",
    "simhash_dedup_pairs",
    "jaccard_pairs_exact",
    "embedding_dup_pairs",
]

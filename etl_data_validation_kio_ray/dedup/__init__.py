from .exact import dedup_exact, exact_dup_groups
from .minhash import minhash_dedup_pairs, add_minhash_bands
from .simhash import simhash_dedup_pairs
from .ngram import cross_corpus_contamination, jaccard_pairs_exact, semi_join_docs
from .embedding import embedding_dup_pairs

__all__ = [
    "dedup_exact",
    "exact_dup_groups",
    "minhash_dedup_pairs",
    "add_minhash_bands",
    "simhash_dedup_pairs",
    "jaccard_pairs_exact",
    "cross_corpus_contamination",
    "semi_join_docs",
    "embedding_dup_pairs",
]

"""Scalar/array function surface (SURVEY.md §2.10) — all JVM-side exprs."""

from metadata_enhanced_pretrain_datapipeline_spark.functions.hashing import (
    hash_bucket,
    lin_hash,
    md5_hash64,
    minhash_expr,
)
from metadata_enhanced_pretrain_datapipeline_spark.functions.arrays import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
from metadata_enhanced_pretrain_datapipeline_spark.functions.text import (
    char_ngrams,
    quality_stats,
    token_count_regex,
    tokens_ws,
    word_shingles,
)
from metadata_enhanced_pretrain_datapipeline_spark.functions.urlf import url_host, url_path, url_suffix

__all__ = [
    "hash_bucket",
    "lin_hash",
    "md5_hash64",
    "minhash_expr",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "char_ngrams",
    "quality_stats",
    "token_count_regex",
    "tokens_ws",
    "word_shingles",
    "url_host",
    "url_path",
    "url_suffix",
]

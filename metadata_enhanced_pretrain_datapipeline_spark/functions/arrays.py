"""Vector math over array<float> columns — JVM-side, no UDFs.

Used by the embedding-scoring operators (reference
embeddings_filter.py:44-55 runs a torch MLP; our linear/cosine scorers keep
the hot path inside whole-stage codegen, and the true-MLP path lives in
operators/annotators.py as an Arrow-batched pandas UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (codegen'd, no Python)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """NULL (not ANSI DIVIDE_BY_ZERO) for zero-norm vectors — one all-zero
    embedding must not abort a corpus-wide top-k/near-dup job; NULL cosines
    sort last under desc()."""
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))


def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """:func:`cosine_similarity` with the norms hoisted: bit-identical to
    ``cosine_similarity(a, b)`` whenever ``na``/``nb`` are
    ``l2_norm(a)``/``l2_norm(b)`` — the same expressions evaluated on the
    same values, just factored out of a pair join so each VECTOR's norm is
    computed once per row instead of once per candidate pair (the
    higher-order-function fold is interpreted, so a k-wide vector in an
    n-pair join otherwise pays 2·k·n interpreted ops for norms alone)."""
    return F.try_divide(dot_product(a, b), na * nb)


def positional_dot(a: Column, weight_of_pos) -> Column:
    """Σ aᵢ·w(i) with a deterministic position-dependent weight function —
    the oracle-checkable linear scorer standing in for the MLP
    (embeddings_filter.py:44-55). ``weight_of_pos`` maps a 0-based index
    Column to a weight Column."""
    n = F.size(a)
    # sequence(0, -1) DESCENDS for empty arrays and zip_with null-pads, so
    # the aggregate would return NULL (0.0 + NULL) instead of 0.0 — guard
    # EMPTY arrays to the explicit empty-sum 0.0, but propagate NULL for
    # NULL arrays (a missing embedding must not score 0.0 and slip past
    # threshold filters, matching cosine_similarity's null behavior)
    dot = F.aggregate(
        F.zip_with(
            a,
            F.sequence(F.lit(0), n - F.lit(1)),
            lambda v, i: v.cast("double") * weight_of_pos(i),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(n > 0, dot).when(a.isNotNull(), F.lit(0.0))

"""Python UDTF surface (SURVEY §2.12): the reference's
``PipelineStep.run(generator) -> generator`` steps may yield 0..n rows
per input Document (paradocs.py:41-46 yields 2; filters yield 0/1).
The engine's SCALE mapping for that shape is `explode` over array
expressions or Arrow-batched ``mapInPandas`` (both used throughout);
this module exercises the remaining API box — Spark 4's native Python
UDTF — so a user porting a row-generator step literally can, with the
honest caveat that UDTFs are row-at-a-time Python (no Arrow batching):
fine for control-plane fan-out, NOT for the 100 TB hot path.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="win_idx int, excerpt string, n_words int")
class ExcerptWindows:
    """Yield every FULL sliding window of ``width`` words (stride
    ``stride``) of the input text — the excerpt-generation generator
    shape (gutenberg create_excerpt.py), 0 rows for short docs."""

    def eval(self, text: str, width: int, stride: int):
        # validate eagerly: a bad stride would otherwise surface as an
        # opaque worker-side range() error mid-job
        if width is None or stride is None or width <= 0 or stride <= 0:
            raise ValueError(
                f"excerpt_windows: width and stride must be positive "
                f"(got width={width}, stride={stride})")
        if not text:
            return
        # whitespace-run tokenization, matching the engine's tokens_ws
        # convention (NOT single-space split) — the oracle uses the same
        words = text.split()
        idx = 0
        for start in range(0, len(words) - width + 1, stride):
            piece = words[start:start + width]
            yield idx, " ".join(piece), len(piece)
            idx += 1


def register_table_functions(spark) -> None:
    """Register the UDTF family for SQL use (lateral joins):
    ``SELECT d.doc_id, w.* FROM docs d, LATERAL excerpt_windows(d.text, 10, 5) w``."""
    spark.udtf.register("excerpt_windows", ExcerptWindows)

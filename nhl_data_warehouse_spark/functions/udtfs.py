"""Python UDTFs (Spark 4 user-defined table functions).

The reference has zero UDF/UDTF surface (SURVEY.md §2.8) — its only
table function is Snowflake's built-in ``lateral flatten``, which maps
to native ``explode``. This module demonstrates the engine's *custom*
table-function path for logic Spark expressions genuinely can't
express (imperative per-row fan-out with arbitrary Python in the
loop).

Performance stance: a Python UDTF is the slow path — rows cross the
JVM/Python boundary per batch. Everything tokenizer-shaped in the hot
pipeline uses native ``split``/``explode`` (see ``explode_tokens``,
``operators/text.py``); the UDTF exists so the capability is real,
tested, and benchmarked, and its docstring says when NOT to use it.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string")
class PositionalTokenize:
    """Split a text on single spaces, yielding one row per token with
    its 0-based position — the same contract as native
    ``posexplode(split(text, ' '))``, kept expression-equivalent so
    correctness can be cross-checked against the relational form (and
    so the cost of choosing a UDTF over the native op is measurable
    like-for-like)."""

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            if tok:
                yield i, tok


def register_all(spark) -> None:
    """Register every UDTF for SQL lateral use
    (``... FROM t, LATERAL positional_tokenize(text)``)."""
    spark.udtf.register("positional_tokenize", PositionalTokenize)

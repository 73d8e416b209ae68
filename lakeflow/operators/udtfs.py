"""Python UDTF surface (SURVEY §2.11): one-to-many custom expansion.

Policy: built-ins first (explode/posexplode cover the reference's only
expansion, N7); a UDTF is the escape hatch when the expansion logic is
genuinely imperative. These are Arrow-optimized but still the slow path
— never put one on a 100 TB hot path that a built-in can express.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="word: string, pos: int, is_stop: boolean")
class TokenizeWithFlags:
    """Demo UDTF: token stream with positions and a stopword flag —
    the one-to-many shape (text -> token rows) a built-in explode chain
    can also produce; kept as the reference UDTF pattern."""

    STOP = {"the", "a", "of", "is", "and", "to", "in"}

    def eval(self, text: str):  # noqa: D102
        for i, w in enumerate((text or "").split()):
            yield (w, i, w.lower() in self.STOP)


def register_udtfs(spark) -> None:
    spark.udtf.register("tokenize_with_flags", TokenizeWithFlags)

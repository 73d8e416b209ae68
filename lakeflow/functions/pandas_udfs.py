"""Arrow-vectorized pandas UDFs (SURVEY §2.11).

Policy: built-ins first — every reference "UDF" (pandas ``apply``
lambdas for JSON parse/serialize) maps to a built-in (§2.8 F7), and the
whole declared query surface uses zero Python in the hot path. When
Python IS unavoidable (external libraries, imperative logic), use
``@pandas_udf`` (Arrow batches, ~10-100x over row-at-a-time UDFs) or
``mapInPandas``/``applyInPandas`` for grouped/multi-column logic
(see lakeflow.operators.multimodal).

``quality_score_pandas`` mirrors lakeflow.operators.text.quality_score
so tests can assert the two paths agree — demonstrating the pattern
without putting Python on the hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

_STOP = {"the", "a", "of", "is", "and", "to", "in", "for", "on", "with"}


# returnType as a DataType instance: a DDL string would be parsed at
# import time, which requires an active SparkSession
@pandas_udf(DoubleType())
def quality_score_pandas(text: pd.Series) -> pd.Series:
    import re

    # mirror the JVM path EXACTLY: Java's \s and [^a-zA-Z0-9 ] are
    # ASCII classes — Python's unicode-aware isalnum()/str.split() would
    # diverge on accented/nbsp characters (caught by a verify probe)
    ws = re.compile(r"\s+", re.ASCII)  # Python \s is unicode-aware without ASCII
    bad_re = re.compile(r"[^a-zA-Z0-9 ]")

    def score(t: str) -> float:
        toks = [w for w in ws.split(t.strip()) if w] or [""]
        nt = len(toks)
        bad = len(bad_re.findall(t))
        stop = sum(1 for w in toks if w in _STOP)
        return (
            0.4 * min(len(toks) / 100.0, 1.0)
            + 0.3 * (1.0 - bad / max(len(t), 1))
            + 0.3 * min(stop / nt * 5.0, 1.0)
        )

    return text.map(score)

"""Int8 scalar quantization for embedding columns (SURVEY §2.12).

At 100 TB an `array<float>` embedding column is usually the widest
thing in the table: 64 dims x 4 bytes = 256 B/row before compression.
Symmetric per-dimension int8 quantization cuts the ANN serving scan 4x
(codes are `array<tinyint>`-shaped longs here; a sink would pack them)
at a recall cost this module makes MEASURABLE — the certification
queries report per-dimension reconstruction error and exact top-k
recall of the quantized index against the float index, so the 4x is a
contract, not a hope.

Everything is exact integer algebra on the repo's micro-int vector
representation (``similarity.to_micro_ints``):

- per-dim scale = max |x_micros| over the corpus — ONE narrow
  posexplode + map-side-combined hash agg over <= dim keys;
- code c = sign(x) * floor((|x_micros| * 254 + m) / (2m)) — round-half-
  away-from-zero of |x|*127/m, in [-127, 127]; the division is exact
  in a double (numerator <= ~2.5e8 << 2^53) and mirrored by an
  oracle's integer `//` on the same positive operands;
- reconstruction error is carried in 127ths-of-a-micro
  (err127 = |x_micros*127 - c*m|, an exact long), so error maxima and
  sums aggregate order-independently and divide back to micros once.

The dequantized vector for recall checks is sign(c) * (|c|*m) div 127
per dim — micro units again, exactly what a serving sink materializes
from (codes, scales). Crucially this keeps dot products in the SAME
magnitude band as the float path (|terms| < ~2^42, 64-dim sums
< 2^48): DuckDB's list_dot_product runs in doubles, so staying under
2^53 is what keeps the oracle bit-identical to Spark's exact long
fold. (The un-divided c*m form would push dots past 2^53 and silently
de-sync the engines.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakeflow.operators.similarity import (
    cosine_micros,
    dot_long,
    to_micro_ints,
)
from lakeflow.operators.topk import topk_per_key


def int8_scales(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension symmetric quantization scales: (dim, scale_micros)
    with scale_micros = max |x_micros| over the corpus. One posexplode
    + one hash agg over <= dim keys — map-side combine reduces every
    input partition to <= dim rows before the (tiny) shuffle."""
    vals = emb.select(F.posexplode(to_micro_ints(vec_col)).alias("dim", "__x"))
    return vals.groupBy("dim").agg(
        F.max(F.abs(F.col("__x"))).alias("scale_micros")
    )


def _scales_row(scales: DataFrame) -> DataFrame:
    """Fold the (dim, scale_micros) relation into ONE row holding the
    dim-ordered scale array (sorted struct collect — deterministic),
    broadcastable next to any corpus scan."""
    return scales.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "scale_micros"))),
            lambda s: s["scale_micros"],
        ).alias("__m")
    )


def _code(x, m):
    """sign(x) * round-half-away(|x| * 127 / m) as exact integer ops;
    0 where the dimension is constant-zero (m == 0)."""
    mag = F.floor(
        (F.abs(x) * F.lit(254) + m).cast("double") / (m * F.lit(2)).cast("double")
    ).cast("long")
    return F.when(m > 0, F.when(x < 0, -mag).otherwise(mag)).otherwise(
        F.lit(0).cast("long")
    )


def int8_encode(
    emb: DataFrame,
    scales: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<long in [-127,127]>): the int8 representation.
    The scale relation folds to one broadcast row; encoding is one
    codegen zip_with over the corpus scan — no shuffle."""
    return emb.crossJoin(F.broadcast(_scales_row(scales))).select(
        F.col(id_col),
        F.zip_with(to_micro_ints(vec_col), F.col("__m"), _code).alias("codes"),
    )


def int8_reconstruction_error(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension quantization quality: (dim, scale_micros,
    max_err_micros, sum_err_micros). Error is exact — carried in
    127ths-of-a-micro so max/sum aggregate as plain longs — and the
    two divisions back to micros happen once per dimension."""
    vals = emb.select(F.posexplode(to_micro_ints(vec_col)).alias("dim", "__x"))
    scales = vals.groupBy("dim").agg(F.max(F.abs(F.col("__x"))).alias("__sm"))
    err127 = F.abs(
        F.col("__x") * F.lit(127) - _code(F.col("__x"), F.col("__sm")) * F.col("__sm")
    )
    return (
        vals.join(F.broadcast(scales), "dim")
        .select("dim", F.col("__sm"), err127.alias("__e"))
        .groupBy("dim", "__sm")
        .agg(F.max("__e").alias("__emax"), F.sum("__e").alias("__esum"))
        .select(
            F.col("dim").cast("long").alias("dim"),
            F.col("__sm").alias("scale_micros"),
            F.expr("__emax div 127").alias("max_err_micros"),
            F.expr("__esum div 127").alias("sum_err_micros"),
        )
    )


def int8_dequant(
    emb: DataFrame,
    scales: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "dequant_micros",
) -> DataFrame:
    """(id, ``out_col`` array<long>): quantize-then-dequantize in micro
    units — sign(c) * (|c| * scale) div 127 per dim, the value a
    serving sink reads back from (codes, scales). Sign is split out so
    the truncating division only ever sees positive operands (Spark's
    `div` truncates, an oracle's `//` floors; they agree on
    positives)."""

    def deq(x, m):
        c = _code(x, m)
        mag = F.floor(
            (F.abs(c) * m).cast("double") / F.lit(127.0)
        ).cast("long")
        return F.when(c < 0, -mag).otherwise(mag)

    return emb.crossJoin(F.broadcast(_scales_row(scales))).select(
        F.col(id_col),
        F.zip_with(to_micro_ints(vec_col), F.col("__m"), deq).alias(out_col),
    )


def int8_topk_recall(
    emb: DataFrame,
    query_pred,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The recall contract: exact cosine top-k on the float vectors vs
    cosine top-k over the quantize-dequantize roundtrip, per query —
    (q_id, k_requested, n_overlap, recall_micros). Both sides scan the
    corpus once against broadcast query rows and rank through the
    bounded two-phase top-k with the same (cos desc, id) tie-break, so
    both sets are deterministic; the overlap join is k x k per query.
    At 100 TB the quantized side is the 4x-smaller scan — this query
    is the recall number that justifies serving from it."""
    from lakeflow.operators.similarity import brute_force_topk

    exact = brute_force_topk(
        emb, query_pred, k=k, id_col=id_col, vec_col=vec_col
    ).select(F.col("q_id"), F.col(id_col))

    deq = int8_dequant(emb, int8_scales(emb, vec_col), id_col, vec_col)
    base = deq.withColumn("__n2", dot_long(F.col("dequant_micros"), F.col("dequant_micros")))
    q = (
        base.join(
            F.broadcast(emb.filter(query_pred).select(F.col(id_col).alias("__qid"))),
            F.col(id_col) == F.col("__qid"),
            "left_semi",
        )
        .withColumnRenamed(id_col, "q_id")
        .withColumnRenamed("dequant_micros", "__qv")
        .withColumnRenamed("__n2", "__qn2")
    )
    scored = base.join(F.broadcast(q), F.col(id_col) != F.col("q_id")).select(
        "q_id",
        id_col,
        cosine_micros(
            dot_long(F.col("dequant_micros"), F.col("__qv")),
            F.col("__n2"),
            F.col("__qn2"),
        ).alias("cos_micros"),
    )
    quant = topk_per_key(scored, "q_id", "cos_micros", id_col, k, descending=True)

    # count the exact rows that also rank in the quantized top-k; a
    # per-exact-row hit flag summed per query keeps zero-overlap
    # queries in the output (a bare group-by of the semi-join would
    # silently drop them — the one recall value you most need to see)
    hit = quant.select("q_id", F.col(id_col), F.lit(1).alias("__hit"))
    return (
        exact.join(hit, ["q_id", id_col], "left")
        .groupBy("q_id")
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_overlap"))
        .select(
            "q_id",
            F.lit(k).cast("long").alias("k_requested"),
            F.col("n_overlap").cast("long"),
            F.expr(f"(n_overlap * 1000000) div {k}").alias("recall_micros"),
        )
    )

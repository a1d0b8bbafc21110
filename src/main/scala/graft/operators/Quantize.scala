package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding compression for vector stores / ANN index builds. */
object Quantize {

  /** Adds `scale` (double) + `q` (array<int>) columns: per-vector
    * max-abs int8 quantization via the native `int8_quantize`
    * expression (one eval per row — see
    * [[graft.functions.Int8Quantize]]). Map-only: no shuffle at any
    * corpus size, and the 4× size cut compounds with every downstream
    * exchange that would otherwise carry float32 vectors. */
  def int8(vectors: DataFrame, vecCol: String): DataFrame =
    vectors
      .withColumn("__i8", expr(s"int8_quantize(`$vecCol`)"))
      .withColumn("scale", col("__i8.scale"))
      .withColumn("q", col("__i8.q"))
      .drop("__i8")
}

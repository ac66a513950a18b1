package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation sampling operators.
  *
  * [[deterministicTopKPerStratum]] is the reproducible path: rank within each
  * stratum by a content-independent hash of the key and keep k — the same
  * rows come back on every engine and every run (md5 agrees between Spark
  * and the DuckDB oracle), which is what a curated-training-mix manifest
  * needs. [[stratifiedFractions]] is Spark's native `sampleBy` (seeded
  * Bernoulli per stratum) for the approximate/scale path.
  */
object Sampling {

  /** k deterministic "random" docs per stratum: hash-ordered row_number.
    * One shuffle (the window partition); the hash order is uncorrelated
    * with doc content or insertion order. */
  def deterministicTopKPerStratum(docs: DataFrame, stratum: String, k: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.select(col("doc_id"), col(stratum))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col(stratum), col("rk"))
  }

  /** Seeded stratified Bernoulli sample (Spark-native `sampleBy`). */
  def stratifiedFractions(docs: DataFrame, stratum: String, fractions: Map[String, Double], seed: Long): DataFrame =
    docs.stat.sampleBy(stratum, fractions, seed)
}

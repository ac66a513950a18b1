package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor operators over an embedding column
  * (`Array[Float]`). Brute-force cosine top-k (exact baseline, pure
  * Catalyst — `zip_with`/`aggregate`, fully codegen'd, no UDF) and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  */
object Similarity {

  /** Dot product of two array columns in double precision, left-to-right
    * fold — bit-identical across engines that evaluate in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector (queries = rows of
    * `embeddings` with vec_id < nQueries — deterministic subset). The query
    * side is broadcast; the big side streams. Output: (q, neighbor, rank).
    */
  def bruteTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q"), col("embedding").as("qe"))
    val scored = embeddings.join(broadcast(queries), col("vec_id") =!= col("q"))
      .select(col("q"), col("vec_id").as("neighbor"),
        // round to 9 decimals before ranking: double summation order can
        // differ ~1e-16 between engines; 1e-9 quantization makes the rank
        // comparable without creating real ties
        round(cosine(col("qe"), col("embedding")), 9).as("cos"))
    val w = Window.partitionBy("q").orderBy(desc("cos"), col("neighbor"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q", "neighbor", "rank")
  }

  /** Deterministic pseudo-random hyperplanes (seeded, data-independent). */
  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(20260816L)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-bucket LSH: each vector gets an `nPlanes`-bit signature; vectors
    * sharing a bucket are candidates. Scale path: the candidate join is an
    * equi-join on the bucket key instead of a cross join. Output matches
    * [[bruteTopK]] (approximate — ScalaTest asserts recall). */
  def lshTopK(embeddings: DataFrame, nQueries: Int, k: Int, nPlanes: Int = 8): DataFrame = {
    val dim = embeddings.selectExpr("size(first(embedding))").first().getInt(0)
    val ps = planes(nPlanes, dim)
    val planeCols = ps.zipWithIndex.map { case (p, i) =>
      val lits = array(p.map(v => lit(v)): _*)
      when(dot(col("embedding"), lits) >= 0, lit(1L << i)).otherwise(lit(0L)).as(s"b$i")
    }
    val withSig = embeddings.select((col("vec_id") +: col("embedding") +: planeCols.toSeq): _*)
      .withColumn("bucket", (0 until nPlanes).map(i => col(s"b$i")).reduce(_ + _))
      .select("vec_id", "embedding", "bucket")
    val queries = withSig.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q"), col("embedding").as("qe"), col("bucket"))
    val scored = withSig.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("q"))
      .select(col("q"), col("vec_id").as("neighbor"), round(cosine(col("qe"), col("embedding")), 9).as("cos"))
    val w = Window.partitionBy("q").orderBy(desc("cos"), col("neighbor"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q", "neighbor", "rank")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, brute force over
    * the (bounded) id range. */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double, maxId: Long): DataFrame = {
    val e = embeddings.filter(col("vec_id") < maxId)
    e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        cosine(col("x.embedding"), col("y.embedding")).as("cos"))
      .filter(col("cos") >= threshold)
      .select("a", "b")
  }
}

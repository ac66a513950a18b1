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

  /** Multi-table random-hyperplane LSH: `tables` independent hash tables of
    * `bitsPerTable` sign bits each; a pair is a candidate if it collides in
    * ANY table (the OR-construction — a single wide bucket has near-zero
    * recall on near-orthogonal data). The candidate join is an equi-join on
    * (table, bucket) instead of a cross join — the scale path. Output
    * matches [[bruteTopK]] (approximate; ScalaTest asserts recall). */
  def lshTopK(embeddings: DataFrame, nQueries: Int, k: Int,
              tables: Int = 8, bitsPerTable: Int = 4): DataFrame = {
    val dim = embeddings.selectExpr("size(first(embedding))").first().getInt(0)
    val ps = planes(tables * bitsPerTable, dim)
    val bucketCols = (0 until tables).map { t =>
      val bits = (0 until bitsPerTable).map { b =>
        val p = ps(t * bitsPerTable + b)
        when(dot(col("embedding"), array(p.toIndexedSeq.map(v => lit(v)): _*)) >= 0, lit(1 << b)).otherwise(lit(0))
      }
      struct(lit(t).as("table"), bits.reduce(_ + _).as("bucket"))
    }
    val withBuckets = embeddings
      .select(col("vec_id"), col("embedding"), explode(array(bucketCols: _*)).as("tb"))
      .select(col("vec_id"), col("embedding"), col("tb.table"), col("tb.bucket"))
    val queries = withBuckets.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q"), col("embedding").as("qe"), col("table"), col("bucket"))
    val candidates = withBuckets.join(broadcast(queries), Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("q"))
      .select(col("q"), col("vec_id").as("neighbor"), col("qe"), col("embedding"))
      .distinct() // OR over tables: dedupe collisions
    val scored = candidates
      .select(col("q"), col("neighbor"), round(cosine(col("qe"), col("embedding")), 9).as("cos"))
    val w = Window.partitionBy("q").orderBy(desc("cos"), col("neighbor"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q", "neighbor", "rank")
  }

  /** IVF (inverted-file) ANN — the second scale path besides [[lshTopK]]:
    * a deterministic coarse codebook (every `stride`-th vector, normalized
    * weight-free "centroids"), each vector assigned to its nearest cell via
    * argmax cosine against the broadcast-literal codebook; queries probe
    * their `nProbe` nearest cells and score only those cells' members. The
    * candidate join is an equi-join on `cell` — at 100 TB this is the
    * partition-pruning shape (cell = partition key), vs. LSH's multi-table
    * union. Approximate; OpsSpec asserts recall vs [[bruteTopK]]. */
  def ivfTopK(embeddings: DataFrame, nQueries: Int, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    // Deterministic codebook: the nCells lowest vec_ids (data-independent
    // choice; a k-means refinement would slot in here without changing the
    // plan shape). Collected once on the driver — O(nCells · dim).
    val codebook = embeddings.orderBy("vec_id").limit(nCells)
      .select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1).toArray)
    def cellScores(e: Column): Seq[Column] = codebook.toSeq.map { c =>
      cosine(e, array(c.toIndexedSeq.map(v => lit(v.toDouble)): _*))
    }
    // argmax via array_position(scores, array_max(scores)) — pure Catalyst.
    def cellOf(e: Column): Column = {
      val scores = array(cellScores(e): _*)
      (array_position(scores, array_max(scores)) - 1).cast("int")
    }
    val assigned = embeddings.select(col("vec_id"), col("embedding"), cellOf(col("embedding")).as("cell"))
    // queries probe their nProbe best cells
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q"), col("embedding").as("qe"))
      .select(col("q"), col("qe"),
        explode(slice(reverse(array_sort(zip_with(
          array(cellScores(col("qe")): _*),
          sequence(lit(0), lit(nCells - 1)),
          (s, i) => struct(s.as("s"), i.as("i"))))), 1, nProbe)).as("probe"))
      .select(col("q"), col("qe"), col("probe.i").cast("int").as("cell"))
    val scored = assigned.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("q"))
      .select(col("q"), col("vec_id").as("neighbor"),
        round(cosine(col("qe"), col("embedding")), 9).as("cos"))
      .distinct() // a pair can meet in more than one probed cell
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

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window preparation: chunking long documents into fixed-size
  * token windows, and packing short documents into fixed-length training
  * sequences — the last mile of a pretraining data pipeline.
  *
  * Both operators are deterministic integer/string transforms (no floats,
  * no RNG), so the driver can hash-gate them exactly. */
object Chunking {

  /** Split each document into overlapping token windows: chunk i covers
    * tokens [i·stride, i·stride + size) with stride = size − overlap; the
    * final chunk may be short. A window is emitted only if it contributes
    * at least one NEW token (one past the previous window's end) — i.e.
    * chunk i > 0 requires n_tokens > i·stride + overlap — otherwise the
    * tail chunk would be wholly contained in its predecessor and inject
    * verbatim duplicate text into the training stream. Null-text documents
    * are skipped.
    *
    * Scale shape: map-only — tokenize, explode the per-document chunk
    * index range, slice. No shuffle at all; the output is written straight
    * back to partition-local files. The token array is bound in its own
    * projection so it is materialized once per row, not once per chunk
    * (the CollapseProject lesson from corpusFilter). */
  def chunkDocs(docs: DataFrame, size: Int = 64, overlap: Int = 16): DataFrame = {
    require(size > overlap && overlap >= 0, s"need size > overlap >= 0, got $size/$overlap")
    val stride = size - overlap
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      // last index = max(0, (n - overlap - 1) div stride): for n <= size
      // that is 0 (one chunk); beyond, only windows with fresh tokens.
      // greatest(0, ..) also guards the negative-numerator case, where
      // Spark's div truncates toward zero but DuckDB's // floors — and
      // where sequence(0, -1) would count DOWN (the sf gotcha list).
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          greatest(lit(0), expr(s"(size(toks) - $overlap - 1) div $stride")))).as("chunk_idx"))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        least(lit(size), expr("size(toks)") - col("chunk_idx") * stride).cast("long").as("n_tokens"),
        array_join(slice(col("toks"), col("chunk_idx") * stride + 1, lit(size)), " ").as("chunk_text"))
  }

  /** Concat-and-split sequence packing: documents are laid end-to-end in
    * doc_id order and cut every `seqLen` tokens; each document reports the
    * first and last training sequence it lands in (a doc longer than
    * `seqLen` spans several).
    *
    * True GPT-style packing is a global running sum — inherently
    * sequential. The scalable form packs within fixed doc_id BUCKETS:
    * sequences never cross a bucket boundary, so every bucket packs
    * independently and in parallel, at the cost of at most seqLen−1
    * padding tokens per bucket — with thousands of documents per bucket
    * that waste is noise, and the plan is ONE bounded-width window
    * exchange on the bucket key instead of a single-partition global
    * window (which at 100 TB is a one-task job). Deterministic: the
    * running sum orders by doc_id within the bucket, no ties. */
  def packSequences(docs: DataFrame, seqLen: Int = 2048, bucketDocs: Int = 4096): DataFrame = {
    require(seqLen > 0 && bucketDocs > 0)
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        expr(s"doc_id div $bucketDocs").as("bucket"),
        size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("cum_end", sum(col("n_tokens")).over(w))
      .select(
        col("doc_id"), col("bucket"), col("n_tokens").cast("long").as("n_tokens"),
        expr(s"(cum_end - n_tokens) div $seqLen").as("first_seq"),
        expr(s"(cum_end - 1) div $seqLen").as("last_seq"))
  }
}

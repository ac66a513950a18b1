package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC-style incremental merge — the ingestion primitive of a continuously
  * refreshed corpus: fold a stream of versioned upserts and delete
  * tombstones into a snapshot, latest version wins per key.
  *
  * Scale notes (100 TB):
  *  - The whole merge is ONE shuffle: the per-key window. Union is a
  *    no-shuffle concatenation, and the rank + filter are narrow. On
  *    key-bucketed storage (snapshot and delta bucketed alike) even the
  *    window exchange disappears — this is exactly the merge-on-read
  *    compaction shape of the lakehouse table formats.
  *  - Delete tombstones ride the same path as upserts (op = 'D'); a later
  *    upsert resurrects the key, matching CDC log-replay semantics.
  *  - Determinism: (key, ver) is unique by contract, so row_number over
  *    `ver DESC` has no ties and the result is bit-stable under any
  *    partitioning — which is what lets the driver hash-gate it.
  */
object Merge {

  /** Merge `delta` into `snapshot`. The snapshot is implicitly version 0,
    * all-upserts; `delta` must carry BIGINT `verCol` (> 0) and `opCol` in
    * {'U','D'} plus the snapshot's columns. Returns the merged table:
    * per key the highest-version row, dropped if that row is a delete. */
  def upsertMerge(snapshot: DataFrame, delta: DataFrame, keyCols: Seq[String],
                  verCol: String = "ver", opCol: String = "op"): DataFrame = {
    val snap = snapshot
      .withColumn(verCol, lit(0L))
      .withColumn(opCol, lit("U"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(verCol).desc)
    snap.unionByName(delta)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) === "U")
      .drop("__rn", opCol)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is one operator of the engine; `oracleSql` holds
  * the DuckDB-equivalent SQL over the same parquet tables (the driver's
  * correctness gate). Column names and types match pairwise.
  */
object SparkEntry {

  import Transcripts.{Base, Voc, RdfNs, XsdInt, Convs}

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * end-to-end transcript → parse → predicate histogram. */
  def entry(spark: SparkSession): DataFrame =
    queries("kg_pred_counts")(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------------------------ queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1-P4: scan → synthesize transcripts → window order → mapPartitions parse
    "kg_triples" -> ((s, dir) =>
      ParseStage.parsedTranscripts(s, dir)
        .filter(col("error").isNull)
        .select("conv_id", "turn_idx", "subj", "pred", "obj")),

    "kg_parse_errors" -> ((s, dir) =>
      ParseStage.parsedTranscripts(s, dir)
        .filter(col("error").isNotNull)
        .agg(count(lit(1)).as("n"))),

    "kg_pred_counts" -> ((s, dir) =>
      ParseStage.parsedTranscripts(s, dir)
        .filter(col("error").isNull)
        .groupBy("pred").agg(count(lit(1)).as("n"))),

    // P2: conversation reconstruction + per-turn text equality evidence
    "kg_turn_text" -> ((s, dir) =>
      ParseStage.reconstructConversations(Transcripts.transcripts(s, dir))
        .filter(col("dense"))
        .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"), md5(col("text")).as("text_md5"))),
  )

  // ------------------------------------------------------------------ oracles

  /** Shared DuckDB CTE: the expected triples, reconstructed with plain SQL
    * from `documents` — the same derivation the Spark side performs by
    * actually parsing the generated RDF/XML. */
  private def expectedTriplesCte: String = {
    s"""
WITH d AS (
  SELECT doc_id, lang, source, n_chars,
         'conv-' || (doc_id % $Convs) AS conv_id,
         CAST(2*(row_number() OVER (PARTITION BY doc_id % $Convs ORDER BY doc_id) - 1) AS INTEGER) AS turn_idx
  FROM documents
),
expected AS (
  -- v0: typed node + property attribute + text literal + typed literal + resource
  SELECT conv_id, turn_idx, '<${Base}d' || doc_id || '>' AS subj, '<${RdfNs}type>' AS pred, '<${Voc}Document>' AS obj FROM d WHERE doc_id % 4 = 0
  UNION ALL SELECT conv_id, turn_idx, '<${Base}d' || doc_id || '>', '<${Voc}source>', '"' || source || '"' FROM d WHERE doc_id % 4 = 0
  UNION ALL SELECT conv_id, turn_idx, '<${Base}d' || doc_id || '>', '<${Voc}lang>', '"' || lang || '"' FROM d WHERE doc_id % 4 = 0
  UNION ALL SELECT conv_id, turn_idx, '<${Base}d' || doc_id || '>', '<${Voc}chars>', '"' || n_chars || '"^^<$XsdInt>' FROM d WHERE doc_id % 4 = 0
  UNION ALL SELECT conv_id, turn_idx, '<${Base}d' || doc_id || '>', '<${Voc}corpus>', '<${Base}corpus/' || source || '>' FROM d WHERE doc_id % 4 = 0
  -- v1: typed node + language literal + rdf:ID reification (5 statements)
  UNION ALL SELECT conv_id, turn_idx, '<${Base}d' || doc_id || '>', '<${RdfNs}type>', '<${Voc}Entry>' FROM d WHERE doc_id % 4 = 1
  UNION ALL SELECT conv_id, turn_idx, '<${Base}d' || doc_id || '>', '<${Voc}title>', '"Document ' || doc_id || '"@' || lang FROM d WHERE doc_id % 4 = 1
  UNION ALL SELECT conv_id, turn_idx, '<${Base}d' || doc_id || '>', '<${Voc}src>', '<${Base}corpus/' || source || '>' FROM d WHERE doc_id % 4 = 1
  UNION ALL SELECT conv_id, turn_idx, '<$Base#st' || doc_id || '>', '<${RdfNs}type>', '<${RdfNs}Statement>' FROM d WHERE doc_id % 4 = 1
  UNION ALL SELECT conv_id, turn_idx, '<$Base#st' || doc_id || '>', '<${RdfNs}subject>', '<${Base}d' || doc_id || '>' FROM d WHERE doc_id % 4 = 1
  UNION ALL SELECT conv_id, turn_idx, '<$Base#st' || doc_id || '>', '<${RdfNs}predicate>', '<${Voc}src>' FROM d WHERE doc_id % 4 = 1
  UNION ALL SELECT conv_id, turn_idx, '<$Base#st' || doc_id || '>', '<${RdfNs}object>', '<${Base}corpus/' || source || '>' FROM d WHERE doc_id % 4 = 1
  -- v2: parseType=Resource nested blank node (deterministic relabel _:conv_turn_b0)
  UNION ALL SELECT conv_id, turn_idx, '<${Base}d' || doc_id || '>', '<${Voc}meta>', '_:' || conv_id || '_' || turn_idx || '_b0' FROM d WHERE doc_id % 4 = 2
  UNION ALL SELECT conv_id, turn_idx, '_:' || conv_id || '_' || turn_idx || '_b0', '<${Voc}chars>', '"' || n_chars || '"' FROM d WHERE doc_id % 4 = 2
  UNION ALL SELECT conv_id, turn_idx, '_:' || conv_id || '_' || turn_idx || '_b0', '<${Voc}source>', '"' || source || '"' FROM d WHERE doc_id % 4 = 2
  -- v3: parseType=Collection rdf:List chain (_:b0, _:b1)
  UNION ALL SELECT conv_id, turn_idx, '<${Base}d' || doc_id || '>', '<${Voc}tags>', '_:' || conv_id || '_' || turn_idx || '_b0' FROM d WHERE doc_id % 4 = 3
  UNION ALL SELECT conv_id, turn_idx, '_:' || conv_id || '_' || turn_idx || '_b0', '<${RdfNs}first>', '<${Base}t/' || lang || '>' FROM d WHERE doc_id % 4 = 3
  UNION ALL SELECT conv_id, turn_idx, '_:' || conv_id || '_' || turn_idx || '_b0', '<${RdfNs}rest>', '_:' || conv_id || '_' || turn_idx || '_b1' FROM d WHERE doc_id % 4 = 3
  UNION ALL SELECT conv_id, turn_idx, '_:' || conv_id || '_' || turn_idx || '_b1', '<${RdfNs}first>', '<${Base}t/' || source || '>' FROM d WHERE doc_id % 4 = 3
  UNION ALL SELECT conv_id, turn_idx, '_:' || conv_id || '_' || turn_idx || '_b1', '<${RdfNs}rest>', '<${RdfNs}nil>' FROM d WHERE doc_id % 4 = 3
)"""
  }

  /** DuckDB SQL reconstructing the full transcript text for the text-
    * equality oracle (the same concat the Spark generator performs). */
  private def turnTextSql: String = {
    val head = s"""<?xml version="1.0"?><rdf:RDF xmlns:rdf="$RdfNs" xmlns:g="$Voc" xml:base="$Base">"""
    val tail = "</rdf:RDF>"
    s"""
WITH d AS (
  SELECT doc_id, lang, source, n_chars, text,
         'conv-' || (doc_id % $Convs) AS conv_id,
         CAST(row_number() OVER (PARTITION BY doc_id % $Convs ORDER BY doc_id) - 1 AS INTEGER) AS rn
  FROM documents
),
turns AS (
  SELECT conv_id, CAST(rn*2 AS INTEGER) AS turn_idx,
    CASE doc_id % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
    CASE WHEN doc_id % 3 = 2 THEN 'kg-extractor' ELSE NULL END AS tool,
    CASE doc_id % 4
      WHEN 0 THEN '$head<g:Document rdf:about="d' || doc_id || '" g:source="' || source || '"><g:lang>' || lang || '</g:lang><g:chars rdf:datatype="$XsdInt">' || n_chars || '</g:chars><g:corpus rdf:resource="corpus/' || source || '"/></g:Document>$tail'
      WHEN 1 THEN '$head<g:Entry rdf:about="d' || doc_id || '"><g:title xml:lang="' || lang || '">Document ' || doc_id || '</g:title><g:src rdf:ID="st' || doc_id || '" rdf:resource="corpus/' || source || '"/></g:Entry>$tail'
      WHEN 2 THEN '$head<rdf:Description rdf:about="d' || doc_id || '"><g:meta rdf:parseType="Resource"><g:chars>' || n_chars || '</g:chars><g:source>' || source || '</g:source></g:meta></rdf:Description>$tail'
      ELSE        '$head<rdf:Description rdf:about="d' || doc_id || '"><g:tags rdf:parseType="Collection"><rdf:Description rdf:about="t/' || lang || '"/><rdf:Description rdf:about="t/' || source || '"/></g:tags></rdf:Description>$tail'
    END AS text
  FROM d
  UNION ALL
  SELECT conv_id, CAST(rn*2+1 AS INTEGER), 'tool', 'search',
    'Customer#' || lpad(CAST(doc_id % 50 AS VARCHAR), 9, '0') || ' reported an issue. ' ||
    CASE WHEN doc_id % 2 = 0 THEN 'Supplier#' || lpad(CAST(doc_id % 10 AS VARCHAR), 9, '0') || ' replied. '
         ELSE 'Supplier#' || (doc_id % 10) || ' replied. ' END || text
  FROM d
)
SELECT conv_id, turn_idx, role, tool, md5(text) AS text_md5 FROM turns"""
  }

  def oracleSql: Map[String, String] = Map(
    "kg_triples" -> s"$expectedTriplesCte SELECT conv_id, turn_idx, subj, pred, obj FROM expected",
    "kg_parse_errors" -> "SELECT CAST(0 AS BIGINT) AS n",
    "kg_pred_counts" -> s"$expectedTriplesCte SELECT pred, COUNT(*) AS n FROM expected GROUP BY pred",
    "kg_turn_text" -> turnTextSql,
  )
}

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

    // P5: rule-based NER mention extraction (regexp_extract_all + explode)
    "kg_mentions" -> ((s, dir) =>
      Ner.mentions(Transcripts.transcripts(s, dir))),

    // P6 (exact path): shingle-blocked n-gram Jaccard edges over the
    // distinct-mention universe
    "kg_link_edges" -> ((s, dir) =>
      Linking.jaccardEdges(Ner.mentionUniverse(Transcripts.transcripts(s, dir)), 0.5)),

    // P6 (scale path): MinHash-LSH candidate pairs — rows-only driver check;
    // equivalence to exact Jaccard is asserted in ScalaTest
    "kg_lsh_candidates" -> ((s, dir) =>
      Linking.lshCandidates(Ner.mentionUniverse(Transcripts.transcripts(s, dir)))),

    // P7: broadcast-dictionary link scoring
    "kg_linked" -> ((s, dir) =>
      Linking.linkToDictionary(
        Ner.mentionUniverse(Transcripts.transcripts(s, dir)),
        s.read.parquet(s"$dir/customer.parquet"),
        s.read.parquet(s"$dir/supplier.parquet"))),

    // P8: canonicalization — connected components (large-star/small-star)
    // over the Jaccard edges; component = lexicographic min mention
    "kg_canonical" -> ((s, dir) =>
      ConnectedComponents.run(
        Linking.jaccardEdges(Ner.mentionUniverse(Transcripts.transcripts(s, dir)), 0.5))),

    // P9 shape check: per-subject adjacency stats of the triple table
    "kg_adjacency" -> ((s, dir) =>
      ParseStage.parsedTranscripts(s, dir)
        .filter(col("error").isNull)
        .groupBy("subj")
        .agg(count(lit(1)).as("degree"), countDistinct(col("pred")).as("n_pred"))),
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

  /** Shared DuckDB CTE chain: prose turns → mention occurrences → distinct
    * mentions → shingle sets → exact-Jaccard edges (threshold 0.5). */
  private def mentionCtes: String =
    s"""
WITH d AS (
  SELECT doc_id, text,
         'conv-' || (doc_id % $Convs) AS conv_id,
         CAST(row_number() OVER (PARTITION BY doc_id % $Convs ORDER BY doc_id) - 1 AS INTEGER) AS rn
  FROM documents
),
prose AS (
  SELECT conv_id, CAST(rn*2+1 AS INTEGER) AS turn_idx,
    'Customer#' || lpad(CAST(doc_id % 50 AS VARCHAR), 9, '0') || ' reported an issue. ' ||
    CASE WHEN doc_id % 2 = 0 THEN 'Supplier#' || lpad(CAST(doc_id % 10 AS VARCHAR), 9, '0') || ' replied. '
         ELSE 'Supplier#' || (doc_id % 10) || ' replied. ' END || text AS text
  FROM d
),
occ AS (
  SELECT conv_id, turn_idx, unnest(regexp_extract_all(text, '(?:Customer|Supplier)#[0-9]+')) AS mention FROM prose
),
m AS (SELECT DISTINCT mention FROM occ),
sh AS (SELECT mention, unnest(list_distinct([substring(lower(mention), CAST(i AS INTEGER), 3) for i in generate_series(1, greatest(len(mention)-2, 0))])) AS shingle FROM m),
sz AS (SELECT mention, COUNT(*) AS sz FROM sh GROUP BY mention),
ints AS (SELECT x.mention AS a, y.mention AS b, COUNT(*) AS cnt FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.mention < y.mention GROUP BY 1, 2),
edges AS (SELECT a, b FROM ints JOIN sz sa ON sa.mention = ints.a JOIN sz sb ON sb.mention = ints.b WHERE cnt*1.0/(sa.sz + sb.sz - cnt) >= 0.5)"""

  def oracleSql: Map[String, String] = Map(
    "kg_triples" -> s"$expectedTriplesCte SELECT conv_id, turn_idx, subj, pred, obj FROM expected",
    "kg_parse_errors" -> "SELECT CAST(0 AS BIGINT) AS n",
    "kg_pred_counts" -> s"$expectedTriplesCte SELECT pred, COUNT(*) AS n FROM expected GROUP BY pred",
    "kg_turn_text" -> turnTextSql,
    "kg_mentions" -> s"$mentionCtes SELECT conv_id, turn_idx, mention FROM occ",
    "kg_link_edges" -> s"$mentionCtes SELECT a, b FROM edges",
    "kg_canonical" ->
      s"""${mentionCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
sym AS (SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges UNION SELECT a, a FROM edges UNION SELECT b, b FROM edges),
reach(u, v) AS (SELECT u, v FROM sym UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u)
SELECT u AS node, min(v) AS component FROM reach GROUP BY u""",
    "kg_linked" ->
      s"""$mentionCtes,
dict AS (SELECT c_name AS entity_name FROM customer UNION ALL SELECT s_name FROM supplier),
dk AS (SELECT entity_name, split_part(entity_name, '#', 1) AS etype, CAST(split_part(entity_name, '#', 2) AS BIGINT) AS eid FROM dict),
mk AS (SELECT mention, split_part(mention, '#', 1) AS etype, CAST(split_part(mention, '#', 2) AS BIGINT) AS eid FROM m)
SELECT mention, entity_name FROM mk JOIN dk USING (etype, eid)""",
    "kg_adjacency" ->
      s"$expectedTriplesCte SELECT subj, COUNT(*) AS degree, COUNT(DISTINCT pred) AS n_pred FROM expected GROUP BY subj",
  )
}

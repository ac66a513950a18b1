package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** P5: rule-based mention extraction over transcript text. Deterministic by
  * construction (a regex over entity-shaped tokens), so precision/recall
  * against the oracle is exact and reproducible — the property SURVEY §7.4
  * requires of the NER stage.
  */
object Ner {

  /** Entity-shaped mentions: TPC-H style `Customer#N` / `Supplier#N`. */
  val MentionRegex = "(?:Customer|Supplier)#[0-9]+"

  /** (conv_id, turn_idx, mention) — one row per occurrence, document order
    * within a turn. Runs entirely in codegen'd built-ins (regexp_extract_all
    * + explode); no UDF. */
  def mentions(turns: DataFrame): DataFrame =
    turns
      .select(
        col("conv_id"),
        col("turn_idx"),
        explode(regexp_extract_all(col("text"), lit(MentionRegex), lit(0))).as("mention"))

  /** Distinct mention surface forms (the linking universe). */
  def mentionUniverse(turns: DataFrame): DataFrame =
    mentions(turns).select("mention").distinct()

  /** General rule-based path (SURVEY P5 "capitalized spans"): maximal runs
    * of Capitalized words (2+ words, ASCII — both engines' regex dialects
    * agree on these classes) as entity-mention candidates. Codegen'd
    * built-ins only. */
  val CapSpanRegex = "[A-Z][a-z]+(?: [A-Z][a-z]+)+"

  def capitalizedSpans(turns: DataFrame): DataFrame =
    turns.select(
      col("conv_id"),
      col("turn_idx"),
      explode(regexp_extract_all(col("text"), lit(CapSpanRegex), lit(0))).as("span"))
}

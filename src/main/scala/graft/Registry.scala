package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One coverage-checklist entry (SURVEY.md §2): a named query plus an
  * optional DuckDB oracle SQL. Modules contribute `Seq[Entry]`;
  * [[SparkEntry]] aggregates them for the driver.
  */
final case class Entry(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[Entry] =
    Analytics.entries ++ Analytics2.entries ++ Analytics3.entries ++
      Analytics4.entries ++ Analytics5.entries ++
      SketchOps.entries ++
      TextOps.entries ++ DedupOps.entries ++ PipelineOps.entries ++
      SimilarityOps.entries ++ MultimodalOps.entries ++
      SnortOps.entries ++ StreamOps.entries
}

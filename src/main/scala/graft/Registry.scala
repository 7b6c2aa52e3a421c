package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: the Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL over the same tables.
  * `SparkEntry.queries` / `oracleSql` are derived from this list. */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.TpchClassic.defs ++
      operators.TpchFull.defs ++
      operators.Analytics.defs ++
      operators.Breadth.defs ++
      operators.Curation.defs ++
      operators.Temporal.defs ++
      operators.TextAnalysis.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.Skew.defs ++
      operators.AsOf.defs ++
      operators.InmetQueries.defs ++
      operators.Quantiles.defs ++
      operators.Training.defs ++
      operators.Graph.defs ++
      sources.Layout.defs ++
      streaming.StreamingQueries.defs ++
      multimodal.Multimodal.defs
}

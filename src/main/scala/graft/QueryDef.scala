package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark query plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names/types must line up exactly — the driver sorts
  * columns by name and hash-compares values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def all: Seq[QueryDef] =
    queries.Relational.defs ++
      queries.EventsOps.defs ++
      queries.TextOps.defs ++
      queries.SimilarityOps.defs ++
      queries.NewsEtl.defs ++
      queries.Advanced.defs ++
      queries.MultimodalOps.defs ++
      queries.ScaleOps.defs ++
      queries.CurationOps.defs
}

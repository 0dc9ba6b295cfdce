package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** North-star training-data pipeline operators (dedup, similarity, text
  * analysis, multimodal) — filled in as operator families land.
  */
object PipelineQueries {
  val all: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}

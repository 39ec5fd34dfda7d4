package graft

/** graft.plans — custom Catalyst surface (SURVEY §4). The expression
  * implementations live in the org.apache.spark.sql.graft bridge package
  * because Expression SPI types (AbstractDataType etc.) are private[sql]
  * in Spark 4; these aliases keep graft.plans the public face.
  */
package object plans {
  type CosineSimilarity = org.apache.spark.sql.graft.CosineSimilarity
  val CosineSimilarity = org.apache.spark.sql.graft.CosineSimilarity
  type JaccardSimilarity = org.apache.spark.sql.graft.JaccardSimilarity
  val JaccardSimilarity = org.apache.spark.sql.graft.JaccardSimilarity
  type SimHash60 = org.apache.spark.sql.graft.SimHash60
  val SimHash60 = org.apache.spark.sql.graft.SimHash60
}

package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.SourceColumn

/** Relational [[Source]] over JDBC — the shape of the reference's actual
  * source (a remote SQL warehouse, maxcompute_client.py). Catalog reads
  * go through `DatabaseMetaData` (portable: works on MySQL, Derby, ...);
  * the scan goes through Spark's JDBC reader so predicates/projections
  * push down into the remote engine (`PushedFilters` in the JDBC scan),
  * exactly like the reference pushing its partition WHERE into the
  * generated SQL.
  *
  * Scale: `partitionOptions` should carry partitionColumn/lowerBound/
  * upperBound/numPartitions so the read parallelizes across executors —
  * the reference's serial tunnel reader becomes N concurrent range scans.
  */
class JdbcSource(spark: SparkSession, url: String,
    props: Properties = new Properties(),
    partitionOptions: Map[String, String] = Map.empty,
    quote: String => String = JdbcSource.AnsiQuote) extends Source {

  override def table(name: String): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url).option("dbtable", quote(name))
    partitionOptions.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
  }

  override def schemaOf(name: String): Seq[SourceColumn] = {
    val c = DriverManager.getConnection(url, props)
    try {
      val rs = c.getMetaData.getColumns(null, null, null, null)
      val buf = Seq.newBuilder[(Int, SourceColumn)]
      while (rs.next()) {
        if (rs.getString("TABLE_NAME").equalsIgnoreCase(name)) {
          buf += rs.getInt("ORDINAL_POSITION") -> SourceColumn(
            rs.getString("COLUMN_NAME"),
            rs.getString("TYPE_NAME").toLowerCase,
            comment = Option(rs.getString("REMARKS")).filter(_.nonEmpty))
        }
      }
      rs.close()
      buf.result().sortBy(_._1).map(_._2)
    } finally c.close()
  }

  /** Relational sources have no hive-layout partitions; partition-style
    * pruning maps to indexed range predicates instead.
    */
  override def partitionColumns(name: String): Set[String] = Set.empty

  override def testConnection(): Boolean =
    try { val c = DriverManager.getConnection(url, props); c.close(); true }
    catch { case _: Exception => false }
}

object JdbcSource {
  /** ANSI double-quote identifier quoting (Derby, Postgres; MySQL wants
    * backticks — pass MySqlDialect.quote there).
    */
  val AnsiQuote: String => String =
    s => "\"" + s.replace("\"", "\"\"") + "\""
}

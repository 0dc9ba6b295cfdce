package graft.sinks

import java.sql.Types

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** JdbcDialect giving Spark's own JDBC writer the reference's MySQL DDL
  * type mapping (SURVEY.md §1; reference: schema_mapper.py:95-117) —
  * VARCHAR(255) strings, TINYINT(1) booleans, DATETIME for NTZ
  * timestamps, integer widening to BIGINT — so `df.write.jdbc` against
  * MySQL produces the same tables the reference's CREATE TABLE did,
  * without going through JdbcSink's explicit DDL path.
  */
object GraftMySqlDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase.startsWith("jdbc:mysql:")

  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case LongType | IntegerType | ShortType | ByteType =>
      Some(JdbcType("BIGINT", Types.BIGINT)) // widened (schema_mapper.py:97-98)
    case DoubleType | FloatType => Some(JdbcType("DOUBLE", Types.DOUBLE))
    case d: DecimalType =>
      Some(JdbcType(s"DECIMAL(${d.precision},${d.scale})", Types.DECIMAL))
    case StringType      => Some(JdbcType("VARCHAR(255)", Types.VARCHAR))
    case BooleanType     => Some(JdbcType("TINYINT(1)", Types.TINYINT))
    case TimestampNTZType => Some(JdbcType("DATETIME", Types.TIMESTAMP))
    case TimestampType   => Some(JdbcType("TIMESTAMP", Types.TIMESTAMP))
    case DateType        => Some(JdbcType("DATE", Types.DATE))
    case BinaryType      => Some(JdbcType("BLOB", Types.BLOB))
    case _: ArrayType | _: MapType | _: StructType =>
      Some(JdbcType("TEXT", Types.LONGVARCHAR)) // JSON-serialized upstream
    case _ => None
  }

  /** Register with Spark's dialect registry (idempotent). */
  def register(): Unit = {
    JdbcDialects.unregisterDialect(this)
    JdbcDialects.registerDialect(this)
  }
}

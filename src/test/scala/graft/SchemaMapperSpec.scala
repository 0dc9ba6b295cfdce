package graft

import org.apache.spark.sql.types._

import graft.model.SourceColumn
import graft.schema.SchemaMapper

/** Ports the reference's schema-mapper unit cases
  * (reference: tests/test_schema_mapper.py:15-113) plus the MySQL dialect
  * table (schema_mapper.py:95-117).
  */
class SchemaMapperSpec extends SparkSpec {

  test("basic type map (test_schema_mapper.py: basic types)") {
    assert(SchemaMapper.toSparkType("bigint") == LongType)
    assert(SchemaMapper.toSparkType("int") == IntegerType)
    assert(SchemaMapper.toSparkType("smallint") == ShortType)
    assert(SchemaMapper.toSparkType("tinyint") == ByteType)
    assert(SchemaMapper.toSparkType("double") == DoubleType)
    assert(SchemaMapper.toSparkType("float") == FloatType)
    assert(SchemaMapper.toSparkType("string") == StringType)
    assert(SchemaMapper.toSparkType("varchar(100)") == StringType)
    assert(SchemaMapper.toSparkType("boolean") == BooleanType)
    assert(SchemaMapper.toSparkType("datetime") == TimestampNTZType)
    assert(SchemaMapper.toSparkType("timestamp") == TimestampType)
    assert(SchemaMapper.toSparkType("date") == DateType)
    assert(SchemaMapper.toSparkType("binary") == BinaryType)
  }

  test("array types → typed ArrayType (ref: REPEATED)") {
    assert(SchemaMapper.toSparkType("array<string>") == ArrayType(StringType))
    assert(SchemaMapper.toSparkType("array<double>") == ArrayType(DoubleType))
    assert(SchemaMapper.toBigQueryType(ArrayType(StringType)) == "REPEATED STRING")
  }

  test("map types stay typed (ref degraded to RECORD{key,value})") {
    assert(SchemaMapper.toSparkType("map<string,string>") ==
      MapType(StringType, StringType))
    assert(SchemaMapper.toSparkType("map<string,bigint>") ==
      MapType(StringType, LongType))
  }

  test("struct types parse fully (ref warned 'needs manual parsing')") {
    assert(SchemaMapper.toSparkType("struct<a:int,b:string>") ==
      StructType(Seq(StructField("a", IntegerType), StructField("b", StringType))))
    assert(SchemaMapper.toSparkType("struct<a:int,b:map<string,int>>") ==
      StructType(Seq(StructField("a", IntegerType),
        StructField("b", MapType(StringType, IntegerType)))))
  }

  test("unknown type → string fallback (test_schema_mapper.py: unknown)") {
    assert(SchemaMapper.toSparkType("geography") == StringType)
    assert(SchemaMapper.toSparkType("whatever<x>") == StringType)
  }

  test("decimal precision preserved; bare decimal falls back to (18,4)") {
    assert(SchemaMapper.toSparkType("decimal(10,2)") == DecimalType(10, 2))
    assert(SchemaMapper.toSparkType("decimal") == DecimalType(18, 4))
    assert(SchemaMapper.toMySqlType(DecimalType(10, 2)) == "DECIMAL(10,2)")
  }

  test("MySQL DDL dialect (schema_mapper.py:95-117)") {
    assert(SchemaMapper.toMySqlType(LongType) == "BIGINT")
    assert(SchemaMapper.toMySqlType(IntegerType) == "BIGINT") // widened
    assert(SchemaMapper.toMySqlType(StringType) == "VARCHAR(255)")
    assert(SchemaMapper.toMySqlType(BooleanType) == "TINYINT(1)")
    assert(SchemaMapper.toMySqlType(TimestampNTZType) == "DATETIME")
    assert(SchemaMapper.toMySqlType(ArrayType(StringType)) == "TEXT")
    assert(SchemaMapper.toMySqlType(MapType(StringType, StringType)) == "TEXT")
  }

  test("case-insensitive keep-first dedupe (schema_mapper.py:80-92)") {
    val cols = Seq(SourceColumn("id", "bigint"), SourceColumn("ID", "string"),
      SourceColumn("name", "string"))
    assert(SchemaMapper.dedupe(cols).map(_.name) == Seq("id", "name"))
    assert(SchemaMapper.dedupe(cols).head.typeName == "bigint")
  }

  test("partition columns never reach destination DDL (schema_mapper.py:55-57)") {
    val cols = Seq(SourceColumn("id", "bigint"),
      SourceColumn("pt", "string", isPartition = true))
    assert(SchemaMapper.toMySqlDdl(cols).map(_.name) == Seq("id"))
  }

  test("type overrides used verbatim in DDL (README.md:322-355)") {
    val cols = Seq(SourceColumn("amount", "decimal(10,2)"))
    val ddl = SchemaMapper.toMySqlDdl(cols, Map("AMOUNT" -> "DECIMAL(20,6)"))
    assert(ddl.head.typeName == "DECIMAL(20,6)")
  }

  test("schema drift diff: case-insensitive names, base-type tokens, " +
      "driver-rendering synonyms") {
    import graft.model.DestColumn
    val target = Seq(
      DestColumn("id", "BIGINT"),
      DestColumn("Name", "VARCHAR(255)"),
      DestColumn("score", "DOUBLE"))     // new in source
    val dest = Seq(
      DestColumn("ID", "BIGINT"),
      DestColumn("name", "VARCHAR"),     // catalog strips the length
      DestColumn("legacy", "INT"))       // dropped from source
    val d = SchemaMapper.diff(target, dest)
    assert(d.added.map(_.name) == Seq("score"))
    assert(d.removed.map(_.name) == Seq("legacy"))
    assert(d.typeChanged.isEmpty) // VARCHAR(255) vs VARCHAR is no drift

    val d2 = SchemaMapper.diff(
      Seq(DestColumn("id", "VARCHAR(64)")), Seq(DestColumn("id", "BIGINT")))
    assert(d2.typeChanged.map(_._1.name) == Seq("id"))
    // synonyms collapse: INT≡INTEGER, DOUBLE PRECISION≡DOUBLE, BOOL≡BOOLEAN
    assert(SchemaMapper.diff(
      Seq(DestColumn("a", "INT"), DestColumn("b", "DOUBLE PRECISION"),
        DestColumn("c", "BOOL")),
      Seq(DestColumn("a", "INTEGER"), DestColumn("b", "DOUBLE"),
        DestColumn("c", "BOOLEAN"))).typeChanged.isEmpty)
  }
}

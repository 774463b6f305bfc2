package graft

import graft.sources.Tables
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

/** The driver has shipped `events.ts` in two physical parquet layouts
  * across rounds: TIMESTAMP(NANOS) (Spark 4 reads it only as a raw long
  * via the legacy nanosAsLong conf) and plain tz-naive TIMESTAMP(MICROS).
  * Tables.apply must normalize BOTH to a session-UTC TimestampType with
  * identical values, probing the footer schema rather than assuming a
  * layout. Fixtures are written in-test so this holds regardless of what
  * /root/testdata currently carries.
  */
class TablesLayoutSpec extends AnyFunSuite {
  import TestSpark._

  // 2021-03-04T05:06:07.123456789 UTC in epoch nanos; micros truncation
  // (div 1000, matching DuckDB's TIMESTAMP_NS -> us read) drops the 789.
  private val nanos = Seq(1614834367123456789L, 1614834367999999999L, 0L)
  private val wantMicros = nanos.map(_ / 1000L)

  private def tmpDir(): String =
    Files.createTempDirectory("tables_layout").toString

  test("nanos layout: ts long is rebuilt as truncated-micros TimestampType") {
    val dir = tmpDir()
    val schema = Types.buildMessage()
      .required(INT64)
        .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts")
      .required(INT64).named("event_id")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withType(schema)
      .withConf(new Configuration())
      .build()
    val fac = new SimpleGroupFactory(schema)
    nanos.zipWithIndex.foreach { case (n, i) =>
      val g = fac.newGroup()
      g.append("ts", n)
      g.append("event_id", i.toLong)
      writer.write(g)
    }
    writer.close()

    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.orderBy("event_id").collect()
      .map(_.getAs[Timestamp]("ts"))
      .map(t => t.getTime / 1000 * 1000000 + t.getNanos / 1000)
    assert(got.toSeq == wantMicros)
  }

  test("micros tz-naive layout: ts passes through as TimestampType, values preserved") {
    val dir = tmpDir()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = wantMicros.zipWithIndex
      .toDF("us", "event_id")
      .select(
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("event_id").cast("long"))
    assert(src.schema("ts").dataType == TimestampNTZType)
    src.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.orderBy("event_id").collect()
      .map(_.getAs[Timestamp]("ts"))
      .map(t => t.getTime / 1000 * 1000000 + t.getNanos / 1000)
    assert(got.toSeq == wantMicros)
  }

  test("driver testdata loads with a timestamp ts and rows") {
    val df = Tables(spark, sf0001, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }
}

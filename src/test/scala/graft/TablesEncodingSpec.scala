package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.tables.Tables

/** The driver's generator has shipped events.ts as parquet
  * TIMESTAMP(NANOS) (rounds 1-3) and TIMESTAMP(MICROS) without
  * timezone (round 4 — read as TIMESTAMP_NTZ, which broke 16 queries
  * because only the nanos branch existed). This spec round-trips each
  * physical encoding through `Tables` so the NEXT encoding flip fails
  * in CI instead of at the driver's verify gate. */
class TablesEncodingSpec extends SparkSpec {
  import spark.implicits._

  // 2024-03-01T12:34:56.789001Z
  private val micros = 1709296496789001L

  private def readBack(write: String => Unit): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-enc").toString
    write(dir)
    Tables(spark, dir, "events")
  }

  test("TIMESTAMP(MICROS) no-tz (read as TIMESTAMP_NTZ) normalizes to TimestampType, value-preserving under UTC") {
    val df = readBack { dir =>
      spark.range(1).select(
        lit(1L).as("event_id"),
        timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts"),
        lit(7L).as("user_id"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros($"ts")).as[Long].head() == micros)
  }

  test("int64 ts (what nanosAsLong yields for legacy TIMESTAMP(NANOS)) rebuilds TimestampType at micro precision") {
    val df = readBack { dir =>
      spark.range(1).select(
        lit(1L).as("event_id"),
        lit(micros * 1000 + 234).as("ts"), // nanos, with sub-micro residue
        lit(7L).as("user_id"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros($"ts")).as[Long].head() == micros)
  }

  test("session-tz TimestampType passes through untouched") {
    val df = readBack { dir =>
      spark.range(1).select(
        lit(1L).as("event_id"),
        timestamp_micros(lit(micros)).as("ts"),
        lit(7L).as("user_id"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros($"ts")).as[Long].head() == micros)
  }

  test("INT96 (the legacy Hive/Impala encoding real lakehouses still ship) reads as TimestampType, value-preserving") {
    // the fourth physical encoding in the wild: parquet INT96
    // nanos-since-julian-midnight. Spark decodes it straight to
    // session-tz TimestampType, so Tables must pass it through like
    // the native encoding — pinned here so a generator flip to INT96
    // is a CI failure, not a round casualty.
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try {
      val df = readBack { dir =>
        spark.range(1).select(
          lit(1L).as("event_id"),
          timestamp_micros(lit(micros)).as("ts"),
          lit(7L).as("user_id"))
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      }
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.select(unix_micros($"ts")).as[Long].head() == micros)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
  }

  test("the driver's CURRENT events.parquet normalizes to TimestampType (whatever its physical encoding)") {
    val df = Tables(spark, sf, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }
}

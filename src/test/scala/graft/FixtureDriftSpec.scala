package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import graft.sources.Tables

/** Fixture-schema-drift guard (round-10 verdict item #2).
  *
  * The round-9 breakage: the driver regenerated `events.parquet` from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and the old unconditional
  * ns-as-long shim failed analysis, zeroing out 24/151 keys with no test
  * catching it. This spec pins the contract that survives ANY such
  * regeneration: every `Tables.*` loader must resolve on a session WITHOUT
  * the legacy nanos conf, at every tier, and `events.ts` must come out a
  * plain µs TIMESTAMP carrying the same instant whatever the footer
  * encodes (ns-as-long, µs NTZ, or µs UTC-adjusted).
  */
class FixtureDriftSpec extends SparkSpec {

  private val tiers =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  test("every table loads on a vanilla session (no legacy confs) at all tiers") {
    // newSession shares the context but gets its own SQLConf; drop the
    // legacy conf BEFORE EVERY LOAD — Tables.events defensively re-sets
    // it, so a single up-front unset would leave every subsequent load
    // running with the conf and never exercise the no-conf path.
    val vanilla = spark.newSession()
    vanilla.conf.set("spark.sql.session.timeZone", "UTC")
    for (tier <- tiers; name <- tables) {
      vanilla.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      val df = name match {
        case "events" => Tables.events(vanilla, tier)
        case other    => Tables.load(vanilla, tier, other)
      }
      // analysis + one row forces the physical parquet read path
      assert(df.limit(1).count() == 1, s"$tier/$name: empty or unreadable")
      if (name == "events")
        assert(df.schema("ts").dataType == TimestampType,
          s"$tier/events.ts resolved to ${df.schema("ts").dataType}, want µs TIMESTAMP")
    }
  }

  test("events.ts instants are session-timezone-INDEPENDENT (external non-UTC caller)") {
    // the round-10 review catch: a bare NTZ→timestamp cast interprets the
    // stored wall-clock in the session zone — hours off for any caller
    // not pinned to UTC. Pin equality of unix_micros across UTC and a
    // DST-observing zone on the real fixture.
    val utc = spark.newSession()
    utc.conf.set("spark.sql.session.timeZone", "UTC")
    val ny = spark.newSession()
    ny.conf.set("spark.sql.session.timeZone", "America/New_York")
    def micros(s: org.apache.spark.sql.SparkSession): Map[Long, Long] =
      Tables.events(s, "/root/testdata/sf0.001")
        .select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(micros(ny) == micros(utc),
      "events.ts drifts with the session timezone — external callers get shifted instants")
  }

  test("Tables.events normalizes ns-long, µs-NTZ and µs-UTC encodings identically") {
    val base = java.nio.file.Files.createTempDirectory("graft-drift").toString
    // Ground truth: 1000 instants straddling a second boundary, in µs.
    val us = spark.range(1000)
      .select(col("id").as("event_id"),
        (lit(1700000000000000L) + col("id") * 999937L).as("us"))

    // (a) ns-as-long: plain INT64 column named ts holding ns since epoch.
    //     (Spark cannot WRITE parquet TIMESTAMP(NANOS); the contract under
    //     test is the RESOLVED LongType branch, which is identical for a
    //     NANOS footer read under nanosAsLong and for a plain int64.)
    us.select(col("event_id"), (col("us") * 1000L + 537L).as("ts"))
      .write.mode("overwrite").parquet(s"$base/ns/events.parquet")
    // (b) µs TIMESTAMP_NTZ — what the round-9 regenerated fixture encodes.
    us.select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$base/ntz/events.parquet")
    // (c) µs UTC-adjusted TIMESTAMP — the pre-round-3 encoding.
    us.select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$base/utc/events.parquet")

    val expected = us.select(col("event_id"), col("us")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (enc <- Seq("ns", "ntz", "utc")) {
      val got = Tables.events(spark, s"$base/$enc")
      assert(got.schema("ts").dataType == TimestampType, s"$enc: wrong type")
      val vals = got.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(vals == expected, s"$enc: µs instants differ from ground truth")
    }
  }

  test("events.ts loads as long under the legacy conf only when footer is ns") {
    // On the CURRENT fixtures (µs) the legacy conf must be a no-op: the
    // raw read already resolves to a timestamp type, never LongType.
    val raw = spark.read.parquet(s"$sf0001/events.parquet")
    assert(raw.schema("ts").dataType != LongType,
      "current fixture read as long — nanosAsLong leaked onto a µs column")
  }
}

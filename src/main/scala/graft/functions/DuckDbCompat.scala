package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Percentile
import org.apache.spark.sql.types.TimestampType

/** DuckDB-dialect compatibility functions — thin SQL-name shims over
  * Spark's own Catalyst expressions, registered by [[graft.GraftExtensions]].
  *
  * Purpose: the engine's differential-testing contract keeps one ANSI-ish
  * oracle text per query and runs it on BOTH engines (DuckDB as the
  * external referee, `spark.sql` as the internal third leg — SqlEntrySpec).
  * Most of the dialect gap between the two is nothing but FUNCTION NAMES:
  * DuckDB says `epoch_us`, Spark says `unix_micros`, with identical
  * semantics. Each shim below maps a DuckDB name onto the exact Spark
  * expression with the same semantics — no new evaluation code, just
  * resolution — so the IDENTICAL oracle text parses and agrees on three
  * engines. It doubles as a practical migration aid: DuckDB SQL using
  * these functions runs on a graft session unchanged.
  *
  * Semantics notes (why each mapping is exact):
  *  - epoch_us/epoch_ms: DuckDB returns int64 µs/ms since epoch; Spark's
  *    UnixMicros/UnixMillis do the same on TIMESTAMP. Inputs are cast to
  *    TIMESTAMP first (fixture date columns are TIMESTAMP_NTZ; the
  *    engine's sessions pin UTC, so the cast is value-preserving — the
  *    Det.epochUs/epochMs discipline).
  *  - week: both engines return the ISO-8601 week number.
  *  - sha256(x): DuckDB yields lowercase hex VARCHAR ≡ Spark sha2(x, 256)
  *    (type coercion inserts the string→binary cast exactly as it does
  *    for the built-in sha2).
  *  - xor(a,b): DuckDB's bitwise xor function ≡ Spark's `^` operator
  *    expression (BitwiseXor).
  *  - json_extract_string(j, path): unquoted-VARCHAR JSONPath extraction
  *    ≡ get_json_object.
  *  - array_to_string(arr, sep) ≡ array_join(arr, sep).
  *  - quantile_cont(x, q): continuous (linear-interpolated) quantile ≡
  *    Spark's exact `percentile` aggregate.
  */
object DuckDbCompat {

  private def arity(name: String, n: Int)(c: Seq[Expression]): Unit =
    require(c.length == n, s"$name takes $n arguments, got ${c.length}")

  /** name → expression builder, applied over identically-named DuckDB
    * functions. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "epoch_us" -> { c =>
      arity("epoch_us", 1)(c); UnixMicros(Cast(c.head, TimestampType))
    },
    "epoch_ms" -> { c =>
      arity("epoch_ms", 1)(c); UnixMillis(Cast(c.head, TimestampType))
    },
    "week" -> { c => arity("week", 1)(c); WeekOfYear(c.head) },
    "sha256" -> { c => arity("sha256", 1)(c); Sha2(c.head, Literal(256)) },
    "xor" -> { c => arity("xor", 2)(c); BitwiseXor(c.head, c(1)) },
    "json_extract_string" -> { c =>
      arity("json_extract_string", 2)(c); GetJsonObject(c.head, c(1))
    },
    "array_to_string" -> { c =>
      arity("array_to_string", 2)(c); ArrayJoin(c.head, c(1), None)
    },
    "quantile_cont" -> { c =>
      arity("quantile_cont", 2)(c); new Percentile(c.head, c(1))
    })
}

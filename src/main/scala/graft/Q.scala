package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a named DataFrame query plus (when SQL-expressible)
  * an equivalent ANSI SQL string the driver runs in DuckDB as the oracle.
  * Column names and rounding MUST match exactly between `build` and `oracle`.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

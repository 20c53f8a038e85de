package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Time conversions over raw integer timestamps. */
object TimeFunctions {

  /** Nanosecond long → millisecond long with FLOOR semantics, matching
    * DuckDB's epoch_ms for all inputs including pre-1970: plain `div`
    * truncates toward zero, which disagrees with epoch_ms's floor on
    * negative timestamps. `x - pmod(x, m)` is the exact floor multiple
    * (pmod is non-negative), so the final div is exact. */
  def nsToMs(colName: String): Column =
    expr(s"($colName - pmod($colName, 1000000)) div 1000000")
}

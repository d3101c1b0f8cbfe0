package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — multi-dimensional data layout.
  * Sorting a table by ONE column gives parquet row-group min/max
  * pruning on that column only; sorting by the bit-interleaved key of
  * k columns clusters ALL of them at once, so a range predicate on any
  * subset of the dimensions skips ~n^((k-|subset|)/k) of the files
  * instead of scanning everything (the layout trick behind
  * Delta/Iceberg Z-ordering; public technique, Morton 1966). Write
  * path: `df.repartitionByRange(n, zkey).sortWithinPartitions(zkey)`
  * then plain parquet — the stats do the rest, no reader change.
  *
  * Everything is exact integer arithmetic (rank-scale, shift, mask),
  * deterministic across engines — ZorderSpec pins the locality win,
  * the `zorder_key` oracle pins every bit.
  */
object Zorder {

  /** The interleaved key: each dimension is `(column, min, max)` —
    * value rank-scaled to `bits` bits with clamping (out-of-range
    * values saturate, they don't wrap), then bit i of dimension d lands
    * at position `i * k + d`. Total key width `bits * k` must fit a
    * signed long. Columns must be integral (cast dates to day numbers
    * first).
    */
  def zkey(dims: Seq[(Column, Long, Long)], bits: Int): Column = {
    require(dims.nonEmpty, "at least one dimension")
    require(bits > 0 && bits * dims.size <= 62, "key must fit a signed long")
    val maxRank = (1L << bits) - 1
    val ranked = dims.map { case (c, mn, mx) =>
      require(mx > mn, s"empty range [$mn, $mx]")
      // scale-then-clamp: negative/oversized intermediates saturate to
      // the same 0 / maxRank under Spark's truncating and the oracle's
      // flooring division, so the clamped rank is engine-identical
      least(lit(maxRank), greatest(lit(0L),
        (c.cast("long") - lit(mn)) * maxRank / lit(mx - mn)))
    }
    val k = dims.size
    (0 until bits).flatMap { i =>
      ranked.zipWithIndex.map { case (r, d) =>
        shiftleft(shiftright(r, i).bitwiseAND(lit(1L)), i * k + d)
      }
    }.reduce(_ + _) // terms occupy disjoint bits, so + is bitwise OR
  }

  /** The same key as DuckDB SQL, generated from the same parameters —
    * for oracle construction. `exprs` are SQL spellings of the already
    * integral dimension values.
    */
  def zkeySql(dims: Seq[(String, Long, Long)], bits: Int): String = {
    val maxRank = (1L << bits) - 1
    val k = dims.size
    val ranks = dims.map { case (e, mn, mx) =>
      s"least($maxRank, greatest(0, (($e) - $mn) * $maxRank // ${mx - mn}))"
    }
    (0 until bits).flatMap { i =>
      ranks.zipWithIndex.map { case (r, d) =>
        s"((($r >> $i) & 1) << ${i * k + d})"
      }
    }.mkString(" + ")
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005): approximate token
  * frequencies in fixed `depth × width` memory regardless of
  * cardinality. Each counter row is a plain sum, so the sketch is
  * MERGEABLE — partial sketches combine map-side exactly like any
  * hash aggregate, and sketches of separate corpus shards add. Errors
  * are one-sided (estimates only overcount, by at most ~N/width with
  * probability 1 - 2^-depth) — the right tool for "top tokens of a
  * 100 TB corpus" when the exact `groupBy(token)` shuffle (one row
  * per distinct token) is the bottleneck.
  *
  * Hash family is [[DedupConstants]]' `(a_i·h + b_i) mod P` over the
  * portable md5 60-bit base hash, so a DuckDB oracle replays every
  * counter exactly.
  */
object CountMin {
  import DedupConstants.{P, a, b}

  private def h60(tokenCol: String): Column =
    expr(s"cast(conv(substr(md5($tokenCol), 1, 15), 16, 10) as bigint) % $P")

  private def slotsExpr(depth: Int, width: Int): Column = {
    val aArr = (0 until depth).map(a).mkString("array(", ", ", ")")
    val bArr = (0 until depth).map(b).mkString("array(", ", ", ")")
    expr(s"""transform(sequence(0, ${depth - 1}), d -> struct(d as d,
      ((element_at($aArr, d + 1) * h + element_at($bArr, d + 1)) % $P) % $width as slot))""")
  }

  /** The counter matrix as rows `(d, slot, cnt)` — one count-action
    * materializes it; at scale persist it (or `foreachBatch`-merge it
    * from a stream) and estimate many times.
    */
  def sketch(tokens: DataFrame, tokenCol: String, depth: Int = 4, width: Int = 256): DataFrame =
    tokens.select(h60(tokenCol).as("h"))
      .select(explode(slotsExpr(depth, width)).as("e"))
      .groupBy(col("e.d").as("d"), col("e.slot").as("slot"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for the tokens in `df`: min over the depth
    * counters each token hashes to. Keeps `df`'s columns.
    */
  def estimate(
      cms: DataFrame,
      df: DataFrame,
      tokenCol: String,
      depth: Int = 4,
      width: Int = 256
  ): DataFrame = {
    val keyCols = df.columns.toSeq
    df.withColumn("h", h60(tokenCol))
      .select(keyCols.map(col) :+ explode(slotsExpr(depth, width)).as("e"): _*)
      .select(keyCols.map(col) :+ col("e.d").as("d") :+ col("e.slot").as("slot"): _*)
      .join(cms, Seq("d", "slot"))
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("cnt")).as("est_count"))
  }
}

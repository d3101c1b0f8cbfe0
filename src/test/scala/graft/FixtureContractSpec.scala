package graft

import org.apache.spark.sql.functions._

/** Pins every DATA-SHAPE assumption the query registry bakes into
  * static code or oracle SQL, so the next driver testdata regeneration
  * fails HERE with a one-line diagnosis instead of as a pile of
  * mysterious per-query errors (the r10 TIMESTAMP_NTZ regeneration
  * cost 3 queries + 14 tests before the root cause surfaced; ts
  * encodings themselves are covered by TsEncodingSpec).
  */
class FixtureContractSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("embeddings: 64-dim vectors (SimilarityQueries.Dim and its oracle SQL assume it)") {
    val dims = Tables.embeddings(spark, dir)
      .select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0)).toSeq
    assert(dims == Seq(64),
      s"embedding dim changed to $dims — update SimilarityQueries.Dim (and PqM divisibility), " +
        "the hyperplane/projection seeds' dim args, and every generate_series($Dim) oracle")
  }

  test("documents: columns the text/dedup/multimodal/drift queries address statically") {
    val cols = Tables.documents(spark, dir).columns.toSet
    val needed = Set("doc_id", "text", "lang", "source", "n_chars")
    assert(needed.subsetOf(cols),
      s"documents lost ${needed -- cols} — TextQueries/DedupQueries/MultimodalQueries/" +
        "AnalyticsQueries.drift_report reference these by name in code and oracle SQL")
  }

  test("events: columns the extract/window/streaming queries address statically") {
    val cols = Tables.events(spark, dir).columns.toSet
    val needed = Set("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(needed.subsetOf(cols),
      s"events lost ${needed -- cols} — ReferenceQueries/AnalyticsQueries/StreamingSpec " +
        "reference these by name")
  }

  test("tpch tables: join keys the relational queries address statically") {
    def cols(n: String) = Tables.table(spark, dir, n).columns.toSet
    assert(Set("l_orderkey", "l_quantity", "l_extendedprice").subsetOf(cols("lineitem")))
    assert(Set("o_orderkey", "o_custkey", "o_totalprice").subsetOf(cols("orders")))
    assert(Set("c_custkey", "c_nationkey", "c_acctbal").subsetOf(cols("customer")))
    assert(Set("n_nationkey", "n_regionkey").subsetOf(cols("nation")))
  }

  test("documents doc_id: dense non-negative ids (synthetic-image formulas derive from them)") {
    // the multimodal oracle replays pixel formulas from doc_id — a
    // switch to e.g. random 64-bit ids keeps them valid (formulas are
    // mod-based) but negative ids would break the %-based dims
    val mn = Tables.documents(spark, dir).agg(min("doc_id")).head().getLong(0)
    assert(mn >= 0, s"doc_id went negative ($mn) — syntheticPng's mod-arithmetic dims " +
      "and the aHash oracle CTEs assume non-negative ids")
  }

  test("documents n_chars: non-negative (drift_report's len_bucket divides it)") {
    // Spark `div` truncates toward zero while DuckDB `//` floors — the
    // two agree only on non-negative operands, and drift_report's
    // `n_chars div 256` bucket (code + oracle SQL) relies on that
    val mn = Tables.documents(spark, dir)
      .agg(min("n_chars")).head().get(0).toString.toLong
    assert(mn >= 0, s"n_chars went negative ($mn) — drift_report's len_bucket uses " +
      "truncating `div` in Spark vs flooring `//` in the DuckDB oracle; " +
      "they diverge below zero")
  }
}

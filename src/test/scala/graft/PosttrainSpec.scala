package graft

import graft.operators.Posttrain
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Posttrain semantics on hand fixtures. The load-bearing assertion is
  * the span CONTRACT — substring(rendered, start+1, len) == assistant —
  * checked in-engine, not recomputed by the same arithmetic. */
class PosttrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sftSpans: the span contract holds on every turn, offsets exact") {
    val turns = Seq(
      (1L, 0, "hi", "hello there"),
      (1L, 2, "and?", "bye"), // gap in pos is fine — order, not density
      (2L, 0, "solo", ""))    // empty assistant -> zero-length span
      .toDF("cid", "pos", "u", "a")
    val out = Posttrain.sftSpans(turns, "cid", "pos", "u", "a", system = "S")
    // in-engine contract: the span slices back to the assistant text
    val bad = out.join(turns, out("cid") === turns("cid") &&
        out("turn") === when(turns("pos") === 2, 1).otherwise(turns("pos")))
      .filter(expr("substring(rendered, span_start + 1, span_len)") =!= col("a"))
      .count()
    assert(bad == 0, "substring(rendered, start+1, len) must equal the assistant payload")
    val rows = out.select("cid", "turn", "span_start", "span_len", "n_turns", "rendered")
      .as[(Long, Int, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // conv 1: <|system|>S = 11 chars; turn0 block starts at 11,
    // assistant starts at 11 + 8 + 2 + 13 = 34, len 11
    assert(rows((1L, 0))._3 == 34L && rows((1L, 0))._4 == 11L)
    // turn1 prefix = 8+2+13+11 = 34 -> start = 11+34+8+4+13 = 70, len 3
    assert(rows((1L, 1))._3 == 70L && rows((1L, 1))._4 == 3L)
    assert(rows((1L, 0))._6.endsWith("<|end|>") && rows((1L, 0))._5 == 2L)
    assert(rows((2L, 0))._4 == 0L && rows((2L, 0))._5 == 1L)
    // rendered repeats identically across a conversation's turns
    assert(rows((1L, 0))._6 == rows((1L, 1))._6)
  }

  test("sftRendered + sftSpansOnly join back to exactly sftSpans (normalized-pair identity)") {
    val turns = Seq(
      (1L, 0, "hi", "hello there"),
      (1L, 2, "and?", "bye"),
      (2L, 0, "solo", ""))
      .toDF("cid", "pos", "u", "a")
    val full = Posttrain.sftSpans(turns, "cid", "pos", "u", "a", system = "S")
    val spans = Posttrain.sftSpansOnly(turns, "cid", "pos", "u", "a", system = "S")
    val conv = Posttrain.sftRendered(turns, "cid", "pos", "u", "a", system = "S")
    // one row per conversation, rendered identical to the per-turn copy
    assert(conv.count() == 2)
    val joined = spans.join(conv.select(col("cid"), col("rendered")), "cid")
      .select("cid", "turn", "span_start", "span_len", "n_turns", "rendered")
    val a = joined.orderBy("cid", "turn").collect().toSeq
    val b = full.select("cid", "turn", "span_start", "span_len", "n_turns", "rendered")
      .orderBy("cid", "turn").collect().toSeq
    assert(a == b, "join-back must reproduce sftSpans exactly")
    // the span contract holds THROUGH the join-back
    assert(joined.join(turns, joined("cid") === turns("cid") &&
        joined("turn") === when(turns("pos") === 2, 1).otherwise(turns("pos")))
      .filter(expr("substring(rendered, span_start + 1, span_len)") =!= col("a"))
      .count() == 0)
  }

  test("sftSpans: same-pos turns order deterministically by the block tie-break") {
    // two turns share pos=0 — ADVICE r16: with a pos-only ordering the
    // prefix sum, row_number and sort_array could disagree; with the
    // shared (pos, block) tie-break the span contract must still hold
    // and the order is the block-string order
    val turns = Seq(
      (1L, 0, "zz", "later"),
      (1L, 0, "aa", "first"))
      .toDF("cid", "pos", "u", "a")
    val out = Posttrain.sftSpans(turns, "cid", "pos", "u", "a", system = "S")
    val bad = out.join(turns.select(col("a").as("pay")),
        expr("substring(rendered, span_start + 1, span_len)") === col("pay"))
    assert(bad.count() == 2, "every span must slice back to SOME payload")
    // turn 0 is the lexicographically smaller block ("<|user|>aa…")
    val t0 = out.filter(col("turn") === 0)
      .select(expr("substring(rendered, span_start + 1, span_len)"))
      .as[String].head()
    assert(t0 == "first")
  }

  test("dpoPairs: tie-breaks, gap gate, and candidate-count gate") {
    val cands = Seq(
      // prompt 1: clear winner/loser + a tie at the top (id 11 wins it)
      (1L, 11L, 90L), (1L, 12L, 90L), (1L, 13L, 10L),
      // prompt 2: all tied -> gap 0 -> dropped
      (2L, 21L, 50L), (2L, 22L, 50L),
      // prompt 3: single candidate -> dropped
      (3L, 31L, 99L))
      .toDF("prompt_id", "event_id", "score")
    val out = Posttrain.dpoPairs(cands, "prompt_id", "event_id", "score")
      .select("prompt_id", "chosen_id", "rejected_id", "gap", "n_candidates")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 11L, 13L, 80L, 3L)))
    // a minGap above the fixture's best gap empties the result
    assert(Posttrain.dpoPairs(cands, "prompt_id", "event_id", "score",
      minGap = 81L).count() == 0)
  }
}

package graft

import graft.operators.{Pack, Tokenize}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE training/encoding against hand-computed fixtures, and the
  * sequence-packing invariants.
  */
class TokenizePackSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the classic BPE teaching corpus: word frequencies
  // hug=10 pug=5 pun=12 bun=4 hugs=5
  private def fixtureCorpus = {
    val words = Seq("hug" -> 10, "pug" -> 5, "pun" -> 12, "bun" -> 4, "hugs" -> 5)
    words.flatMap { case (w, n) => Seq.fill(n)(w) }.toDF("text")
  }

  test("trainBpe learns the hand-computed merge sequence") {
    // pair counts by hand: (u,g)=20 > (p,u)=17 > (u,n)=16 → after
    // merging 'ug': (u,n)=16 > (h,ug)=15 → then (h,ug)=15
    val merges = Tokenize.trainBpe(fixtureCorpus, "text", numMerges = 3)
    assert(merges == Seq(("u", "g"), ("u", "n"), ("h", "ug")))
  }

  test("BpeCodec encodes with learned merges exactly") {
    val codec = new Tokenize.BpeCodec(Seq(("u", "g"), ("u", "n"), ("h", "ug")))
    assert(codec.encodeWord("hug").toSeq == Seq("hug"))
    assert(codec.encodeWord("pun").toSeq == Seq("p", "un"))
    assert(codec.encodeWord("hugs").toSeq == Seq("hug", "s"))
    assert(codec.encodeWord("bun").toSeq == Seq("b", "un"))
    assert(codec.encodeWord("zzz").toSeq == Seq("z", "z", "z")) // untrained
    assert(codec.encode("hug pun hugs bun").toSeq ==
      Seq("hug", "p", "un", "hug", "s", "b", "un"))
    assert(codec.countTokens("hug pun hugs bun") == 7)
    assert(codec.countTokens("") == 0)
  }

  test("merge application folds ALL occurrences left-to-right") {
    val codec = new Tokenize.BpeCodec(Seq(("a", "a")))
    // aaaa → (aa)(aa); aaa → (aa)a — the leftmost pair wins first
    assert(codec.encodeWord("aaaa").toSeq == Seq("aa", "aa"))
    assert(codec.encodeWord("aaa").toSeq == Seq("aa", "a"))
  }

  test("parseMergesLines reads the GPT-2 merges format") {
    val merges = Tokenize.parseMergesLines(Seq(
      "#version: 0.2", "", "u g", "u n", "h ug"))
    assert(merges == Seq(("u", "g"), ("u", "n"), ("h", "ug")))
  }

  test("parseMergesLines keeps '#'-initial merge rules (only the version header is a comment)") {
    // real GPT-2 merges files contain rules for '#'-run symbols
    val merges = Tokenize.parseMergesLines(Seq(
      "#version: 0.2", "# #", "## #", "a b"))
    assert(merges == Seq(("#", "#"), ("##", "#"), ("a", "b")))
  }

  test("trainBpe word-dictionary cap introduces NO bias on a Zipfian corpus") {
    // trainBpe caps the driver-side word dictionary at maxWords
    // (standard practice: the head carries the pair-count mass). This
    // quantifies the cap's bias instead of asserting it away: train on
    // the FULL dictionary vs a 10x-smaller cap over the real documents
    // corpus and compare (a) the merges tables and (b) the downstream
    // exact token counts they induce. On natural Zipf-shaped text the
    // tail words are singletons whose pairs are dominated by the head,
    // so the tables should agree exactly; if a future corpus breaks
    // (a), (b) bounds the damage in token units.
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val full = Tokenize.trainBpe(docs, "text", numMerges = 50, maxWords = Int.MaxValue)
    val capped = Tokenize.trainBpe(docs, "text", numMerges = 50, maxWords = 500)
    if (full == capped) succeed
    else {
      // tables diverged: the downstream-token-count bias must be tiny
      val nFull = Tokenize.bpeCounts(docs, "doc_id", "text", full)
        .agg(sum("n_bpe_exact")).head().getLong(0)
      val nCapped = Tokenize.bpeCounts(docs, "doc_id", "text", capped)
        .agg(sum("n_bpe_exact")).head().getLong(0)
      val rel = math.abs(nFull - nCapped).toDouble / nFull
      assert(rel < 0.01, s"cap bias too large: full=$nFull capped=$nCapped rel=$rel")
    }
  }

  test("distributed BPE trainer equals the driver trainer uncapped") {
    // the scale path: dictionary stays a DataFrame, one pair-count
    // shuffle per round, narrow HOF merge apply. Same tie-breaks as
    // the driver loop, so the two must produce IDENTICAL merge tables
    // — on the hand-computed fixture and on the real documents corpus
    val fixture = Tokenize.trainBpeDistributed(fixtureCorpus, "text", numMerges = 3)
    assert(fixture == Seq(("u", "g"), ("u", "n"), ("h", "ug")))
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val distributed = Tokenize.trainBpeDistributed(docs, "text", numMerges = 25)
    val driver = Tokenize.trainBpe(docs, "text", numMerges = 25, maxWords = Int.MaxValue)
    assert(distributed == driver)
  }

  test("trainers agree on supplementary-plane tie-breaks") {
    // U+1F600 (emoji, a surrogate pair in UTF-16) vs U+E000 (BMP
    // private use): UTF-16 code-unit order ranks the emoji FIRST
    // (0xD83D < 0xE000) while code-point order — Spark's UTF8String
    // binary order — ranks it LAST (0x1F600 > 0xE000). A pair-count
    // tie between the two words is exactly where a String.compareTo
    // tie-break would silently diverge from the distributed trainer.
    val emoji = new String(Character.toChars(0x1F600))
    val corpus = Seq(s"$emoji!", s"$emoji!", s"${'\uE000'}!", s"${'\uE000'}!").toDF("text")
    val driver = Tokenize.trainBpe(corpus, "text", numMerges = 1, maxWords = Int.MaxValue)
    val dist = Tokenize.trainBpeDistributed(corpus, "text", numMerges = 1)
    assert(driver == Seq(("\uE000", "!")), s"driver picked $driver")
    assert(dist == driver)
  }

  test("bpeCounts emits exact counts over a DataFrame") {
    val df = Seq((1L, "hug pun"), (2L, "hugs"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Tokenize.bpeCounts(df, "doc_id", "text",
        Seq(("u", "g"), ("u", "n"), ("h", "ug")))
      .orderBy("doc_id")
      .as[(Long, Int, Int)].collect().toSeq
    assert(out == Seq((1L, 2, 3), (2L, 1, 2), (3L, 0, 0)))
  }

  test("pack: every doc exactly once, no mixed bin over budget, oversize flagged") {
    val docs = (1L to 500L).map(i => (i, (i * 37 % 900 + 1).toInt)).toDF("doc_id", "n_tok")
    val bins = Pack.sequences(docs, "doc_id", "n_tok", maxTokens = 512, numShards = 8)
    val rows = bins.collect()
    // every doc packed exactly once
    val packed = rows.flatMap(_.getString(5).split(",")).map(_.toLong).sorted
    assert(packed.toSeq == (1L to 500L).toSeq)
    // non-oversize bins respect the budget; oversize bins are singletons
    rows.foreach { r =>
      val (nDocs, total, over) = (r.getInt(1), r.getInt(2), r.getBoolean(4))
      if (over) { assert(nDocs == 1); assert(total > 512) }
      else assert(total <= 512)
    }
    // totals line up with the input
    assert(rows.map(_.getInt(2).toLong).sum == docs.agg(sum("n_tok")).head().getLong(0))
  }

  test("pack output is a pure function of the data, not the partition layout") {
    val docs = (1L to 300L).map(i => (i, (i * 13 % 400 + 1).toInt)).toDF("doc_id", "n_tok")
    def run(d: org.apache.spark.sql.DataFrame) =
      Pack.sequences(d, "doc_id", "n_tok", maxTokens = 256, numShards = 4)
        .orderBy("bin_id")
        .as[(Long, Int, Int, Double, Boolean, String)].collect().toSeq
    assert(run(docs) == run(docs.repartition(11)))
  }

  test("withTokens reassembles packed training rows in pack order") {
    val merges = Seq(("u", "g"), ("u", "n"), ("h", "ug"))
    val docs = Seq((1L, "hug pun"), (2L, "hugs bun"), (3L, "pug"))
      .toDF("doc_id", "text")
    val enc = graft.operators.Tokenize.bpeEncode(docs, "doc_id", "text", merges)
    val bins = Pack.sequences(enc, "doc_id", "n_bpe_exact", maxTokens = 16, numShards = 1)
    val rows = Pack.withTokens(bins, enc, "doc_id", "bpe_tokens").collect()
    // every packed row's token stream is exactly the member docs'
    // tokens concatenated in doc_ids order, and lengths reconcile
    val byId = enc.select("doc_id", "bpe_tokens")
      .as[(Long, Seq[String])].collect().toMap
    val binMembers = bins.select("bin_id", "doc_ids")
      .as[(Long, String)].collect().toMap
    rows.foreach { r =>
      val expect = binMembers(r.getLong(0)).split(",").map(_.toLong)
        .flatMap(byId).toSeq
      assert(r.getSeq[String](3) == expect)
      assert(r.getSeq[String](3).length == r.getInt(2)) // == total_tokens
    }
    assert(rows.map(_.getSeq[String](3).length).sum ==
      byId.values.map(_.length).sum) // nothing lost corpus-wide
  }

  test("Tokenize.chunk windows match a naive slicer: coverage, overlap, short tail") {
    val rnd = new scala.util.Random(13)
    val docs = (1L to 40L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(90))("t" + rnd.nextInt(50)).mkString(" ")
    }
    val got = Tokenize.chunk(docs.toDF("doc_id", "text"), "doc_id", "text",
        size = 10, stride = 7)
      .select("doc_id", "chunk_idx", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val exp =
        if (toks.length <= 10) Seq(toks.toSeq)
        else (0 until math.ceil((toks.length - 10) / 7.0).toInt + 1)
          .map(i => toks.slice(i * 7, i * 7 + 10).toSeq)
      val g = got(id)
      assert(g.length == exp.length, s"doc $id chunk count")
      g.zip(exp).zipWithIndex.foreach { case (((_, idx, nt, ct), e), i) =>
        assert(idx == i && ct == e.mkString(" ") && nt == e.length, s"doc $id chunk $i")
      }
    }
  }

  test("fillStats summarizes packing efficiency") {
    val docs = (1L to 100L).map(i => (i, 100)).toDF("doc_id", "n_tok")
    val bins = Pack.sequences(docs, "doc_id", "n_tok", maxTokens = 1000, numShards = 2)
    val s = Pack.fillStats(bins, 1000).head()
    assert(s.getLong(1) == 100L)          // n_docs
    assert(s.getLong(2) == 10000L)        // total tokens
    assert(s.getLong(4) < 2 * 1000L)      // waste bounded: <1 bin per shard
  }
}

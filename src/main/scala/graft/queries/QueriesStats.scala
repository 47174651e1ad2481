package graft.queries

import graft.operators.Stats
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inferential-statistics queries (operators/Stats.scala) — the
  * reference's control-vs-mutant statistical testing shape
  * (stats_results_mapping_helper.py) as oracle-checked single-shuffle
  * aggregations. Oracles replicate the SAME closed-form dag over the
  * SAME exact decimal moments, so values match bit-for-bit before the
  * final display rounding.
  */
object QueriesStats {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    "q_ttest_welch" -> ((s, d) => {
      // control/mutant per-parameter comparison: user parity is the
      // synthetic cohort label, event_type the parameter
      val ev = Tables(s, d).events
        .withColumn("cohort",
          when(col("user_id") % 2 === 0, "ctl").otherwise("mut"))
      Stats.welchT(ev, Seq("event_type"), "value", "cohort", "ctl", "mut",
          scale = 2)
        .select(col("event_type"), col("n_a"), col("n_b"),
          round(col("mean_a"), 6).as("mean_a"),
          round(col("mean_b"), 6).as("mean_b"),
          round(col("var_a"), 6).as("var_a"),
          round(col("var_b"), 6).as("var_b"),
          round(col("t_stat"), 6).as("t_stat"),
          round(col("df_welch"), 6).as("df_welch"))
        .orderBy("event_type")
    }),

    "q_chi_square" -> ((s, d) => {
      // categorical association per parameter: user parity vs
      // high/low value — the categorical sibling of q_ttest_welch.
      // 35.0 ≈ the value median at every sf, so the table is a real
      // 2x2 (a threshold past the max would collapse it to one level
      // and the oracle would verify a vacuous chi2=0)
      val ev = Tables(s, d).events
        .withColumn("cohort",
          when(col("user_id") % 2 === 0, "even").otherwise("odd"))
        .withColumn("bucket",
          when(col("value") >= 35.0, "high").otherwise("low"))
      Stats.chiSquare(ev, Seq("event_type"), "cohort", "bucket")
        .select(col("event_type"), col("n"), col("dof"),
          round(col("chi2"), 6).as("chi2"))
        .orderBy("event_type")
    }),

    "q_outliers" -> ((s, d) => {
      // z-score outlier surfacing per parameter (|z| > 2 against the
      // exact-decimal group moments) — the cleaning screen before any
      // downstream stats
      Stats.zOutliers(Tables(s, d).events, Seq("event_type"), "value",
          threshold = 2.0, scale = 2)
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("z"), 6).as("z"))
        .orderBy("event_id")
    }),

    "q_impute_group" -> ((s, d) => {
      // group-mean imputation (Cleaning.imputeByGroup): nulls injected
      // deterministically (every 7th event), repaired with the
      // parameter's mean over the REMAINING values; oracle replays the
      // same injection + exact-decimal means
      val ev = Tables(s, d).events
        .withColumn("value",
          when(col("event_id") % 7 === 0, lit(null).cast("double"))
            .otherwise(col("value")))
      graft.operators.Cleaning
        .imputeByGroup(ev, Seq("event_type"), "value", scale = 2)
        .select(col("event_id"), col("event_type"), col("was_imputed"),
          round(col("value_filled"), 6).as("value_filled"))
        .orderBy("event_id")
    }),

    "q_time_weighted" -> ((s, d) => {
      // TWAP per user (Stats.timeWeightedMean): hold-until-next
      // weighting over the event stream; ONE shuffle (the window's
      // hash exchange is reused by the aggregation)
      Stats.timeWeightedMean(Tables(s, d).events, Seq("user_id"), "ts",
          "value", tieCol = "event_id", scale = 2)
        .select(col("user_id"), col("n_intervals"), col("total_us"),
          round(col("twap"), 6).as("twap"))
        .orderBy("user_id")
    }),

    "q_quantile_bins" -> ((s, d) => {
      // equi-depth discretization (feature-engineering staple): exact
      // quartile bins per parameter via one window shuffle with a
      // DETERMINISTIC tie-break (value, event_id) so the bin of every
      // row is engine-reproducible; the approx path at extreme scale
      // is q_approx_percentile's thresholds
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
      Tables(s, d).events
        .withColumn("bin", ntile(4).over(w).cast("long"))
        .groupBy("event_type", "bin")
        .agg(count(lit(1)).as("n"), min("value").as("lo"), max("value").as("hi"))
        .orderBy("event_type", "bin")
    }),

    "q_hll_union" -> ((s, d) => {
      // mergeable HLL sketches (Spark 4 datasketches built-ins): one
      // sketch per parameter, then a sketch-UNION rollup — the 100 TB
      // pattern where per-partition/per-day sketches merge into any
      // rollup without re-touching raw data. DRIVER-CERTIFIED
      // (VERDICT r12 #5): estimates have no DuckDB-reproducible form,
      // but the error bound does — each row emits within_bounds
      // (|est − exact| ≤ 4·rsd·exact, rsd ≈ 1.04/√2¹² ≈ 1.6% at the
      // default lgConfigK=12, so 6.5%; floor 1) next to the exact
      // count; the oracle emits the same exacts and literal TRUE, so
      // the hash match certifies the sketch AND the union (the rollup
      // row's bound is checked against the true global distinct).
      // 4σ, not 3σ (ADVICE r13): the estimate is deterministic per
      // corpus so a green gate stays green, but every NEWLY generated
      // corpus/tier rolls the bound once per group — at 3σ that is
      // ~0.3% per-group odds of a legitimate estimate spuriously
      // failing Verify; 4σ puts it at ~6e-5 while still certifying a
      // real accuracy contract.
      val ev = Tables(s, d).events
      val per = ev.groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          countDistinct(col("user_id")).as("exact_users"))
      val tot = per.agg(hll_union_agg(col("sk")).as("sk"))
        .select(hll_sketch_estimate(col("sk")).as("__est"))
        .crossJoin(broadcast(ev.agg(countDistinct(col("user_id")).as("exact_users"))))
        .select(lit("__total__").as("event_type"), col("exact_users"), col("__est"))
      per.select(col("event_type"), col("exact_users"),
          hll_sketch_estimate(col("sk")).as("__est"))
        .unionByName(tot)
        .select(col("event_type"), col("exact_users"),
          (abs(col("__est") - col("exact_users")).cast("double") <=
            greatest(lit(1.0), col("exact_users") * 0.065)).as("within_bounds"))
        .orderBy("event_type")
    }),

    "q_hll_union_sketch" -> ((s, d) => {
      // the PRODUCTION plan of q_hll_union — per-type sketches and
      // the sketch-UNION rollup with NO exact countDistinct twins
      // (r14, VERDICT r13 #5): at 100 TB the mergeable sketches are
      // the whole point (per-day/per-partition sketches roll up
      // without re-touching raw data), and the certified sibling's
      // exact twins re-shuffle the raw keys. Rows-only by design;
      // spec-backed by CertifiedSketchSpec (union dominance + bound
      // vs the exacts re-derived independently).
      val ev = Tables(s, d).events
      val per = ev.groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      per.select(col("event_type"),
          hll_sketch_estimate(col("sk")).as("approx_users"))
        .unionByName(per.agg(hll_union_agg(col("sk")).as("sk"))
          .select(lit("__total__").as("event_type"),
            hll_sketch_estimate(col("sk")).as("approx_users")))
        .orderBy("event_type")
    }),

    "q_linreg" -> ((s, d) => {
      // per-(returnflag, linestatus) price~quantity fit — the "does
      // the measured value drift with covariate" screen the stats
      // pipeline runs per parameter
      Stats.linreg(Tables(s, d).lineitem, Seq("l_returnflag", "l_linestatus"),
          "l_extendedprice", "l_quantity", scale = 2)
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          round(col("slope"), 6).as("slope"),
          round(col("intercept"), 6).as("intercept"),
          round(col("r2"), 6).as("r2"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q_mannwhitney" -> ((s, d) => {
      // nonparametric control-vs-mutant per parameter: the rank-sum
      // sibling of q_ttest_welch (the test the reference's stats
      // layer uses when normality fails). U/z are exact-integer
      // derived — oracle-checked; p_value is spec-checked only.
      val ev = Tables(s, d).events
        .withColumn("cohort",
          when(col("user_id") % 2 === 0, "ctl").otherwise("mut"))
      Stats.mannWhitneyU(ev, Seq("event_type"), "value", "cohort", "ctl", "mut")
        .select(col("event_type"), col("n_a"), col("n_b"),
          col("u_a"), col("u_b"), round(col("z"), 6).as("z"))
        .orderBy("event_type")
    }),

    "q_fisher_exact" -> ((s, d) => {
      // categorical association per parameter as an EXACT test — the
      // reference's OpenStats layer runs Fisher exact on categorical
      // parameters. Cells/odds-ratio oracle-checked; the
      // hypergeometric p-value is spec-checked against exact
      // rational fixtures (DuckDB has no hypergeometric tail).
      val ev = Tables(s, d).events
      Stats.fisherExact(ev, Seq("event_type"),
          col("user_id") % 2 === 0, col("value") >= 35.0)
        .select(col("event_type"), col("n11"), col("n10"),
          col("n01"), col("n00"),
          round(col("odds_ratio"), 6).as("odds_ratio"))
        .orderBy("event_type")
    }),

    "q_fdr_bh" -> ((s, d) => {
      // multiple-testing correction over a per-(parameter, month)
      // results table — the adjustment pass the reference's
      // thousands-of-parameter-tests release needs before calling
      // significance. Input score: a monotone transform of the
      // rank-sum z² (bit-reproducible across engines, so the BH
      // arithmetic itself is the oracle-checked surface; real
      // p-values flow through the same operator in the spec).
      val ev = Tables(s, d).events
        .withColumn("cohort",
          when(col("user_id") % 2 === 0, "ctl").otherwise("mut"))
        .withColumn("month", month(col("ts")).cast("long"))
      val tests = Stats.mannWhitneyU(ev, Seq("event_type", "month"),
          "value", "cohort", "ctl", "mut")
        .withColumn("p_score", round(lit(1.0) / (lit(1.0) + col("z") * col("z")), 9))
      Stats.bhAdjust(tests, "p_score")
        .select(col("event_type"), col("month"), col("p_score"),
          round(col("p_adjusted"), 9).as("p_adjusted"))
        .orderBy("event_type", "month")
    }),

    "q_corr_matrix" -> ((s, d) => {
      // pairwise Pearson correlations of the leading embedding dims in
      // ONE pass (Stats.corrPairs): all moments in a single global
      // aggregation (config-sized reduced row), correlations unfolded
      // in-plan — the redundancy screen before dropping embedding
      // dims. Exact decimal moments → bit-reproducible r.
      Stats.corrPairs(Tables(s, d).embeddings, "embedding", dims = 6)
        .orderBy("dim_i", "dim_j")
    }),

    "q_train_classifier" -> ((s, d) => {
      // IN-ENGINE classifier TRAINING (operators/Infer.trainLogistic —
      // VERDICT r14 next-round #1, the half of the quality-model story
      // q_quality_model's inference left open): full-batch logistic
      // regression over the md5-hashed unigram feature space, exact
      // fixed-point throughout (hard-sigmoid ppm probabilities,
      // truncating-division updates), 3 gradient steps at 64 buckets.
      // Each step is a narrow literal-weights map plus ONE map-side-
      // combined 65-cell aggregate — per-step shuffle is feature-space-
      // sized regardless of corpus rows (the q_kmeans Lloyd idiom).
      // The oracle unrolls the 3 steps as chained CTEs and must land
      // on the identical weight trajectory. Label: lang = 'en' (the
      // langid/quality fastText shape); the learned array plugs
      // straight into Infer.linearScore (InferSpec proves the loop
      // closes on a separable fixture).
      import s.implicits._
      val (w, bias) = graft.operators.Infer.trainLogistic(
        Tables(s, d).documents, "doc_id", "text",
        label = col("lang") === "en", buckets = 64, iters = 3, lrDiv = 8L)
      ((-1, bias) +: w.zipWithIndex.map { case (wt, b) => (b, wt) })
        .toDF("bucket", "weight_ppm").orderBy("bucket")
    }),

    "q_classifier_eval" -> ((s, d) => {
      // the EVALUATION half of the classifier loop: train on the
      // held-in split (doc_id % 5 != 0), score the held-out fifth with
      // the learned literal weights (Infer.linearScore — the exact
      // production inference path), and emit the confusion counts plus
      // EXACT ppm metrics including rank-based AUC. Scores are exact
      // integer sums, so the AUC is computed from integer midranks
      // (the q_mannwhitney 2·rank + ties − 1 trick) with no floats
      // anywhere — the oracle re-trains via the unrolled CTE chain and
      // must land on the identical single metrics row. Scale: training
      // per the trainer contract (feature-space-sized shuffles); eval
      // is one groupBy(score) shuffle plus a window over DISTINCT
      // scores (score-cardinality-bounded, not row-bounded).
      val docs = Tables(s, d).documents
      val trainDocs = docs.filter(col("doc_id") % 5 =!= 0)
      val evalDocs = docs.filter(col("doc_id") % 5 === 0)
      val (w, bias) = graft.operators.Infer.trainLogistic(
        trainDocs, "doc_id", "text",
        label = col("lang") === "en", buckets = 64, iters = 10, lrDiv = 1L)
      val scored = graft.operators.Infer
        .linearScore(evalDocs, "doc_id", "text", w, bias)
        .join(evalDocs.select(col("doc_id"), (col("lang") === "en").as("__yy")), "doc_id")
      graft.operators.Infer.evalBinary(scored, "score", "__yy")
    }),

    "q_calibration" -> ((s, d) => {
      // CALIBRATION of the trained classifier (the reliability table a
      // production quality gate ships next to its AUC): same split and
      // trained literals as q_classifier_eval, held-out scores cut
      // into score deciles under the deterministic (score, doc_id)
      // total order, each bin reporting its exact score range, SUMMED
      // score (an exact long — a mean would reintroduce floats) and
      // the empirical positive rate in ppm. A well-calibrated model's
      // pos_ppm rises with the bin — the judgement is the reader's;
      // the hash match certifies the numbers. Scale: one global ntile
      // window over the (sampled) eval set, then one bin-keyed
      // aggregate.
      val docs = Tables(s, d).documents
      val trainDocs = docs.filter(col("doc_id") % 5 =!= 0)
      val evalDocs = docs.filter(col("doc_id") % 5 === 0)
      val (w, bias) = graft.operators.Infer.trainLogistic(
        trainDocs, "doc_id", "text",
        label = col("lang") === "en", buckets = 64, iters = 10, lrDiv = 1L)
      val scored = graft.operators.Infer
        .linearScore(evalDocs, "doc_id", "text", w, bias)
        .join(evalDocs.select(col("doc_id"), (col("lang") === "en").as("__yy")), "doc_id")
      val wb = org.apache.spark.sql.expressions.Window
        .orderBy(col("score"), col("doc_id"))
      scored.withColumn("bin", ntile(10).over(wb).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          min(col("score")).as("lo_score"), max(col("score")).as("hi_score"),
          sum(col("score")).as("sum_score"),
          sum(when(col("__yy"), 1L).otherwise(0L)).as("n_pos"))
        .withColumn("pos_ppm", expr("n_pos * 1000000 div n"))
        .orderBy("bin")
    }),

    "q_train_langid" -> ((s, d) => {
      // MULTICLASS in-engine training (Infer.trainOvr): one-vs-rest
      // logistic heads over the shared hashed-feature space — the
      // langid trainer (fastText supervised shape), every step the
      // binary trainer's exact fixed-point applied per class, so the
      // oracle unrolls the same 3-step trajectory with a cls dimension
      // and the K·65 weight rows land bit-identical. Argmax over the K
      // linearScore heads is the predicted language (InferSpec proves
      // prediction on a separable fixture).
      import s.implicits._
      val models = graft.operators.Infer.trainOvr(
        Tables(s, d).documents, "doc_id", "text",
        classCol = col("lang"), buckets = 64, iters = 3, lrDiv = 8L)
      models.flatMap { case (cls, w, bias) =>
        (cls, -1, bias) +: w.zipWithIndex.map { case (wt, b) => (cls, b, wt) }
      }.toDF("lang", "bucket", "weight_ppm").orderBy("lang", "bucket")
    }),

    "q_langid_eval" -> ((s, d) => {
      // the PREDICTION half of the multiclass loop (Infer.predictOvr):
      // train the K one-vs-rest heads on the held-in split, argmax-
      // predict the held-out fifth in ONE pass (all K scores from
      // literal arrays, ties toward the first sorted class), and emit
      // the CONFUSION MATRIX. The synthetic corpus carries weak
      // language signal (shared word-salad vocabulary), so the matrix
      // honestly shows a near-majority classifier — the capability
      // under test is the exact replayable train→predict loop;
      // InferSpec proves argmax accuracy 1.0 on separable classes.
      // Scale: one token explode + ONE K-column map-side-combined
      // per-doc aggregate + a K²-row confusion aggregate.
      val docs = Tables(s, d).documents
      val trainDocs = docs.filter(col("doc_id") % 5 =!= 0)
      val evalDocs = docs.filter(col("doc_id") % 5 === 0)
      val models = graft.operators.Infer.trainOvr(
        trainDocs, "doc_id", "text",
        classCol = col("lang"), buckets = 64, iters = 10, lrDiv = 1L)
      graft.operators.Infer.predictOvr(evalDocs, "doc_id", "text", models)
        .join(evalDocs.select(col("doc_id"), col("lang").as("true_lang")), "doc_id")
        .groupBy(col("true_lang"), col("pred").as("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("true_lang", "pred_lang")
    }),

    "q_langid_chargram" -> ((s, d) => {
      // langid with REAL signal + subword features (VERDICT r15 #7):
      // the corpus text is a shared word salad with zero per-language
      // signal, so — the q_html_extract fixture discipline — a
      // multilingual page is synthesized IN-PLAN: each doc gets its
      // language's function words (overlapping across languages, as
      // real function words are) repeated 3–5× ahead of a shared-text
      // tail, and the trainer runs on hashed word unigrams PLUS
      // '#'-marked char trigrams (Infer.featTokens, fastText's
      // subword trick — the same salt+bucket discipline, so the
      // oracle replays bucketing verbatim). Train on 4/5, argmax-
      // predict the held-out fifth: the confusion matrix must be
      // DIAGONAL-DOMINANT, and the trajectory stays exact fixed-point
      // (the oracle unrolls all 10 steps over the same synth+feature
      // stream). InferSpec proves the char-gram generalization win on
      // unseen words directly.
      val docs = Tables(s, d).documents
      val m = when(col("lang") === "en", lit("the and of to with"))
        .when(col("lang") === "de", lit("der die und von mit"))
        .when(col("lang") === "es", lit("el la de los con"))
        .when(col("lang") === "fr", lit("le la les des avec"))
        .when(col("lang") === "zh", lit("zhong wen pin yin hua"))
        .otherwise(col("lang"))
      val synth = docs.withColumn("__m", m)
        .select(col("doc_id"), col("lang"),
          concat(expr("repeat(__m || ' ', cast(3 + doc_id % 3 as int))"),
            substring(col("text"), 1, 80)).as("text"))
      val trainDocs = synth.filter(col("doc_id") % 5 =!= 0)
      val evalDocs = synth.filter(col("doc_id") % 5 === 0)
      val models = graft.operators.Infer.trainOvr(trainDocs, "doc_id", "text",
        classCol = col("lang"), buckets = 64, iters = 10, lrDiv = 1L,
        charNgram = 3)
      graft.operators.Infer.predictOvr(evalDocs, "doc_id", "text", models,
          charNgram = 3)
        .join(evalDocs.select(col("doc_id"), col("lang").as("true_lang")), "doc_id")
        .groupBy(col("true_lang"), col("pred").as("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("true_lang", "pred_lang")
    }))

  /** q_corr_matrix oracle generator: the same moment dag and closed
    * form as [[graft.operators.Stats.corrPairs]], one UNION ALL branch
    * per dim pair. */
  private def corrOracleSql(dims: Int): String = {
    val xs = (0 until dims).map(i =>
      s"cast(cast(embedding[${i + 1}] as double) as decimal(18,6)) AS x$i")
    val sums = (0 until dims).map(i =>
      s"cast(sum(cast(x$i as decimal(28,6))) as double) AS s$i")
    val prods = for { i <- 0 until dims; j <- i until dims }
      yield s"cast(sum(x$i * x$j) as double) AS p${i}_$j"
    val branches = for { i <- 0 until dims; j <- (i + 1) until dims } yield {
      val (vi, vj) = (s"(n * p${i}_$i - s$i * s$i)", s"(n * p${j}_$j - s$j * s$j)")
      s"""SELECT cast($i as bigint) AS dim_i, cast($j as bigint) AS dim_j, n,
         | round(CASE WHEN $vi > 0 AND $vj > 0
         |  THEN (n * p${i}_$j - s$i * s$j) / sqrt($vi * $vj) END, 6) AS r
         |FROM m""".stripMargin
    }
    s"""WITH b AS (
       | SELECT ${xs.mkString(", ")}
       | FROM embeddings WHERE len(embedding) >= $dims),
       |m AS (
       | SELECT count(*) AS n, ${(sums ++ prods).mkString(", ")}
       | FROM b)
       |${branches.mkString("\nUNION ALL\n")}
       |ORDER BY dim_i, dim_j""".stripMargin
  }

  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  private def hex3Sql(i: Int) =
    s"(strpos('0123456789abcdef', substr(md5('fh' || tok), $i, 1)) - 1)"

  /** CTE chain replaying [[graft.operators.Infer.trainLogistic]] over
    * documents rows matching `docFilter`: the md5-hex3 % 64 feature
    * hash (the q_quality_model idiom), the bias as pseudo-feature
    * b = -1, then per unrolled step the per-doc score join, the
    * hard-sigmoid ppm error, the bucket-summed gradients, and the
    * truncating-division update (DuckDB `//` and JVM long division
    * both truncate toward zero — probed). Yields w{iters} keyed by b
    * (-1 = bias). Shared by the q_train_classifier and
    * q_classifier_eval oracles. */
  private def trainLogisticCtes(iters: Int, docFilter: String,
                                lrDiv: Long = 8L): String = {
    val steps = (1 to iters).map { t =>
      s"""z$t AS (SELECT f.doc_id, f.y, sum(w.w * f.x) AS z
         | FROM fb f JOIN w${t - 1} w USING (b) GROUP BY 1, 2),
         |e$t AS (SELECT doc_id,
         |  least(1000000, greatest(0, 500000 + z // 4))
         |   - CASE WHEN y THEN 1000000 ELSE 0 END AS e FROM z$t),
         |g$t AS (SELECT f.b, sum(e.e * f.x) AS g
         | FROM fb f JOIN e$t e USING (doc_id) GROUP BY 1),
         |w$t AS MATERIALIZED (
         | SELECT w.b, cast(w.w - coalesce(g.g, 0) // (n.n * $lrDiv) as bigint) AS w
         | FROM w${t - 1} w LEFT JOIN g$t g USING (b), n)""".stripMargin
    }.mkString(",\n")
    s"""toks AS (
       | SELECT doc_id, lang, unnest(string_split($normSql, ' ')) AS tok
       | FROM documents WHERE $docFilter),
       |f0 AS (
       | SELECT doc_id, (lang = 'en') AS y,
       |  cast((${hex3Sql(1)} * 256 + ${hex3Sql(2)} * 16 + ${hex3Sql(3)}) % 64 as int) AS b,
       |  count(*) AS x
       | FROM toks WHERE length(tok) > 0 GROUP BY 1, 2, 3),
       |spine AS (SELECT DISTINCT doc_id, y FROM f0),
       |fb AS MATERIALIZED (
       | SELECT doc_id, y, b, x FROM f0
       | UNION ALL SELECT doc_id, y, cast(-1 as int), cast(1 as bigint) FROM spine),
       |n AS (SELECT count(*) AS n FROM spine),
       |w0 AS (SELECT cast(unnest(range(-1, 64)) as int) AS b, cast(0 as bigint) AS w),
       |$steps""".stripMargin
  }

  /** CTE chain replaying [[graft.operators.Infer.trainOvr]] over
    * documents rows matching `docFilter` — the binary chain with a cls
    * dimension on the weight table (per-step weight CTEs MATERIALIZED
    * for the same anti-exponential-inlining reason). Yields w{iters}
    * keyed by (cls, b). Shared by the q_train_langid and q_langid_eval
    * oracles. */
  /** DuckDB mirror of [[graft.operators.Infer.featTokens]]: the
    * word-unigram list optionally augmented with '#'-prefixed char
    * n-grams, over a subquery exposing `tl` (the token list). */
  private def featListSql(n: Int): String =
    if (n <= 0) "tl"
    else s"""list_concat(tl, flatten(list_transform(tl, t ->
            | CASE WHEN length(t) >= $n
            |  THEN list_transform(range(length(t) - ${n - 1}), i -> '#' || substr(t, i + 1, $n))
            |  ELSE cast([] as varchar[]) END)))""".stripMargin

  private def trainOvrCtes(iters: Int, docFilter: String,
                           lrDiv: Long = 8L, src: String = "documents",
                           charNgram: Int = 0): String = {
    val steps = (1 to iters).map { t =>
      s"""z$t AS (SELECT f.doc_id, w.cls, sum(w.w * f.x) AS z
         | FROM fb f JOIN w${t - 1} w USING (b) GROUP BY 1, 2),
         |e$t AS (SELECT z.doc_id, z.cls,
         |  least(1000000, greatest(0, 500000 + z.z // 4))
         |   - CASE WHEN s.lang = z.cls THEN 1000000 ELSE 0 END AS e
         | FROM z$t z JOIN spine s USING (doc_id)),
         |g$t AS (SELECT e.cls, f.b, sum(e.e * f.x) AS g
         | FROM fb f JOIN e$t e USING (doc_id) GROUP BY 1, 2),
         |w$t AS MATERIALIZED (
         | SELECT w.cls, w.b,
         |  cast(w.w - coalesce(g.g, 0) // (n.n * $lrDiv) as bigint) AS w
         | FROM w${t - 1} w LEFT JOIN g$t g ON g.cls = w.cls AND g.b = w.b, n)""".stripMargin
    }.mkString(",\n")
    s"""toks AS (
       | SELECT doc_id, lang, unnest(${featListSql(charNgram)}) AS tok FROM (
       |  SELECT doc_id, lang, string_split($normSql, ' ') AS tl
       |  FROM $src WHERE $docFilter)),
       |f0 AS (
       | SELECT doc_id, lang,
       |  cast((${hex3Sql(1)} * 256 + ${hex3Sql(2)} * 16 + ${hex3Sql(3)}) % 64 as int) AS b,
       |  count(*) AS x
       | FROM toks WHERE length(tok) > 0 GROUP BY 1, 2, 3),
       |spine AS (SELECT DISTINCT doc_id, lang FROM f0),
       |fb AS MATERIALIZED (
       | SELECT doc_id, b, x FROM f0
       | UNION ALL SELECT doc_id, cast(-1 as int), cast(1 as bigint) FROM spine),
       |n AS (SELECT count(*) AS n FROM spine),
       |cls AS (SELECT DISTINCT lang AS cls FROM spine),
       |w0 AS (SELECT cls, cast(unnest(range(-1, 64)) as int) AS b,
       |  cast(0 as bigint) AS w FROM cls),
       |$steps""".stripMargin
  }

  /** Held-out-split scoring CTEs over the w10 weight table (the
    * linearScore replay: per-doc bucket sums + bias, token-less docs
    * at bias) — shared by the q_classifier_eval and q_calibration
    * oracles. Yields esc(doc_id, y, score). */
  private def evalScoreCtes: String =
    s"""ev AS (SELECT doc_id, (lang = 'en') AS y,
       |  unnest(string_split($normSql, ' ')) AS tok
       | FROM documents WHERE doc_id % 5 = 0),
       |ef AS (SELECT doc_id,
       |  cast((${hex3Sql(1)} * 256 + ${hex3Sql(2)} * 16 + ${hex3Sql(3)}) % 64 as int) AS b,
       |  count(*) AS x
       | FROM ev WHERE length(tok) > 0 GROUP BY 1, 2),
       |espine AS (SELECT doc_id, (lang = 'en') AS y FROM documents WHERE doc_id % 5 = 0),
       |esum AS (SELECT f.doc_id, sum(w.w * f.x) AS sw
       | FROM ef f JOIN w10 w USING (b) GROUP BY 1),
       |esc AS (SELECT s.doc_id, s.y,
       |  coalesce(e.sw, 0) + (SELECT w FROM w10 WHERE b = -1) AS score
       | FROM espine s LEFT JOIN esum e USING (doc_id))""".stripMargin

  val oracles: Map[String, String] = Map(

    // the same trained scores cut into ntile(10) deciles under the
    // (score, doc_id) total order — both engines implement standard
    // SQL ntile (earlier buckets one larger on non-divisible counts)
    "q_calibration" ->
      s"""WITH ${trainLogisticCtes(10, "doc_id % 5 <> 0", lrDiv = 1L)},
         |$evalScoreCtes,
         |binned AS (SELECT y, score,
         |  cast(ntile(10) OVER (ORDER BY score, doc_id) as bigint) AS bin
         | FROM esc)
         |SELECT bin, count(*) AS n,
         | cast(min(score) as bigint) AS lo_score,
         | cast(max(score) as bigint) AS hi_score,
         | cast(sum(score) as bigint) AS sum_score,
         | count(CASE WHEN y THEN 1 END) AS n_pos,
         | count(CASE WHEN y THEN 1 END) * 1000000 // count(*) AS pos_ppm
         |FROM binned GROUP BY 1 ORDER BY 1""".stripMargin,

    // weights land bit-identical or the trainer drifted — see
    // trainLogisticCtes for the replayed arithmetic
    "q_train_classifier" ->
      s"""WITH ${trainLogisticCtes(3, "TRUE")}
         |SELECT b AS bucket, w AS weight_ppm FROM w3 ORDER BY bucket""".stripMargin,

    // re-trains on the held-in split via the same unrolled CTEs, then
    // replays linearScore on the held-out fifth (bias for token-less
    // docs), the >0 keep rule, and the integer-midrank AUC (2·rank +
    // ties − 1, the q_mannwhitney trick) — one exact metrics row
    "q_classifier_eval" ->
      s"""WITH ${trainLogisticCtes(10, "doc_id % 5 <> 0", lrDiv = 1L)},
         |$evalScoreCtes,
         |ps AS (SELECT score, count(*) AS n, count(CASE WHEN y THEN 1 END) AS np
         | FROM esc GROUP BY 1),
         |pc AS (SELECT np, n, coalesce(sum(n) OVER (ORDER BY score
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         | FROM ps),
         |r2 AS (SELECT sum(np * (2 * cum + n + 1)) AS r2pos FROM pc),
         |conf AS (SELECT count(*) AS n_eval,
         |  count(CASE WHEN y THEN 1 END) AS n_pos,
         |  count(CASE WHEN NOT y THEN 1 END) AS n_neg,
         |  count(CASE WHEN y AND score > 0 THEN 1 END) AS tp,
         |  count(CASE WHEN NOT y AND score > 0 THEN 1 END) AS fp,
         |  count(CASE WHEN NOT y AND score <= 0 THEN 1 END) AS tn,
         |  count(CASE WHEN y AND score <= 0 THEN 1 END) AS fn
         | FROM esc)
         |SELECT n_eval, n_pos, n_neg, tp, fp, tn, fn,
         | (tp + tn) * 1000000 // n_eval AS accuracy_ppm,
         | CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp) END AS precision_ppm,
         | CASE WHEN n_pos > 0 THEN tp * 1000000 // n_pos END AS recall_ppm,
         | CASE WHEN n_pos * n_neg > 0 THEN cast((r2pos - n_pos * (n_pos + 1)) * 1000000
         |  // (2 * n_pos * n_neg) as bigint) END AS auc_ppm
         |FROM conf, r2""".stripMargin,

    // replays Infer.trainOvr's K-class trajectory: the binary chain
    // with a cls dimension on the weight table — per step all K
    // scores, per-class one-hot errors, (cls, b)-summed gradients,
    // and the same truncating-division update
    "q_train_langid" ->
      s"""WITH ${trainOvrCtes(3, "TRUE")}
         |SELECT cls AS lang, b AS bucket, w AS weight_ppm FROM w3
         |ORDER BY lang, bucket""".stripMargin,

    // re-trains the K heads on the held-in split via the shared
    // generator, replays predictOvr's argmax (score desc, cls asc —
    // the K−i rank key's tie rule) on the held-out fifth, and
    // emits the confusion matrix. The synthetic corpus carries weak
    // language signal (word salad from one vocabulary), so the
    // matrix is honest about a near-majority classifier — the
    // capability under test is the exact replayable loop, and
    // InferSpec proves accuracy 1.0 where classes are separable.
    "q_langid_eval" ->
      s"""WITH ${trainOvrCtes(10, "doc_id % 5 <> 0", lrDiv = 1L)},
         |ev AS (SELECT doc_id, lang,
         |  unnest(string_split($normSql, ' ')) AS tok
         | FROM documents WHERE doc_id % 5 = 0),
         |ef AS (SELECT doc_id,
         |  cast((${hex3Sql(1)} * 256 + ${hex3Sql(2)} * 16 + ${hex3Sql(3)}) % 64 as int) AS b,
         |  count(*) AS x
         | FROM ev WHERE length(tok) > 0 GROUP BY 1, 2),
         |espine AS (SELECT doc_id, lang AS true_lang FROM documents WHERE doc_id % 5 = 0),
         |esum AS (SELECT f.doc_id, w.cls, sum(w.w * f.x) AS sw
         | FROM ef f JOIN w10 w ON w.b = f.b GROUP BY 1, 2),
         |esc AS (SELECT s.doc_id, s.true_lang, c.cls,
         |  coalesce(e.sw, 0) + bias.w AS score
         | FROM espine s
         |  CROSS JOIN (SELECT DISTINCT cls FROM w10) c
         |  LEFT JOIN esum e ON e.doc_id = s.doc_id AND e.cls = c.cls
         |  JOIN (SELECT cls, w FROM w10 WHERE b = -1) bias ON bias.cls = c.cls),
         |win AS (SELECT doc_id, true_lang, cls AS pred_lang,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rk
         | FROM esc)
         |SELECT true_lang, pred_lang, count(*) AS n_docs
         |FROM win WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the same replayed loop over the IN-PLAN multilingual synth and
    // the unigram+char-trigram feature stream (featListSql mirrors
    // Infer.featTokens); train on 4/5, argmax the held-out fifth
    "q_langid_chargram" ->
      s"""WITH synth AS (
         | SELECT doc_id, lang,
         |  repeat(CASE lang WHEN 'en' THEN 'the and of to with'
         |   WHEN 'de' THEN 'der die und von mit'
         |   WHEN 'es' THEN 'el la de los con'
         |   WHEN 'fr' THEN 'le la les des avec'
         |   WHEN 'zh' THEN 'zhong wen pin yin hua'
         |   ELSE lang END || ' ', cast(3 + doc_id % 3 as int))
         |   || substr(text, 1, 80) AS text
         | FROM documents),
         |${trainOvrCtes(10, "doc_id % 5 <> 0", lrDiv = 1L, src = "synth", charNgram = 3)},
         |ev AS (SELECT doc_id, lang, unnest(${featListSql(3)}) AS tok FROM (
         |  SELECT doc_id, lang, string_split($normSql, ' ') AS tl
         |  FROM synth WHERE doc_id % 5 = 0)),
         |ef AS (SELECT doc_id,
         |  cast((${hex3Sql(1)} * 256 + ${hex3Sql(2)} * 16 + ${hex3Sql(3)}) % 64 as int) AS b,
         |  count(*) AS x
         | FROM ev WHERE length(tok) > 0 GROUP BY 1, 2),
         |espine AS (SELECT doc_id, lang AS true_lang FROM synth WHERE doc_id % 5 = 0),
         |esum AS (SELECT f.doc_id, w.cls, sum(w.w * f.x) AS sw
         | FROM ef f JOIN w10 w ON w.b = f.b GROUP BY 1, 2),
         |esc AS (SELECT s.doc_id, s.true_lang, c.cls,
         |  coalesce(e.sw, 0) + bias.w AS score
         | FROM espine s
         |  CROSS JOIN (SELECT DISTINCT cls FROM w10) c
         |  LEFT JOIN esum e ON e.doc_id = s.doc_id AND e.cls = c.cls
         |  JOIN (SELECT cls, w FROM w10 WHERE b = -1) bias ON bias.cls = c.cls),
         |win AS (SELECT doc_id, true_lang, cls AS pred_lang,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rk
         | FROM esc)
         |SELECT true_lang, pred_lang, count(*) AS n_docs
         |FROM win WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // per-type exacts + the true global distinct for the union row;
    // within_bounds is literal TRUE — the hash match certifies both
    // the per-sketch and the sketch-UNION error bounds
    "q_hll_union" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        | TRUE AS within_bounds
        |FROM events GROUP BY 1
        |UNION ALL
        |SELECT '__total__', count(DISTINCT user_id), TRUE FROM events
        |ORDER BY event_type""".stripMargin,

    "q_ttest_welch" ->
      """WITH m AS (
        | SELECT event_type,
        |  count(CASE WHEN user_id % 2 = 0 THEN value END) AS n_a,
        |  count(CASE WHEN user_id % 2 = 1 THEN value END) AS n_b,
        |  cast(sum(CASE WHEN user_id % 2 = 0 THEN cast(value as decimal(28,2)) END) as double) AS sa,
        |  cast(sum(CASE WHEN user_id % 2 = 1 THEN cast(value as decimal(28,2)) END) as double) AS sb,
        |  cast(sum(CASE WHEN user_id % 2 = 0 THEN cast(value as decimal(18,2)) * cast(value as decimal(18,2)) END) as double) AS qa,
        |  cast(sum(CASE WHEN user_id % 2 = 1 THEN cast(value as decimal(18,2)) * cast(value as decimal(18,2)) END) as double) AS qb
        | FROM events GROUP BY 1),
        |v AS (
        | SELECT event_type, n_a, n_b, sa / n_a AS mean_a, sb / n_b AS mean_b,
        |  CASE WHEN n_a >= 2 THEN (qa - sa * sa / n_a) / (n_a - 1) END AS var_a,
        |  CASE WHEN n_b >= 2 THEN (qb - sb * sb / n_b) / (n_b - 1) END AS var_b
        | FROM m)
        |SELECT event_type, n_a, n_b,
        | round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
        | round(var_a, 6) AS var_a, round(var_b, 6) AS var_b,
        | round(CASE WHEN var_a / n_a + var_b / n_b > 0
        |  THEN (mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b) END, 6) AS t_stat,
        | round(CASE WHEN var_a / n_a + var_b / n_b > 0
        |  THEN (var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b) /
        |   ((var_a / n_a) * (var_a / n_a) / (n_a - 1) +
        |    (var_b / n_b) * (var_b / n_b) / (n_b - 1)) END, 6) AS df_welch
        |FROM v ORDER BY event_type""".stripMargin,

    "q_chi_square" ->
      """WITH cells AS (
        | SELECT event_type,
        |  CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS cohort,
        |  CASE WHEN value >= 35.0 THEN 'high' ELSE 'low' END AS bucket,
        |  count(*) AS o
        | FROM events GROUP BY 1, 2, 3),
        |rt AS (SELECT event_type, cohort, sum(o) AS ra FROM cells GROUP BY 1, 2),
        |ct AS (SELECT event_type, bucket, sum(o) AS cb FROM cells GROUP BY 1, 2),
        |tt AS (SELECT event_type, sum(o) AS n FROM cells GROUP BY 1),
        |terms AS (
        | SELECT c.event_type, c.o, ra * cb / n AS e, n
        | FROM cells c JOIN rt USING (event_type, cohort)
        |  JOIN ct USING (event_type, bucket) JOIN tt USING (event_type)),
        |d AS (
        | SELECT event_type,
        |  (count(DISTINCT cohort) - 1) * (count(DISTINCT bucket) - 1) AS dof
        | FROM cells GROUP BY 1),
        |x AS (
        | SELECT event_type, cast(max(n) as bigint) AS n,
        |  round(sum((o - e) * (o - e) / e), 6) AS chi2
        | FROM terms GROUP BY 1)
        |SELECT x.event_type, x.n, cast(d.dof as bigint) AS dof, x.chi2
        |FROM x JOIN d USING (event_type) ORDER BY 1""".stripMargin,

    "q_outliers" ->
      """WITH m AS (
        | SELECT event_type, count(value) AS n,
        |  cast(sum(cast(value as decimal(28,2))) as double) AS s,
        |  cast(sum(cast(value as decimal(18,2)) * cast(value as decimal(18,2))) as double) AS q
        | FROM events GROUP BY 1),
        |st AS (
        | SELECT event_type, s / n AS mean_v,
        |  sqrt((q - s * s / n) / (n - 1)) AS sd
        | FROM m WHERE n >= 2),
        |z AS (
        | SELECT e.event_id, e.event_type, e.value,
        |  (e.value - st.mean_v) / st.sd AS z
        | FROM events e JOIN st USING (event_type) WHERE st.sd > 0)
        |SELECT event_id, event_type, value, round(z, 6) AS z
        |FROM z WHERE abs(z) > 2.0 ORDER BY event_id""".stripMargin,

    "q_impute_group" ->
      """WITH ev AS (
        | SELECT event_id, event_type,
        |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
        | FROM events),
        |g AS (
        | SELECT event_type,
        |  cast(sum(cast(value as decimal(28,2))) as double) / count(value) AS gmean
        | FROM ev GROUP BY 1),
        |gl AS (
        | SELECT cast(sum(cast(value as decimal(28,2))) as double) / count(value) AS globalmean
        | FROM ev)
        |SELECT ev.event_id, ev.event_type,
        | ev.value IS NULL AS was_imputed,
        | round(coalesce(ev.value, g.gmean, gl.globalmean), 6) AS value_filled
        |FROM ev LEFT JOIN g USING (event_type), gl
        |ORDER BY ev.event_id""".stripMargin,

    "q_time_weighted" ->
      """WITH o AS (
        | SELECT user_id, event_id, value,
        |  epoch_us(cast(ts as timestamp)) AS tus,
        |  lead(epoch_us(cast(ts as timestamp))) OVER (
        |   PARTITION BY user_id ORDER BY cast(ts as timestamp), event_id) AS next_us
        | FROM events),
        |i AS (
        | SELECT user_id, value, next_us - tus AS dt
        | FROM o WHERE next_us IS NOT NULL)
        |SELECT user_id, count(*) AS n_intervals,
        | cast(sum(dt) as bigint) AS total_us,
        | round(cast(sum(cast(value as decimal(18,2)) * dt) as double)
        |   / cast(sum(dt) as double), 6) AS twap
        |FROM i GROUP BY 1 HAVING sum(dt) > 0 ORDER BY 1""".stripMargin,

    "q_quantile_bins" ->
      """WITH b AS (
        | SELECT event_type, value,
        |  cast(ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) as bigint) AS bin
        | FROM events)
        |SELECT event_type, bin, count(*) AS n, min(value) AS lo, max(value) AS hi
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_linreg" ->
      """WITH p AS (
        | SELECT l_returnflag, l_linestatus,
        |  CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |   THEN cast(l_quantity as decimal(18,2)) END AS x,
        |  CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |   THEN cast(l_extendedprice as decimal(18,2)) END AS y
        | FROM lineitem),
        |m AS (
        | SELECT l_returnflag, l_linestatus, count(x) AS n,
        |  cast(sum(cast(x as decimal(28,2))) as double) AS sx,
        |  cast(sum(cast(y as decimal(28,2))) as double) AS sy,
        |  cast(sum(x * x) as double) AS sxx,
        |  cast(sum(y * y) as double) AS syy,
        |  cast(sum(x * y) as double) AS sxy
        | FROM p GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, n,
        | round(CASE WHEN n * sxx - sx * sx > 0
        |  THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS slope,
        | round(CASE WHEN n * sxx - sx * sx > 0
        |  THEN (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n END, 6) AS intercept,
        | round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |  THEN (n * sxy - sx * sy) * (n * sxy - sx * sy) /
        |   ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS r2
        |FROM m ORDER BY 1, 2""".stripMargin,

    "q_mannwhitney" ->
      """WITH r AS (
        | SELECT event_type,
        |  CASE WHEN user_id % 2 = 0 THEN 'ctl' ELSE 'mut' END AS cohort,
        |  2 * rank() OVER (PARTITION BY event_type ORDER BY value)
        |   + count(*) OVER (PARTITION BY event_type, value) - 1 AS r2,
        |  count(*) OVER (PARTITION BY event_type, value) AS t
        | FROM events WHERE value IS NOT NULL),
        |m AS (
        | SELECT event_type,
        |  count(CASE WHEN cohort = 'ctl' THEN 1 END) AS n_a,
        |  count(CASE WHEN cohort = 'mut' THEN 1 END) AS n_b,
        |  sum(CASE WHEN cohort = 'ctl' THEN r2 END) AS r2a,
        |  sum(t * t - 1) AS tie3
        | FROM r GROUP BY 1),
        |u AS (
        | SELECT event_type, n_a, n_b,
        |  (r2a - n_a * (n_a + 1)) / 2.0 AS u_a, tie3,
        |  n_a * n_b / 12.0 * ((n_a + n_b + 1.0)
        |   - tie3 / ((n_a + n_b) * (n_a + n_b - 1.0))) AS var_u
        | FROM m)
        |SELECT event_type, n_a, n_b, u_a, n_a * n_b - u_a AS u_b,
        | round(CASE WHEN var_u > 0
        |  THEN (u_a - n_a * n_b / 2.0) / sqrt(var_u) END, 6) AS z
        |FROM u ORDER BY event_type""".stripMargin,

    "q_fisher_exact" ->
      """WITH c AS (
        | SELECT event_type,
        |  count(CASE WHEN user_id % 2 = 0 AND value >= 35.0 THEN 1 END) AS n11,
        |  count(CASE WHEN user_id % 2 = 0 AND NOT value >= 35.0 THEN 1 END) AS n10,
        |  count(CASE WHEN user_id % 2 <> 0 AND value >= 35.0 THEN 1 END) AS n01,
        |  count(CASE WHEN user_id % 2 <> 0 AND NOT value >= 35.0 THEN 1 END) AS n00
        | FROM events WHERE value IS NOT NULL GROUP BY 1)
        |SELECT event_type, n11, n10, n01, n00,
        | round(CASE WHEN n10 * n01 > 0
        |  THEN cast(n11 * n00 as double) / (n10 * n01) END, 6) AS odds_ratio
        |FROM c ORDER BY event_type""".stripMargin,

    "q_fdr_bh" ->
      """WITH r AS (
        | SELECT event_type, cast(month(cast(ts as timestamp)) as bigint) AS month,
        |  CASE WHEN user_id % 2 = 0 THEN 'ctl' ELSE 'mut' END AS cohort,
        |  2 * rank() OVER (PARTITION BY event_type, month(cast(ts as timestamp)) ORDER BY value)
        |   + count(*) OVER (PARTITION BY event_type, month(cast(ts as timestamp)), value) - 1 AS r2,
        |  count(*) OVER (PARTITION BY event_type, month(cast(ts as timestamp)), value) AS t
        | FROM events WHERE value IS NOT NULL),
        |m AS (
        | SELECT event_type, month,
        |  count(CASE WHEN cohort = 'ctl' THEN 1 END) AS n_a,
        |  count(CASE WHEN cohort = 'mut' THEN 1 END) AS n_b,
        |  sum(CASE WHEN cohort = 'ctl' THEN r2 END) AS r2a,
        |  sum(t * t - 1) AS tie3
        | FROM r GROUP BY 1, 2),
        |u AS (
        | SELECT event_type, month,
        |  (r2a - n_a * (n_a + 1)) / 2.0 AS u_a,
        |  n_a * n_b / 12.0 * ((n_a + n_b + 1.0)
        |   - tie3 / ((n_a + n_b) * (n_a + n_b - 1.0))) AS var_u,
        |  n_a, n_b
        | FROM m),
        |zed AS (
        | SELECT event_type, month,
        |  CASE WHEN var_u > 0
        |   THEN (u_a - n_a * n_b / 2.0) / sqrt(var_u) END AS z
        | FROM u),
        |p AS (
        | SELECT event_type, month,
        |  round(1.0 / (1.0 + z * z), 9) AS p_score
        | FROM zed),
        |ranked AS (
        | SELECT event_type, month, p_score,
        |  count(*) OVER () AS m_tests,
        |  row_number() OVER (ORDER BY p_score) AS rk
        | FROM p WHERE p_score IS NOT NULL),
        |adj AS (
        | SELECT event_type, month, p_score,
        |  least(1.0, min(p_score * m_tests / rk)
        |   OVER (ORDER BY p_score ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS p_adjusted
        | FROM ranked)
        |SELECT event_type, month, p_score, round(p_adjusted, 9) AS p_adjusted
        |FROM adj ORDER BY event_type, month""".stripMargin,

    "q_corr_matrix" -> corrOracleSql(6))
}

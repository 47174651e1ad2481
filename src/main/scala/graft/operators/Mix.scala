package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted SOURCE MIXING — the training-data op that
  * turns N heterogeneous corpora into one corpus with a target
  * mixture (oversample high-quality sources, downsample or drop noisy
  * ones). The reference's analog is vocabulary/skip-list-driven
  * inclusion (experiment_cleaner.py:234 drops by spec table); the LLM
  * pipeline generalizes it to fractional and >1 ("epoch") weights.
  *
  * Sampling is HASH-DETERMINISTIC, not random: a row's copy count is a
  * pure function of (source, key), so the mixed corpus is identical
  * across cluster sizes, retries, and engines — the same property the
  * exact-N sampler and shard assigner guarantee. Weight w yields
  * floor(w) copies of every row plus one extra iff
  * substr(md5(source|key), 1, 8) < the 8-hex-digit literal threshold
  * floor(frac(w)·2^32). md5 hex is lowercase in Spark and DuckDB, so
  * the string compare is engine-portable; thresholds are compiled to
  * literals at plan time (no join, no shuffle — a pure projection the
  * scan absorbs).
  *
  * Scale: narrow map + explode; output size is exactly
  * Σ_source w_s·|source| with no shuffle introduced. Unlisted sources
  * get weight 0 (dropped) — list a source explicitly to keep it.
  */
object Mix {

  /** 8-hex-digit threshold for the fractional part of `w`. */
  private[graft] def fracThresholdHex(w: Double): String = {
    val frac = w - math.floor(w)
    f"${math.floor(frac * 4294967296.0).toLong}%08x"
  }

  /** Mix `df` to the target per-source `weights`. Output carries the
    * input columns plus `copy_idx` (0-based replica ordinal — replica
    * awareness matters downstream: dedup must treat copies of one doc
    * as intentional, and packing should spread them across bins).
    */
  def weightedSources(df: DataFrame, keyCol: String, sourceCol: String,
                      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "weights must list at least one source")
    require(weights.values.forall(_ >= 0.0), "weights must be >= 0")
    val src = col(sourceCol)
    val u = substring(md5(concat_ws("|", src, col(keyCol).cast("string"))), 1, 8)
    // CASE-cascade compiled from the weight spec: base copy count and
    // the fractional-part threshold, both literals
    val base = weights.foldLeft(lit(0L)) { case (acc, (s, w)) =>
      when(src === s, lit(math.floor(w).toLong)).otherwise(acc)
    }
    val thr = weights.foldLeft(lit("00000000")) { case (acc, (s, w)) =>
      when(src === s, lit(fracThresholdHex(w))).otherwise(acc)
    }
    df.withColumn("__n_copies", base + when(u < thr, 1L).otherwise(0L))
      .filter(col("__n_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("__n_copies") - 1)))
      .drop("__n_copies")
  }

  /** TEMPERATURE-scaled source mixing (the standard multinomial
    * temperature trick for multilingual / multi-source training sets,
    * e.g. mBERT/XLM-R exponent sampling): target share of source s is
    * n_s^alpha / Σ n_t^alpha, so alpha<1 upsamples small sources and
    * downsamples dominant ones; alpha=1 is natural proportions. The
    * per-row copy weight w_s = share_s · N / n_s feeds the same
    * hash-deterministic replication as [[weightedSources]], but with
    * thresholds computed IN-PLAN from a tiny per-source count
    * aggregate (broadcast back onto the corpus) — no driver collect,
    * so the op composes inside a bigger dataflow and scales with
    * #sources, not #rows. Weights are rounded to 1e-6 before
    * thresholding so the kept set is reproducible across engines
    * (double `pow` is the one non-portable step; at alpha=0.5 we use
    * the correctly-rounded `sqrt` instead).
    *
    * Scale: one count shuffle over sources + two broadcast joins of a
    * #sources-row table; the replication itself stays a narrow
    * map+explode exactly as in weightedSources.
    */
  def temperature(df: DataFrame, keyCol: String, sourceCol: String,
                  alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val powN: Column => Column =
      if (alpha == 0.5) sqrt else c => pow(c, alpha)
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
    val tot = counts.agg(sum("__n").as("__total"), sum(powN(col("__n"))).as("__sp"))
    val weights = counts.crossJoin(broadcast(tot))
      .select(col(sourceCol),
        round(powN(col("__n")) * col("__total") / (col("__n") * col("__sp")), 6).as("__w"))
    val u = substring(md5(concat_ws("|", col(sourceCol), col(keyCol).cast("string"))), 1, 8)
    df.join(broadcast(weights), Seq(sourceCol))
      .withColumn("__thr",
        lpad(lower(hex(floor((col("__w") - floor(col("__w"))) * 4294967296.0).cast("long"))),
          8, "0"))
      .withColumn("__n_copies",
        floor(col("__w")).cast("long") + when(u < col("__thr"), 1L).otherwise(0L))
      .filter(col("__n_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("__n_copies") - 1)))
      .withColumn("weight_ppm", round(col("__w") * 1e6, 0).cast("long"))
      .drop("__w", "__thr", "__n_copies")
  }

  /** Per-source mixing report: rows in, rows out, exact achieved
    * rate in parts-per-million (integer division — engine-stable).
    */
  def mixReport(in: DataFrame, mixed: DataFrame, sourceCol: String): DataFrame = {
    val nIn = in.groupBy(sourceCol).agg(count(lit(1)).as("n_in"))
    val nOut = mixed.groupBy(sourceCol).agg(count(lit(1)).as("n_out"))
    nIn.join(nOut, Seq(sourceCol), "left")
      .na.fill(0L, Seq("n_out"))
      .withColumn("achieved_ppm", expr("n_out * 1000000 div n_in"))
  }
}

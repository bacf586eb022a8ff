package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift and evaluation statistics as reusable operators —
  * the DSL-facing twins of the q191/q198/q201/q202/q203 oracle queries
  * (each module keeps the exact same fixed-order integer/decimal
  * arithmetic, so results replay engine-exact).
  *
  * Scale discipline shared by the family (SCALE.md "drift family"):
  * every statistic reduces the data to a per-(group, cell) integer
  * tally in ONE hash-agg with map-side partials, then finishes on the
  * metadata-sized cell relation. Windows only ever run over cells
  * (bounded by the value domain), never over data rows. Big sums ride
  * decimal(38,0), and factors that can individually exceed 2^63 (the
  * Mann-Whitney per-score product, the Gini rank product) are cast to
  * decimal BEFORE multiplying, so products overflow to a loud NULL at
  * 38 digits instead of silently wrapping a BIGINT; Welch's variance
  * finishes in doubles over the exact sums because its n·q and s·s
  * terms can themselves exceed 38 digits.
  *
  * The reference has no drift surface at all (dbitool.pl's analytics
  * stop at count/sum stats) — north-star extension work.
  */
object Drift {

  /** Population Stability Index per group between two periods
    * (`period` must evaluate to 0 = before, 1 = after), with +1
    * Laplace smoothing per bin so empty cells never divide by zero.
    * Bins come from `bucket` (any discretization expression). The
    * per-bin terms sum as decimal(30,12) (order-free); output
    * `shifted` flags psi > threshold (0.10 = the industry "moderate
    * shift" line). Mirrors q201's arithmetic exactly.
    */
  def psi(df: DataFrame, group: String, bucket: Column, period: Column,
          threshold: Double = 0.10): DataFrame =
    psiFromCells(psiCells(df, group, bucket, period), group, threshold)

  /** The one data-sized hash-agg of [[psi]]: per-(group, bin) counts
    * for period 0 and 1. Exposed so a streaming twin can maintain the
    * cell relation incrementally (the counts are exact sums — merging
    * per-batch cells is bit-equal to a batch recount).
    */
  def psiCells(df: DataFrame, group: String, bucket: Column,
               period: Column): DataFrame =
    df.select(col(group), bucket.cast("int").as("__b"),
        period.cast("int").as("__per"))
      .groupBy(col(group), col("__b")).agg(
        sum(when(col("__per") === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col("__per") === 1, 1L).otherwise(0L)).as("c2"))

  /** The metadata-sized finishing stage of [[psi]] over a
    * (group, __b, c1, c2) cell relation. */
  def psiFromCells(cells: DataFrame, group: String,
                   threshold: Double = 0.10): DataFrame = {
    val tot = cells.groupBy(col(group)).agg(
      sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
      count(lit(1)).as("nb"))
    val p1 = (col("c1") + 1L).cast("double") /
      (col("n1") + col("nb")).cast("double")
    val p2 = (col("c2") + 1L).cast("double") /
      (col("n2") + col("nb")).cast("double")
    val term = ((p1 - p2) * log(p1 / p2)).cast("decimal(30,12)")
    val psiCol = sum(term).cast("double")
    cells.join(tot, group)
      .groupBy(col(group))
      .agg(max(col("n1")).as("n_before"), max(col("n2")).as("n_after"),
        max(col("nb")).as("n_bins"), round(psiCol, 6).as("psi"),
        (psiCol > lit(threshold)).as("shifted"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic per group between two
    * periods over a DISCRETE value (`value` should already be
    * quantized — e.g. floor(x*100)). The CDF grid is the distinct
    * value domain per group (a window over cells, never data rows);
    * cross products ride decimal(38,0) so n1·n2 can't wrap a long.
    * Output ks = max |F1 - F2| plus its exact integer numerator and
    * denominator. Mirrors q202's arithmetic exactly.
    */
  def ks(df: DataFrame, group: String, value: Column,
         period: Column): DataFrame =
    ksFromCells(ksCells(df, group, value, period), group)

  /** The one data-sized hash-agg of [[ks]]: per-(group, value) counts
    * for period 0 and 1 — exact sums, so a streaming twin can merge
    * per-batch cells bit-equal to a batch recount. */
  def ksCells(df: DataFrame, group: String, value: Column,
              period: Column): DataFrame =
    df.select(col(group), value.cast("long").as("__c"),
        period.cast("int").as("__per"))
      .groupBy(col(group), col("__c")).agg(
        sum(when(col("__per") === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col("__per") === 1, 1L).otherwise(0L)).as("c2"))

  /** The finishing stage of [[ks]] over a (group, __c, c1, c2) cell
    * relation — the CDF window runs over the value domain, never data
    * rows. */
  def ksFromCells(cells: DataFrame, group: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group)).orderBy(col("__c"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = cells
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("cum2", sum(col("c2")).over(w))
    val tot = cells.groupBy(col(group))
      .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    cum.join(tot, group)
      .withColumn("num", abs(col("cum1").cast("decimal(38,0)") * col("n2") -
        col("cum2").cast("decimal(38,0)") * col("n1")).cast("decimal(38,0)"))
      .groupBy(col(group))
      .agg(max(col("n1")).as("n_before"), max(col("n2")).as("n_after"),
        max(col("num")).as("ks_num"))
      .join(tot, group)
      .select(col(group), col("n_before"), col("n_after"), col("ks_num"),
        (col("n1").cast("decimal(38,0)") * col("n2"))
          .cast("decimal(38,0)").as("ks_den"),
        round(col("ks_num").cast("double") /
          (col("n1").cast("decimal(38,0)") * col("n2")).cast("double"), 6)
          .as("ks"))
  }

  /** Welch two-sample t-test of each group vs the REST of the corpus
    * over an integer-valued column: sufficient statistics (n, Σx, Σx²)
    * in decimal(38,0) from ONE scan; the complement's stats are
    * global-minus-group via a broadcast 1-row global — no second scan,
    * no pair join. Output t_stat plus shifted = |t| > 2. Mirrors
    * q191's arithmetic exactly.
    */
  def welch(df: DataFrame, group: String, value: Column): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val v = df.select(col(group), value.cast("long").as("__x"))
    val per = v.groupBy(col(group)).agg(
      count(lit(1)).as("n1"),
      sum(dec(col("__x"))).as("s1"),
      sum(dec(col("__x")) * dec(col("__x"))).as("q1"))
    val glob = v.agg(
      count(lit(1)).as("ng"),
      sum(dec(col("__x"))).as("sg"),
      sum(dec(col("__x")) * dec(col("__x"))).as("qg"))
    val j = per.crossJoin(broadcast(glob))
      .withColumn("n2", col("ng") - col("n1"))
      .withColumn("s2", (col("sg") - col("s1")).cast("decimal(38,0)"))
      .withColumn("q2", (col("qg") - col("q1")).cast("decimal(38,0)"))
    def meanv(n: String, sx: String) =
      col(sx).cast("double") / col(n).cast("double")
    // Variance via DOUBLES over the exact decimal sums: n·q and s·s
    // individually approach 38 digits (sum of squares alone), so a
    // decimal(38,0) product would overflow → NULL in non-ANSI Spark.
    // Doubles make overflow impossible; both engines evaluate the
    // identical fixed-order IEEE expression, so the oracle still
    // matches bit-for-bit. Cancellation error is ~ulp(s²)/((n²-n)·var)
    // — negligible unless var/mean² < ~1e-14·n. The numerator is
    // clamped at 0 (greatest — identical fn on both engines): the
    // exact decimal form guarantees n·q − s² >= 0, but cancellation
    // can push the double form a hair negative for near-constant
    // groups, turning sqrt into NaN; clamped, a near-zero variance
    // yields a large finite |t| instead (ADVICE r12).
    def varv(n: String, sx: String, qx: String) =
      greatest(col(n).cast("double") * col(qx).cast("double") -
        col(sx).cast("double") * col(sx).cast("double"), lit(0.0)) /
        (col(n).cast("double") * (col(n).cast("double") - 1.0))
    val tstat = (meanv("n1", "s1") - meanv("n2", "s2")) /
      sqrt(varv("n1", "s1", "q1") / col("n1").cast("double") +
        varv("n2", "s2", "q2") / col("n2").cast("double"))
    j.filter(col("n1") > 1 && col("n2") > 1)
      .select(col(group), col("n1").as("n"),
        round(tstat, 6).as("t_stat"),
        (abs(tstat) > 2.0).as("shifted"))
  }

  /** Exact Gini coefficient of an integer-valued measure: rank formula
    * G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n over ascending-value order, ranks
    * from the DISTRIBUTED global enumeration ([[Ops.assignIds]] —
    * range partition + zipWithIndex, no single-task ORDER BY window),
    * the rank-weighted sum in decimal(38,0) (it's ~n²·avg — a raw
    * BIGINT wraps at scale). One output row (n, total, gini). Mirrors
    * q203's arithmetic exactly. `key` breaks rank ties
    * deterministically.
    */
  def gini(df: DataFrame, key: String, value: Column): DataFrame = {
    val v = df.select(col(key).as("__k"), value.cast("long").as("__v"))
    val ranked = Ops.assignIds(v,
      Seq(col("__v").asc, col("__k").asc), "rid")
    ranked.agg(
        count(lit(1)).as("n"),
        sum(col("__v")).as("total"),
        // cast the rank factor to decimal BEFORE the multiply: the
        // per-row product i·xᵢ is itself ~n·avg and wraps a BIGINT long
        // before the sum does (ADVICE r11)
        sum(((col("rid") + 1L).cast("decimal(38,0)") * col("__v"))
          .cast("decimal(38,0)")).as("s1"))
      .select(col("n"), col("total"),
        round(
          (col("s1") * 2L).cast("double") /
            (col("n").cast("decimal(38,0)") * col("total")).cast("double") -
          (col("n") + 1L).cast("double") / col("n").cast("double"), 6)
          .as("gini"))
  }

  /** EXACT ROC AUC (Mann-Whitney form): concordant pairs counted from
    * per-score (pos, neg) tallies and a distributed cumulative-negatives
    * prefix ([[Ops.runningTotal]] over the score domain, never data
    * rows); ties at half weight. Numerator and denominator accumulate
    * in decimal(38,0) — they are ~P·N, the very pair count that never
    * materializes. One output row. Mirrors q198's arithmetic exactly.
    * `score` must be integer-valued; `pos` boolean.
    */
  def aucExact(df: DataFrame, score: Column, pos: Column): DataFrame = {
    val d = df.select(score.cast("long").as("__s"), pos.as("__p"))
    val per = d.groupBy(col("__s")).agg(
      sum(when(col("__p"), 1L).otherwise(0L)).as("np"),
      sum(when(!col("__p"), 1L).otherwise(0L)).as("nn"))
    val c = Ops.runningTotal(per, Seq(col("__s")), "nn",
        buckets = 16, outCol = "cum_nn")
      .withColumn("cumb", col("cum_nn") - col("nn"))
    c.agg(
        sum(col("np")).as("p"), sum(col("nn")).as("n"),
        // np is cast to decimal BEFORE the multiply: the per-row
        // product np·(2·cumb+nn) is itself ~P·N-sized and wraps a
        // BIGINT at production counts (np~2e9 · cumb~2.3e9) long
        // before the sum does (ADVICE r11)
        sum((col("np").cast("decimal(38,0)") *
            (lit(2L) * col("cumb") + col("nn")))
          .cast("decimal(38,0)")).as("auc_num2"))
      .select(col("p"), col("n"), col("auc_num2"),
        (col("p").cast("decimal(38,0)") * col("n") * 2L)
          .cast("decimal(38,0)").as("auc_den2"),
        round(col("auc_num2").cast("double") /
          (col("p").cast("decimal(38,0)") * col("n") * 2L).cast("double"), 6)
          .as("auc"))
  }

  /** Touch attribution: for every conversion, the count of qualifying
    * touches by the same key within `within` BEFORE it (the q73
    * composition over [[graft.streaming.EventStreams.intervalJoin]] —
    * both inputs need a `ts` timestamp column). Output: one row per
    * (conversion id, key) with n_touches. The join is an equi-join on
    * key with a bounded time residual — never a time-cartesian.
    */
  def attribution(touches: DataFrame, convs: DataFrame, key: String,
                  convId: String, within: String = "1 hour"): DataFrame =
    graft.streaming.EventStreams.intervalJoin(touches, convs, key, within)
      .groupBy(col(s"r_$convId").as(convId), col(key))
      .agg(count(lit(1)).as("n_touches"))

  /** Cumulative Poisson(1) CDF at k = 0..7 — the inverse-CDF
    * thresholds of the Poissonized bootstrap's per-row resample
    * weights. SINGLE SOURCE for both engines: [[bootstrapDiff]] builds
    * its when-chain from these and the q233 oracle interpolates the
    * same values as SQL literals (Scala's shortest-roundtrip
    * Double.toString parses back to the identical double in DuckDB).
    * P(X > 7) < 1.1e-5 — the tail collapses to weight 8.
    */
  val PoissonCdf: Seq[Double] = {
    val e = math.exp(-1.0)
    Seq(1.0, 1.0, 2.0, 6.0, 24.0, 120.0, 720.0, 5040.0)
      .scanLeft(0.0)((acc, f) => acc + e / f).tail
  }

  /** Paired Poissonized-bootstrap significance test (Efron; the
    * "Poissonization" is the standard distributed form — per-row
    * multinomial resample counts approximated by independent
    * Poisson(1) draws, exact enough at any real n and embarrassingly
    * parallel): given a per-item integer DIFFERENCE column (metric A
    * minus metric B — e.g. correct(A) − correct(B) per document),
    * draws `resamples` deterministic bootstrap resamples and reports
    * how many land positive / zero / negative. The eval release gate:
    * "model B beats A" ships only when the diff's sign survives
    * resampling (frac_pos near 1 or 0 = significant; near 0.5 =
    * noise).
    *
    * Determinism: the weight of item i in resample r is the
    * Poisson(1) inverse CDF of the md5 unit hash of (id, r, salt) —
    * the q130/q101 hash family, replayed verbatim by the oracle; the
    * per-resample sums Σ w·diff are exact integers in decimal(38,0).
    *
    * Scale shape: one generator (explode of the 0..B-1 sequence —
    * B-fold row amplification that never materializes: each exploded
    * row feeds straight into a map-side partial sum), then ONE
    * hash-agg keyed by resample whose shuffle carries B rows per
    * partition, then a B-row finish. No resample ever exists as a
    * dataset; observed total rides the same pass as resample 0's
    * sibling aggregate.
    *
    * Output (one row): resamples, total_diff (the observed unweighted
    * Σ diff, canonical digit string), n_pos, n_zero, n_neg,
    * frac_pos = round(n_pos/resamples, 6).
    */
  def bootstrapDiff(df: DataFrame, idCol: String, diff: Column,
                    resamples: Int = 200, salt: String = ""): DataFrame = {
    // loud on empty input (ADVICE r14): a significance test over zero
    // items is undefined — resampling nothing would report a
    // degenerate resamples=0 row instead of the modeling error it is
    require(!df.isEmpty,
      "bootstrapDiff: empty input — no items to resample; filter/join " +
        "upstream produced zero eval rows")
    bootstrapFinish(bootstrapParts(df, idCol, diff, resamples, salt))
  }

  /** The mergeable state behind [[bootstrapDiff]] and its streaming
    * twin: one (__r, __s) row per resample (exact decimal(38,0) sum of
    * the Poisson-weighted diffs) plus the sentinel row __r = −1
    * carrying the observed unweighted total. Because per-item weights
    * depend only on (id, resample, salt), the parts of any data
    * partition ADD — summing parts over batches is bit-equal to
    * computing them over the union (StreamingSpec pins it at every
    * cut).
    */
  private[graft] def bootstrapParts(df: DataFrame, idCol: String,
                                    diff: Column, resamples: Int,
                                    salt: String): DataFrame = {
    require(resamples >= 1 && resamples <= 100000,
      s"bootstrapDiff: resamples in [1,100000], got $resamples")
    val d = df.select(col(idCol).cast("string").as("__id"),
      diff.cast("long").as("__d"))
    val u = Ops.kmvUnitHash(concat(col("__id"), lit(":"),
      col("__r").cast("string"), lit(":"), lit(salt)))
    // built inside-out so the OUTERMOST branch tests the smallest
    // threshold — identical to the oracle's ascending CASE chain
    val w = PoissonCdf.zipWithIndex.reverse
      .foldLeft(lit(8L)) { case (els, (c, k)) =>
        when(col("__u") < lit(c), lit(k.toLong)).otherwise(els)
      }
    val perResample = d
      .select(col("__id"), col("__d"),
        explode(sequence(lit(0), lit(resamples - 1))).as("__r"))
      .withColumn("__u", u)
      .withColumn("__w", w)
      .groupBy(col("__r"))
      .agg(sum((col("__w") * col("__d")).cast("decimal(38,0)")).as("__s"))
    val obs = d.agg(lit(-1).as("__r"),
      sum(col("__d").cast("decimal(38,0)")).as("__s"))
    perResample.unionByName(obs)
  }

  /** Finisher over [[bootstrapParts]] state (batch or merged-stream).
    * Guarded for the no-data-yet state (ADVICE r14): a stream reader
    * called before the first batch sees resamples=0 with zero counts,
    * total_diff "0", and frac_pos NULL — a well-defined "nothing
    * observed" row instead of 0/0 nulls. The batch entry point
    * ([[bootstrapDiff]]) rejects empty input loudly before this.
    */
  private[graft] def bootstrapFinish(parts: DataFrame): DataFrame = {
    val obs = parts.filter(col("__r") === -1)
      .select(col("__s").as("__tot"))
    parts.filter(col("__r") >= 0)
      .agg(count(lit(1)).cast("int").as("resamples"),
        sum(when(col("__s") > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("__s") === 0, 1L).otherwise(0L)).as("n_zero"),
        sum(when(col("__s") < 0, 1L).otherwise(0L)).as("n_neg"))
      .crossJoin(broadcast(obs))
      .select(col("resamples"),
        coalesce(col("__tot"), lit(0)).cast("decimal(38,0)")
          .cast("string").as("total_diff"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_zero"), lit(0L)).as("n_zero"),
        coalesce(col("n_neg"), lit(0L)).as("n_neg"),
        when(col("resamples") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_pos").cast("double") /
            col("resamples").cast("double"), 6)).as("frac_pos"))
  }

  /** Cohen's kappa — chance-corrected inter-rater agreement between
    * two categorical rating columns, per group: κ = (p_o − p_e)/(1 −
    * p_e) with p_o the observed agreement rate and p_e the chance rate
    * Σ_c marginal_a(c)·marginal_b(c). The labeling-QA staple for
    * RLHF/eval annotation pipelines (rater vs rater, model vs gold).
    *
    * Determinism: agreement and the per-label marginal counts are
    * exact integers; the chance numerator Σ n_a(c)·n_b(c) accumulates
    * as decimal(38,0) (products of two corpus-scale counts overflow
    * long at ~3·10⁹ rows); p_o, p_e, and κ are fixed-order double
    * expressions over those exact values, rounded at the edge —
    * mirrors 1:1 into SQL.
    *
    * Scale shape: one grouped agg for (n, agree), two (group,
    * label)-keyed aggs for the marginals, one full-outer vocab-sized
    * join between them (labels missing from one rater contribute 0),
    * one group-keyed hash-agg for the chance sum, one broadcast-sized
    * group join at the end. Everything keys on (group, label): no
    * windows, no corpus reshuffle beyond the label aggs.
    *
    * Output: (groupCols…, n, agree, po, pe, kappa); κ is NULL when
    * p_e = 1 (both raters constant and equal — agreement is undefined
    * beyond chance).
    */
  /** Krippendorff's alpha (nominal data, any number of raters per
    * unit, tolerant of missing ratings — Krippendorff 2004) — the
    * general inter-rater reliability statistic where [[cohenKappa]] is
    * the two-complete-raters special case.
    *
    * Coincidence algebra, reduced to the diagonal: with n_uc = ratings
    * of category c on unit u and m_u = Σ_c n_uc (units with m_u ≥ 2
    * only),
    *
    *   alpha = 1 − (n − 1)·(n − A) / (n² − Σ_c n_c²)
    *
    * where A = Σ_u (Σ_c n_uc² − m_u)/(m_u − 1) is the matching-pair
    * coincidence mass, n_c = Σ_u n_uc the category marginals and
    * n = Σ_c n_c — because row marginals of the coincidence matrix are
    * exactly n_c, the off-diagonal sums collapse and only A is ever a
    * fraction. n and n_c stay exact integers; A's per-unit terms are
    * quantized decimal(30,12) pre-sum (partition-order-free, oracle
    * bit-replayable). Degenerate De = 0 (one category) → NULL.
    *
    * Shape: one (group, unit, value) hash-agg, one (group, unit)
    * hash-agg, then category- and group-sized aggregates — unit
    * cardinality never sorts, windows never appear.
    */
  def krippendorffAlpha(df: DataFrame, unitCol: String, valueCol: String,
                        groupCols: Seq[String] = Nil): DataFrame = {
    val g = groupCols.map(col)
    val r = df.select(g :+ col(unitCol).cast("string").as("__u")
      :+ col(valueCol).cast("string").as("__c"): _*)
      .filter(col("__u").isNotNull && col("__c").isNotNull)
    def grouped(d: DataFrame, cols: Seq[Column]) =
      if (cols.isEmpty) d.groupBy() else d.groupBy(cols: _*)
    val nuc = grouped(r, g :+ col("__u") :+ col("__c"))
      .agg(count(lit(1)).as("__nuc"))
    val perUnit = grouped(nuc, g :+ col("__u"))
      .agg(sum(col("__nuc")).as("__m"),
        sum(col("__nuc") * col("__nuc")).as("__s2"))
      .filter(col("__m") >= 2)
    val unitTerm = (col("__s2").cast("double") - col("__m").cast("double")) /
      (col("__m").cast("double") - lit(1.0))
    val totals = grouped(perUnit, g)
      .agg(sum(col("__m")).as("__n"),
        sum(unitTerm.cast("decimal(30,12)")).as("__a"))
    // category marginals over ELIGIBLE units only (m >= 2)
    val eligible = perUnit.select(g :+ col("__u"): _*)
    val joinU = groupCols :+ "__u"
    val nc = grouped(nuc.join(eligible, joinU), g :+ col("__c"))
      .agg(sum(col("__nuc")).as("__nc"))
    val sq = grouped(nc, g)
      .agg(sum(col("__nc").cast("decimal(38,0)") *
        col("__nc").cast("decimal(38,0)")).as("__sumsq"))
    val joined =
      if (groupCols.isEmpty) totals.crossJoin(broadcast(sq))
      else totals.join(sq, groupCols)
    val nD = col("__n").cast("double")
    val de = nD * nD - col("__sumsq").cast("double")
    val alpha = lit(1.0) -
      (nD - lit(1.0)) * (nD - col("__a").cast("double")) / de
    joined.select(g ++ Seq(col("__n").as("n_ratings"),
      when(de === 0.0, lit(null).cast("double"))
        .otherwise(round(alpha, 6)).as("alpha")): _*)
  }

  def cohenKappa(df: DataFrame, aCol: String, bCol: String,
                 groupCols: Seq[String] = Nil): DataFrame = {
    val g = groupCols.map(col)
    val r = df.select(g :+ col(aCol).cast("string").as("__a")
      :+ col(bCol).cast("string").as("__b"): _*)
    def grouped(d: DataFrame, cols: Seq[Column]) =
      if (cols.isEmpty) d.groupBy() else d.groupBy(cols: _*)
    val base = grouped(r, g).agg(count(lit(1)).as("n"),
      sum(when(col("__a") === col("__b"), 1L).otherwise(0L)).as("agree"))
    val ma = grouped(r, g :+ col("__a").as("__c"))
      .agg(count(lit(1)).as("__na"))
    val mb = grouped(r, g :+ col("__b").as("__c"))
      .agg(count(lit(1)).as("__nb"))
    val joinKeys = groupCols :+ "__c"
    val chance = ma.join(mb, joinKeys, "full_outer")
      .select(g :+ (coalesce(col("__na"), lit(0L)) *
        coalesce(col("__nb"), lit(0L))).cast("decimal(38,0)").as("__ab"): _*)
    val pe = grouped(chance, g).agg(sum(col("__ab")).as("__s"))
    val joined =
      if (groupCols.isEmpty) base.crossJoin(broadcast(pe))
      else base.join(pe, groupCols)
    val poX = col("agree").cast("double") / col("n").cast("double")
    val peX = col("__s").cast("double") /
      (col("n").cast("double") * col("n").cast("double"))
    joined.select(g ++ Seq(col("n"), col("agree"),
      round(poX, 6).as("po"), round(peX, 6).as("pe"),
      when(peX === 1.0, lit(null).cast("double"))
        .otherwise(round((poX - peX) / (lit(1.0) - peX), 6)).as("kappa")): _*)
  }
}

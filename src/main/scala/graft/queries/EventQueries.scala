package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.EventStreams

/** Event-time queries over `events` — the batch twins of the
  * Structured Streaming pipelines in graft.streaming (same functions,
  * so the oracle checks streaming semantics too).
  */
object EventQueries {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // JSON side-channel: from_json extraction + aggregate.
    "q60_from_json" -> ((s, dir) => {
      import s.implicits._
      EventStreams.withProps(t(s, dir, "events"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"k").as("sum_k"),
          count($"k").as("n_k"))
        .orderBy($"event_type")
    }),

    // Tumbling 1h event-time windows.
    "q61_window_tumbling" -> ((s, dir) => {
      import s.implicits._
      EventStreams.tumblingCounts(t(s, dir, "events"))
        .orderBy($"ws", $"event_type")
    }),

    // Sliding 1h windows every 30min.
    "q62_window_sliding" -> ((s, dir) => {
      import s.implicits._
      EventStreams.slidingCounts(t(s, dir, "events"))
        .orderBy($"ws", $"event_type")
    }),

    // Session windows (30min gap) per user.
    "q63_session_window" -> ((s, dir) => {
      import s.implicits._
      EventStreams.userSessions(t(s, dir, "events"))
        .orderBy($"user_id", $"session_start")
    }),

    // Click attribution: per click, how many same-user views preceded
    // it within the hour — the batch twin of the watermarked
    // stream-stream interval join (StreamingSpec runs the SAME
    // EventStreams.intervalJoin under MemoryStreams and converges to
    // this result).
    "q73_click_attribution" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"ts", $"event_id".as("view_id"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_id"))
      EventStreams.intervalJoin(views, clicks, "user_id", "1 hour")
        .groupBy($"r_click_id".as("click_id"), $"user_id")
        .agg(count(lit(1)).as("n_views"))
        .orderBy($"click_id")
    }),

    // Unattributed views (the other half of q73): views with NO click
    // from the same user within the hour — left-outer interval join,
    // null-filter, per-user count. The streaming twin is the stateful
    // watermark-gated outer join (StreamingSpec); in batch it is this
    // oracle-checkable relation.
    "q115_unattributed_views" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"ts", $"event_id".as("view_id"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_id"))
      EventStreams.intervalJoinLeftOuter(views, clicks, "user_id", "1 hour")
        .filter($"r_click_id".isNull)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_unattributed"))
        .orderBy($"user_id")
    }),

    // Full reconciliation (completes the q73/q115 attribution family):
    // matched pairs, never-converted views, AND orphan clicks in ONE
    // full-outer interval join — per-user counts of all three. Under
    // streaming both unmatched sides are watermark-gated
    // (StreamingSpec convergence); in batch it is this relation.
    "q123_interval_reconcile" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"ts", $"event_id".as("view_id"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_id"))
      EventStreams.intervalJoinFullOuter(views, clicks, "user_id", "1 hour")
        .groupBy($"user_id")
        .agg(
          sum(when($"view_id".isNotNull && $"r_click_id".isNotNull, 1)
            .otherwise(0)).cast("long").as("n_matched"),
          sum(when($"r_click_id".isNull, 1).otherwise(0))
            .cast("long").as("n_view_only"),
          sum(when($"view_id".isNull, 1).otherwise(0))
            .cast("long").as("n_click_only"))
        .orderBy($"user_id")
    }),

    // Ordered funnel (view → click → purchase, each stage strictly
    // after the previous): per-stage reach counts + conversion rates.
    // Each stage is min-aggregate + equi-join — stage N's table is one
    // row per surviving user, so the chain is N broadcastable joins,
    // never a per-user sequence scan.
    "q125_funnel" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t1"))
      val c = ev.filter($"event_type" === "click").join(v, "user_id")
        .filter($"ts" > $"t1")
        .groupBy($"user_id").agg(min($"ts").as("t2"))
      val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
        .filter($"ts" > $"t2")
        .groupBy($"user_id").agg(min($"ts").as("t3"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
        .select($"n_view", $"n_click", $"n_purchase",
          round($"n_click".cast("double") / $"n_view".cast("double"), 4)
            .as("view_to_click"),
          round($"n_purchase".cast("double") / $"n_click".cast("double"), 4)
            .as("click_to_purchase"))
    }),

    // Weekly cohort retention: users grouped by first-activity week,
    // counted in each subsequent active week. Two aggregates + one
    // equi-join; both engines truncate weeks to ISO Monday, and the
    // offset divides an exact day difference, so the cohort grid is
    // engine-identical.
    "q126_cohort_retention" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val f = ev.groupBy($"user_id")
        .agg(date_trunc("week", min($"ts")).as("cw"))
      val a = ev.select($"user_id", date_trunc("week", $"ts").as("w"))
        .distinct()
      a.join(f, "user_id")
        .groupBy($"cw".cast("date").as("cohort_week"),
          floor(datediff($"w", $"cw") / 7).cast("int").as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy($"cohort_week", $"week_offset")
    }),

    // First-order Markov transition matrix over per-user event
    // sequences: lag() within (user_id ORDER BY ts, event_id) pairs
    // each event with its predecessor; counts then normalize per
    // source state. One window pass + one aggregate; the probability
    // divides two exact longs, so the double is engine-identical
    // before rounding.
    "q135_event_transitions" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val c = t(s, dir, "events")
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNotNull)
        .groupBy($"prev_type", $"event_type".as("next_type"))
        .agg(count(lit(1)).as("n_trans"))
      val tot = Window.partitionBy($"prev_type")
      c.select($"prev_type", $"next_type", $"n_trans",
        round($"n_trans".cast("double") /
          sum($"n_trans").over(tot).cast("double"), 4).as("p_trans"))
    }),

    // Rolling 7-day distinct actives (weekly-active purchasers per
    // calendar day). Join-free at scale: each (day, user) contributes
    // itself to the 7 days it covers via a generated explode — no
    // range join, no count-distinct-over-window (which Spark and most
    // engines reject). The calendar inner join only trims generated
    // days past the observed range; it is broadcast-size (one row per
    // day).
    "q138_rolling_actives" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "events")
        .filter($"event_type" === "purchase")
        .select(to_date(date_trunc("day", $"ts")).as("day"), $"user_id")
        .distinct()
      val cal = d.agg(min($"day").as("mn"), max($"day").as("mx"))
        .select(explode(sequence($"mn", $"mx")).as("day"))
      val contrib = d.select(
        explode(sequence(lit(0), lit(6))).as("i"), $"day", $"user_id")
        .select(date_add($"day", $"i").as("day"), $"user_id")
      contrib.join(broadcast(cal), "day")
        .groupBy($"day")
        .agg(countDistinct($"user_id").as("wau"))
    }),

    // Z-score outlier flagging per event type: mean/std from ONE
    // grouped pass with exact-decimal sum and sum-of-squares (the
    // dsum convention), broadcast back; the z computation is pure
    // double IEEE arithmetic in the same expression shape as the
    // oracle, so flags and rounded scores are engine-identical.
    "q139_zscore_outliers" -> ((s, dir) => {
      import s.implicits._
      val dv = $"value".cast("decimal(30,4)")
      val stats = t(s, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum(dv).as("sv"), sum(dv * dv).as("svv"))
      val z = ($"value" - $"sv".cast("double") / $"n") /
        sqrt(($"svv".cast("double") -
          $"sv".cast("double") * $"sv".cast("double") / $"n") / ($"n" - 1))
      t(s, dir, "events")
        .join(broadcast(stats), "event_type")
        .filter(abs(z) > 2)
        .select($"event_id", $"event_type", round(z, 4).as("z"))
    }),

    // q138's sketch-based scale path: rolling 7-day distinct via KMV
    // MERGE. One bounded sketch per day (only k-vectors cross any
    // shuffle, whatever the corpus size); each day's sketch
    // contributes to the 7 windows it covers and the union re-sketch
    // IS the window's sketch (bottom-k of a union of bottom-ks).
    // The md5 unit hash makes every estimate deterministic, so the
    // oracle replays the whole sketch relationally (q119 convention)
    // and the exact count rides along for error inspection.
    "q140_rolling_kmv" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.Encoders
      val k = 64
      val kmv = udaf(new graft.functions.Aggregators.KmvSketch(k),
        Encoders.scalaDouble)
      val Ops = graft.operators.Ops
      val d = t(s, dir, "events")
        .filter($"event_type" === "purchase")
        .select(to_date(date_trunc("day", $"ts")).as("day"), $"user_id")
        .distinct()
      val cal = d.agg(min($"day").as("mn"), max($"day").as("mx"))
        .select(explode(sequence($"mn", $"mx")).as("day"))
      val daily = d
        .select($"day", Ops.kmvUnitHash($"user_id").as("u"))
        .groupBy($"day").agg(kmv($"u").as("sk"))
      val rolled = daily
        .select(explode(sequence(lit(0), lit(6))).as("i"), $"day", $"sk")
        .select(date_add($"day", $"i").as("day"), explode($"sk").as("u"))
        .join(broadcast(cal), "day")
        .groupBy($"day").agg(kmv($"u").as("sk"))
      val exact = d
        .select(explode(sequence(lit(0), lit(6))).as("i"), $"day", $"user_id")
        .select(date_add($"day", $"i").as("day"), $"user_id")
        .join(broadcast(cal), "day")
        .groupBy($"day").agg(countDistinct($"user_id").as("exact_wau"))
      rolled
        .select($"day",
          round(Ops.kmvDistinctEstimate($"sk", k), 4).as("est_wau"))
        .join(exact, "day")
    }),

    // Batch sessionization (gaps-and-islands): a session breaks after
    // 30 minutes of inactivity. The break flag compares timestamps
    // with INTERVAL arithmetic (exact micros, no unit truncation), the
    // running sum of flags numbers sessions, then one aggregate per
    // (user, session). The batch twin of the streaming session_window
    // family — same relation, derivable by any SQL engine.
    "q141_session_islands" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val prev = lag($"ts", 1).over(w)
      val flag = when(prev.isNull ||
        $"ts" > prev + expr("INTERVAL 30 MINUTES"), 1).otherwise(0)
      t(s, dir, "events")
        .withColumn("brk", flag)
        .withColumn("sid", sum($"brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"sid".as("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min($"ts").as("session_start"), max($"ts").as("session_end"))
    }),

    // Calendar resample + forward fill: per-user daily totals on a
    // dense (user × day) grid, gaps carried forward with
    // last(ignoreNulls) — the time-series densification step most
    // engines make users hand-roll. The calendar is broadcast-size;
    // the fill is one window pass ordered by day; days before a
    // user's first activity stay null in both engines.
    "q142_forward_fill" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
      val daily = ev.groupBy($"user_id",
          to_date(date_trunc("day", $"ts")).as("day"))
        .agg(round(sum($"value".cast("decimal(30,4)")), 2)
          .cast("double").as("daily_total"))
      val cal = daily.agg(min($"day").as("mn"), max($"day").as("mx"))
        .select(explode(sequence($"mn", $"mx")).as("day"))
      val grid = ev.select($"user_id").distinct().crossJoin(broadcast(cal))
      val w = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select($"user_id", $"day",
          last($"daily_total", ignoreNulls = true).over(w).as("filled"))
    }),

    // Winsorization (robust stats, the clip-don't-drop counterpart of
    // q139's z-score flags): per-type P5/P95 from ONE exact-percentile
    // aggregate (bit-parity with quantile_cont, q16 convention),
    // broadcast back; values clip to the fences and the clipped sum
    // goes through the exact-decimal path.
    "q143_winsorize" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val b = ev.groupBy($"event_type").agg(
        expr("percentile(value, 0.05)").as("lo"),
        expr("percentile(value, 0.95)").as("hi"))
      ev.join(broadcast(b), "event_type")
        .groupBy($"event_type").agg(
          sum(when($"value" < $"lo", 1).otherwise(0)).cast("long").as("n_lo"),
          sum(when($"value" > $"hi", 1).otherwise(0)).cast("long").as("n_hi"),
          round(sum(when($"value" < $"lo", $"lo")
            .when($"value" > $"hi", $"hi")
            .otherwise($"value").cast("decimal(30,4)")), 2)
            .cast("double").as("winsor_sum"))
    }),

    // Longest consecutive-day purchase streak per user: the date
    // variant of gaps-and-islands — day minus its per-user rank is
    // constant exactly while days are consecutive, so one window pass
    // + two aggregates find every streak with no self-join.
    "q144_active_streaks" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "events")
        .filter($"event_type" === "purchase")
        .select($"user_id", to_date(date_trunc("day", $"ts")).as("day"))
        .distinct()
      val w = Window.partitionBy($"user_id").orderBy($"day")
      d.withColumn("grp", date_sub($"day", row_number().over(w)))
        .groupBy($"user_id", $"grp").agg(count(lit(1)).as("streak"))
        .groupBy($"user_id").agg(max($"streak").as("max_streak"))
    }),

    // Time-to-convert percentiles: first view → first subsequent
    // purchase per user, latency kept in exact integer MICROS (no
    // boundary-counting date_diff ambiguity), median/p90 from the
    // exact percentile (quantile_cont parity, q16 convention).
    "q145_funnel_latency" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t1"))
      val p = ev.filter($"event_type" === "purchase").join(v, "user_id")
        .filter($"ts" > $"t1")
        .groupBy($"user_id", $"t1").agg(min($"ts").as("t2"))
      p.select((unix_micros($"t2".cast("timestamp")) -
          unix_micros($"t1".cast("timestamp"))).as("lat_us"))
        .agg(count(lit(1)).as("n_converters"),
          expr("percentile(lat_us, 0.5)").as("median_lat_us"),
          expr("percentile(lat_us, 0.9)").as("p90_lat_us"))
    }),

    // Sequence-pattern detection (the MATCH_RECOGNIZE shape): find
    // CONSECUTIVE view → click → purchase triples per user that
    // complete within 24 hours — one shuffle by user, two lead()
    // probes over the per-user event order, exact micros span. No
    // self-joins: adjacency rides the same window pass that any
    // funnel step-order query already needs.
    "q192_event_pattern" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .select($"user_id", $"event_id", $"ts", $"event_type")
        .withColumn("t1", lead($"event_type", 1).over(w))
        .withColumn("t2", lead($"event_type", 2).over(w))
        .withColumn("ts2", lead($"ts", 2).over(w))
        .filter($"event_type" === "view" && $"t1" === "click" &&
          $"t2" === "purchase" &&
          unix_micros($"ts2") - unix_micros($"ts") <= 86400000000L)
        .select($"user_id", $"event_id".as("start_event"),
          (unix_micros($"ts2") - unix_micros($"ts")).as("span_us"))
        .orderBy($"user_id", $"start_event")
    }),

    // EXACT two-sample Kolmogorov-Smirnov per event type (first vs
    // second half-month): KS = max |CDF1 − CDF2| evaluated only at
    // the observed distinct cent values — as the INTEGER maximum of
    // |cum1·n2 − cum2·n1| over a common denominator n1·n2, so the
    // statistic has no float comparison anywhere. The cumulative runs
    // per type over the distinct-value table (bounded by the value
    // domain, not the row count). Completes the drift family:
    // KL (q132), χ² (q186), t (q191), PSI (q201), KS (q202).
    "q202_ks_drift" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "events").select($"event_type",
        floor($"value" * 100).cast("long").as("c"),
        when($"ts" < lit("2024-01-16").cast("timestamp"), 0).otherwise(1)
          .as("per"))
      val cells = d.groupBy($"event_type", $"c").agg(
        sum(when($"per" === 0, 1L).otherwise(0L)).as("c1"),
        sum(when($"per" === 1, 1L).otherwise(0L)).as("c2"))
      val w = Window.partitionBy($"event_type").orderBy($"c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = cells
        .withColumn("cum1", sum($"c1").over(w))
        .withColumn("cum2", sum($"c2").over(w))
      val tot = cells.groupBy($"event_type")
        .agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
      // The cross products are bounded by n1·n2, which wraps a BIGINT
      // once per-type counts pass ~3e9 — take them (and the n1·n2
      // denominator) through decimal(38,0) so the "no float anywhere"
      // guarantee holds at scale, matching the HUGEINT-promoting
      // oracle. The OUTPUT carries ks_num/ks_den as canonical digit
      // strings, not wide decimals: scale-0 decimal → string is plain
      // digits on both engines (spec-pinned, DecimalCanonSpec), while
      // raw DECIMAL(38,0) columns proved driver-environment-sensitive
      // for three rounds straight (r13 VERDICT directive #1).
      cum.join(tot, "event_type")
        .withColumn("num", abs($"cum1".cast("decimal(38,0)") * $"n2" -
          $"cum2".cast("decimal(38,0)") * $"n1").cast("decimal(38,0)"))
        .groupBy($"event_type")
        .agg(max($"n1").as("n_before"), max($"n2").as("n_after"),
          max($"num").as("ks_num"))
        .join(tot, "event_type")
        .select($"event_type", $"n_before", $"n_after",
          $"ks_num".cast("string").as("ks_num"),
          ($"n1".cast("decimal(38,0)") * $"n2")
            .cast("decimal(38,0)").cast("string").as("ks_den"),
          round($"ks_num".cast("double") /
            ($"n1".cast("decimal(38,0)") * $"n2").cast("double"), 6)
            .as("ks"))
        .orderBy($"event_type")
    }),

    // Population Stability Index per event type (first half-month vs
    // second): the model-monitoring standard for "did the input
    // distribution move?". Value histogram in fixed 20-unit bins,
    // +1-additive smoothing so empty cells stay finite and
    // DETERMINISTIC (no ε hand-waving), per-bin (p1−p2)·ln(p1/p2)
    // doubles quantized to decimal before the sum — the q132 drift
    // convention. One scan, conditional aggregation, |types|·|bins|
    // metadata table.
    "q201_psi_drift" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "events").select($"event_type",
        floor($"value" / 20).cast("int").as("b"),
        when($"ts" < lit("2024-01-16").cast("timestamp"), 0).otherwise(1)
          .as("per"))
      val cells = d.groupBy($"event_type", $"b").agg(
        sum(when($"per" === 0, 1L).otherwise(0L)).as("c1"),
        sum(when($"per" === 1, 1L).otherwise(0L)).as("c2"))
      val tot = cells.groupBy($"event_type").agg(
        sum($"c1").as("n1"), sum($"c2").as("n2"),
        count(lit(1)).as("nb"))
      val p1 = ($"c1" + 1L).cast("double") / ($"n1" + $"nb").cast("double")
      val p2 = ($"c2" + 1L).cast("double") / ($"n2" + $"nb").cast("double")
      val term = ((p1 - p2) * log(p1 / p2)).cast("decimal(30,12)")
      val psi = sum(term).cast("double")
      cells.join(tot, "event_type")
        .groupBy($"event_type")
        .agg(max($"n1").as("n_before"), max($"n2").as("n_after"),
          max($"nb").as("n_bins"), round(psi, 6).as("psi"),
          (psi > lit(0.10)).as("shifted"))
        .orderBy($"event_type")
    }),

    // Day-of-week seasonality profile: per (event_type, dow) exact
    // cent totals, share of the type's weekly volume (integer permille
    // of exact sums), and the peak day flag — the seasonal
    // decomposition a monitoring pipeline reads daily. One hash-agg
    // over the fact; the 7×|types| profile table is metadata-sized.
    "q199_dow_seasonality" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val per = t(s, dir, "events")
        .groupBy($"event_type", dayofweek($"ts").as("dow"))
        .agg(count(lit(1)).as("n"),
          sum(floor($"value" * 100).cast("long")).as("cents"))
      val w = Window.partitionBy($"event_type")
      per.withColumn("tot", sum($"cents").over(w))
        .withColumn("permille", expr("(cents * 1000) div tot"))
        .withColumn("peak", $"cents" === max($"cents").over(w))
        .select($"event_type", $"dow", $"n", $"cents", $"permille", $"peak")
        .orderBy($"event_type", $"dow")
    }),

    // Multi-touch (linear) attribution with EXACT credit: each
    // purchase splits 1000 permille across the user's views in the
    // prior 24h by largest-remainder — floor share to every view,
    // the remainder to the most recent ones — so credit sums to
    // exactly 1000 per attributed purchase (float splits leak credit;
    // permille integers cannot). Equi-join on user with a time-range
    // residual; the rank window is per PURCHASE (bounded by views/
    // purchase, never a whole-user scan).
    "q194_multitouch_attribution" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"ts".as("vts"), $"event_id".as("view_id"))
      val purch = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("pts"), $"event_id".as("purchase_id"))
      val pairs = views.join(purch, Seq("user_id"))
        .filter($"vts" < $"pts" &&
          unix_micros($"pts") - unix_micros($"vts") <= 86400000000L)
      val w = Window.partitionBy($"purchase_id")
        .orderBy($"vts".desc, $"view_id".desc)
      pairs
        .withColumn("rn", row_number().over(w))
        .withColumn("nv", count(lit(1)).over(
          Window.partitionBy($"purchase_id")))
        .withColumn("credit", (lit(1000L) / $"nv").cast("long") +
          when($"rn" <= lit(1000L) % $"nv", 1L).otherwise(0L))
        .groupBy($"user_id")
        .agg(countDistinct($"purchase_id").as("n_purchases"),
          countDistinct($"view_id").as("n_views_credited"),
          sum($"credit").as("credit_permille"))
        .orderBy($"user_id")
    }),

    // Time-decayed engagement score with EXACT integer arithmetic:
    // half-life = one week, decay = right-shift of whole cents by
    // weeks-ago (value halves each week, no float pow drift — the
    // decayed sum is partition-order invariant because every addend
    // is an exact integer). Anchor = max event day, a broadcast
    // 1-row aggregate, so the score is a pure function of the data.
    // Top-100 spenders-by-decayed-score, the "what's hot now"
    // leaderboard shape.
    "q182_decay_score" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val anchor = ev.agg(max(to_date(date_trunc("day", $"ts"))).as("d_max"))
      ev.crossJoin(broadcast(anchor))
        .select($"user_id",
          expr("shiftright(cast(floor(value * 100) as bigint), " +
            "cast(least(floor(datediff(d_max, to_date(ts)) / 7), 62) as int))")
            .as("dec_cents"))
        .groupBy($"user_id")
        .agg(sum($"dec_cents").as("score"), count(lit(1)).as("n_events"))
        .orderBy($"score".desc, $"user_id".asc)
        .limit(100)
    }),

    // First-occurrence precedence mining — the sequential-pattern
    // support a funnel designer wants before committing to a funnel
    // definition: for each event-type pair, in how many users does
    // a's FIRST occurrence precede b's (signup before purchase?
    // error before churn?). Distinct from q135 (adjacent-step Markov
    // transitions): precedence is order across the WHOLE history,
    // any gap. First occurrences via one per-user rank window —
    // bounded by a user's history, never corpus-wide — then a
    // per-user type×type self-join (|types|² ≤ 25 rows per user,
    // linear in users; never events×events). ratio = P(a first |
    // both present), one double division at the end.
    "q228_event_precedence" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val f = t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .groupBy($"user_id", $"event_type")
        .agg(min($"rn").as("pos"))
      val a = f.select($"user_id", $"event_type".as("ta"), $"pos".as("pa"))
      val b = f.select($"user_id", $"event_type".as("tb"), $"pos".as("pb"))
      a.join(b, "user_id")
        .filter($"ta" < $"tb")
        .groupBy($"ta", $"tb")
        .agg(sum(when($"pa" < $"pb", 1L).otherwise(0L)).as("n_ab"),
          sum(when($"pb" < $"pa", 1L).otherwise(0L)).as("n_ba"),
          count(lit(1)).as("n_both"))
        .withColumn("ratio", round($"n_ab".cast("double") / $"n_both", 6))
        .orderBy($"ta", $"tb")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // identical distinct-value CDF grid, identical integer cross
    // products — the statistic never touches a float until the final
    // reported ratio
    "q202_ks_drift" ->
      """WITH d AS (
        |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS c,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END
        |      AS per
        |  FROM events),
        |cells AS (
        |  SELECT event_type, c,
        |    CAST(sum(CASE WHEN per = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c1,
        |    CAST(sum(CASE WHEN per = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c2
        |  FROM d GROUP BY event_type, c),
        |cum AS (
        |  SELECT event_type, c, c1, c2,
        |    sum(c1) OVER (PARTITION BY event_type ORDER BY c) AS cum1,
        |    sum(c2) OVER (PARTITION BY event_type ORDER BY c) AS cum2
        |  FROM cells),
        |tot AS (
        |  SELECT event_type, CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c2) AS BIGINT) AS n2
        |  FROM cells GROUP BY event_type),
        |mx AS (
        |  SELECT cum.event_type,
        |    CAST(max(abs(cum1 * n2 - cum2 * n1)) AS DECIMAL(38,0))
        |      AS ks_num
        |  FROM cum JOIN tot ON tot.event_type = cum.event_type
        |  GROUP BY cum.event_type)
        |SELECT mx.event_type, n1 AS n_before, n2 AS n_after,
        |  CAST(ks_num AS VARCHAR) AS ks_num,
        |  CAST(CAST(CAST(n1 AS HUGEINT) * n2 AS DECIMAL(38,0))
        |    AS VARCHAR) AS ks_den,
        |  round(CAST(ks_num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE), 6)
        |    AS ks
        |FROM mx JOIN tot ON tot.event_type = mx.event_type
        |ORDER BY mx.event_type""".stripMargin,

    // identical bins, identical +1 smoothing, identical fixed-order
    // PSI arithmetic, decimal-quantized sum
    "q201_psi_drift" ->
      """WITH d AS (
        |  SELECT event_type, CAST(floor(value / 20) AS INTEGER) AS b,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END
        |      AS per
        |  FROM events),
        |cells AS (
        |  SELECT event_type, b,
        |    CAST(sum(CASE WHEN per = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c1,
        |    CAST(sum(CASE WHEN per = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c2
        |  FROM d GROUP BY event_type, b),
        |tot AS (
        |  SELECT event_type, sum(c1) AS n1, sum(c2) AS n2,
        |    count(*) AS nb
        |  FROM cells GROUP BY event_type)
        |SELECT cells.event_type,
        |  CAST(max(n1) AS BIGINT) AS n_before,
        |  CAST(max(n2) AS BIGINT) AS n_after,
        |  max(nb) AS n_bins,
        |  round(CAST(sum(CAST(
        |    ((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE))
        |     - (CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE))) *
        |    ln((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE))
        |       / (CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE)))
        |    AS DECIMAL(30,12))) AS DOUBLE), 6) AS psi,
        |  (CAST(sum(CAST(
        |    ((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE))
        |     - (CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE))) *
        |    ln((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE))
        |       / (CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE)))
        |    AS DECIMAL(30,12))) AS DOUBLE) > 0.10) AS shifted
        |FROM cells JOIN tot ON tot.event_type = cells.event_type
        |GROUP BY cells.event_type
        |ORDER BY cells.event_type""".stripMargin,

    // identical dow convention (Sunday=1), identical integer permille
    "q199_dow_seasonality" ->
      """WITH per AS (
        |  SELECT event_type,
        |    CAST(EXTRACT(dow FROM ts) + 1 AS INTEGER) AS dow,
        |    count(*) AS n,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, dow, n, cents,
        |    sum(cents) OVER (PARTITION BY event_type) AS tot,
        |    max(cents) OVER (PARTITION BY event_type) AS mx
        |  FROM per)
        |SELECT event_type, dow, n, cents,
        |  CAST((cents * 1000) // tot AS BIGINT) AS permille,
        |  (cents = mx) AS peak
        |FROM t
        |ORDER BY event_type, dow""".stripMargin,

    // identical pair set, identical largest-remainder permille split
    "q194_multitouch_attribution" ->
      """WITH v AS (
        |  SELECT user_id, ts AS vts, event_id AS view_id FROM events
        |  WHERE event_type = 'view'),
        |p AS (
        |  SELECT user_id, ts AS pts, event_id AS purchase_id FROM events
        |  WHERE event_type = 'purchase'),
        |pairs AS (
        |  SELECT v.user_id, vts, view_id, pts, purchase_id
        |  FROM v JOIN p ON v.user_id = p.user_id
        |  WHERE vts < pts
        |    AND epoch_us(pts) - epoch_us(vts) <= 86400000000),
        |ranked AS (
        |  SELECT user_id, view_id, purchase_id,
        |    row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY vts DESC, view_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY purchase_id) AS nv
        |  FROM pairs)
        |SELECT user_id,
        |  count(DISTINCT purchase_id) AS n_purchases,
        |  count(DISTINCT view_id) AS n_views_credited,
        |  CAST(sum(1000 // nv + CASE WHEN rn <= 1000 % nv THEN 1 ELSE 0 END)
        |    AS BIGINT) AS credit_permille
        |FROM ranked
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // identical per-user order, identical lead probes and micros span
    "q192_event_pattern" ->
      """WITH w AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS t1,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS t2,
        |    lead(ts, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS ts2
        |  FROM events)
        |SELECT user_id, event_id AS start_event,
        |  CAST(epoch_us(ts2) - epoch_us(ts) AS BIGINT) AS span_us
        |FROM w
        |WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
        |  AND epoch_us(ts2) - epoch_us(ts) <= 86400000000
        |ORDER BY user_id, start_event""".stripMargin,

    // identical integer shift-decay: cents >> min(weeks_ago, 62)
    "q182_decay_score" ->
      """WITH a AS (
        |  SELECT max(CAST(date_trunc('day', ts) AS DATE)) AS d_max
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT) >>
        |    CAST(least((d_max - CAST(date_trunc('day', ts) AS DATE)) // 7,
        |      62) AS INTEGER)) AS BIGINT) AS score,
        |  count(*) AS n_events
        |FROM events CROSS JOIN a
        |GROUP BY user_id
        |ORDER BY score DESC, user_id ASC
        |LIMIT 100""".stripMargin,

    "q60_from_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  count(json_extract_string(props, '$.k')) AS n_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q61_window_tumbling" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(30,4))), 2) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    "q62_window_sliding" ->
      """SELECT ws, event_type, count(*) AS n FROM (
        |  SELECT event_type, ts, unnest([
        |    time_bucket(INTERVAL 30 MINUTE, ts),
        |    time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS ws
        |  FROM events)
        |WHERE ts >= ws AND ts < ws + INTERVAL 60 MINUTE
        |GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin,

    "q63_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |           <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
        |  FROM events),
        |grouped AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  user_id, count(*) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(30,4))), 2) AS DOUBLE) AS total
        |FROM grouped GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q73_click_attribution" ->
      """SELECT c.event_id AS click_id, c.user_id AS user_id,
        |  count(*) AS n_views
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON v.user_id = c.user_id
        | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
        |GROUP BY c.event_id, c.user_id
        |ORDER BY click_id""".stripMargin,

    "q115_unattributed_views" ->
      """SELECT v.user_id AS user_id, count(*) AS n_unattributed
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = v.user_id
        | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
        |WHERE c.event_id IS NULL
        |GROUP BY v.user_id
        |ORDER BY user_id""".stripMargin,

    "q123_interval_reconcile" ->
      """SELECT coalesce(v.user_id, c.user_id) AS user_id,
        |  CAST(sum(CASE WHEN v.event_id IS NOT NULL
        |    AND c.event_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_matched,
        |  CAST(sum(CASE WHEN c.event_id IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_view_only,
        |  CAST(sum(CASE WHEN v.event_id IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_click_only
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = v.user_id
        | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
        |GROUP BY coalesce(v.user_id, c.user_id)
        |ORDER BY user_id""".stripMargin,

    "q125_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click,
        |  (SELECT count(*) FROM p) AS n_purchase,
        |  round(CAST((SELECT count(*) FROM c) AS DOUBLE)
        |    / CAST((SELECT count(*) FROM v) AS DOUBLE), 4) AS view_to_click,
        |  round(CAST((SELECT count(*) FROM p) AS DOUBLE)
        |    / CAST((SELECT count(*) FROM c) AS DOUBLE), 4) AS click_to_purchase""".stripMargin,

    "q126_cohort_retention" ->
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w
        |      FROM events)
        |SELECT CAST(f.cw AS DATE) AS cohort_week,
        |  CAST(date_diff('day', f.cw, a.w) // 7 AS INT) AS week_offset,
        |  count(*) AS n_active
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "q135_event_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT prev_type, event_type AS next_type,
        |    count(*) AS n_trans
        |  FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n_trans,
        |  round(CAST(n_trans AS DOUBLE)
        |    / CAST(sum(n_trans) OVER (PARTITION BY prev_type) AS DOUBLE),
        |    4) AS p_trans
        |FROM c""".stripMargin,

    "q138_rolling_actives" ->
      """WITH d AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE)
        |    AS day, user_id FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM d),
        |cal AS (SELECT CAST(unnest(generate_series(
        |    CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |x AS (SELECT CAST(d.day + i AS DATE) AS day, d.user_id
        |  FROM d CROSS JOIN unnest([0, 1, 2, 3, 4, 5, 6]) AS t(i))
        |SELECT cal.day, count(DISTINCT x.user_id) AS wau
        |FROM cal JOIN x ON x.day = cal.day GROUP BY 1""".stripMargin,

    "q139_zscore_outliers" ->
      """WITH s AS (SELECT event_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(30,4))) AS sv,
        |    sum(CAST(value AS DECIMAL(30,4))
        |      * CAST(value AS DECIMAL(30,4))) AS svv
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type,
        |  round((e.value - CAST(sv AS DOUBLE)/n) /
        |    sqrt((CAST(svv AS DOUBLE)
        |      - CAST(sv AS DOUBLE)*CAST(sv AS DOUBLE)/n)/(n-1)), 4) AS z
        |FROM events e JOIN s USING (event_type)
        |WHERE abs((e.value - CAST(sv AS DOUBLE)/n) /
        |    sqrt((CAST(svv AS DOUBLE)
        |      - CAST(sv AS DOUBLE)*CAST(sv AS DOUBLE)/n)/(n-1))) > 2""".stripMargin,

    "q140_rolling_kmv" ->
      """WITH d AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE)
        |    AS day, user_id FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM d),
        |cal AS (SELECT CAST(unnest(generate_series(
        |    CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |x AS (SELECT CAST(d.day + i AS DATE) AS day, d.user_id
        |  FROM d CROSS JOIN unnest([0, 1, 2, 3, 4, 5, 6]) AS t(i)),
        |w AS (SELECT cal.day, x.user_id
        |  FROM cal JOIN x ON x.day = cal.day GROUP BY 1, 2),
        |h AS (SELECT DISTINCT day,
        |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
        |  FROM w),
        |r AS (SELECT day, u,
        |    row_number() OVER (PARTITION BY day ORDER BY u) AS rk FROM h),
        |st AS (SELECT day, count(*) AS m,
        |    max(CASE WHEN rk = 64 THEN u END) AS uk
        |  FROM r WHERE rk <= 64 GROUP BY day),
        |ex AS (SELECT day, count(DISTINCT user_id) AS exact_wau
        |  FROM w GROUP BY 1)
        |SELECT st.day, round(CASE WHEN m < 64 THEN CAST(m AS DOUBLE)
        |    ELSE 63.0 / uk END, 4) AS est_wau, ex.exact_wau
        |FROM st JOIN ex ON st.day = ex.day""".stripMargin,

    "q141_session_islands" ->
      """WITH f AS (SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) IS NULL
        |      OR ts > lag(ts) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) + INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM s GROUP BY 1, 2""".stripMargin,

    "q142_forward_fill" ->
      """WITH daily AS (SELECT user_id,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(round(sum(CAST(value AS DECIMAL(30,4))), 2) AS DOUBLE)
        |      AS daily_total
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
        |cal AS (SELECT CAST(unnest(generate_series(
        |    CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |u AS (SELECT DISTINCT user_id FROM events),
        |grid AS (SELECT u.user_id, cal.day FROM u CROSS JOIN cal)
        |SELECT g.user_id, g.day,
        |  last_value(d.daily_total IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS UNBOUNDED PRECEDING) AS filled
        |FROM grid g LEFT JOIN daily d
        |  ON g.user_id = d.user_id AND g.day = d.day""".stripMargin,

    "q143_winsorize" ->
      """WITH b AS (SELECT event_type,
        |    quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY 1)
        |SELECT e.event_type,
        |  CAST(sum(CASE WHEN e.value < lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lo,
        |  CAST(sum(CASE WHEN e.value > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hi,
        |  CAST(round(sum(CAST(CASE WHEN e.value < lo THEN lo
        |      WHEN e.value > hi THEN hi ELSE e.value END
        |    AS DECIMAL(30,4))), 2) AS DOUBLE) AS winsor_sum
        |FROM events e JOIN b USING (event_type) GROUP BY 1""".stripMargin,

    "q144_active_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY day) AS INT) AS grp
        |  FROM d),
        |s AS (SELECT user_id, count(*) AS streak
        |  FROM g GROUP BY user_id, grp)
        |SELECT user_id, max(streak) AS max_streak
        |FROM s GROUP BY 1""".stripMargin,

    "q145_funnel_latency" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, v.t1, min(e.ts) AS t2
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > v.t1
        |  GROUP BY 1, 2),
        |l AS (SELECT epoch_us(t2) - epoch_us(t1) AS lat_us FROM p)
        |SELECT count(*) AS n_converters,
        |  quantile_cont(lat_us, 0.5) AS median_lat_us,
        |  quantile_cont(lat_us, 0.9) AS p90_lat_us
        |FROM l""".stripMargin,

    // same first-occurrence ranks ((ts, event_id) total order), same
    // type-pair self-join, BIGINT-cast support counts, one double
    // division
    "q228_event_precedence" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_type, min(rn) AS pos
        |  FROM r GROUP BY user_id, event_type)
        |SELECT a.event_type AS ta, b.event_type AS tb,
        |  CAST(sum(CASE WHEN a.pos < b.pos THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_ab,
        |  CAST(sum(CASE WHEN b.pos < a.pos THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_ba,
        |  count(*) AS n_both,
        |  round(CAST(sum(CASE WHEN a.pos < b.pos THEN 1 ELSE 0 END)
        |      AS DOUBLE) / count(*), 6) AS ratio
        |FROM f a JOIN f b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY a.event_type, b.event_type
        |ORDER BY ta, tb""".stripMargin
  )
}

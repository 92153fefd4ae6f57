package graft.queries

import org.apache.spark.sql.functions._

/** Event-time window surface over `events` — the batch twins of the
  * Structured Streaming operators in [[graft.streaming.EventStreams]]
  * (SURVEY.md §2.9 ST4). Sliding windows are oracled as a union of
  * shifted tumbling buckets; session windows as gaps-and-islands SQL.
  */
object EventQueries {

  /** Hourly-count Holt(α=β=½) state series (t, count, level, trend,
    * one-step forecast), computed ONCE per (session, sfDir) and shared
    * by `q48_holt` (the smoother) and `eval_forecast` (its backtest) —
    * one driver fold over the calendar-bounded series, and the two
    * queries can never desynchronize on the recurrence they share. */
  private def holtSeries(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(Int, Long, Double, Double, Double)] =
    sessionCached(s, ("holt-series", dir)) {
      import org.apache.spark.sql.expressions.Window
      val ser = table(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("c"))
        .withColumn("t", row_number().over(Window.orderBy("hr")))
        .select(col("t"), col("c")).orderBy("t")
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      var l = 0.0; var b = 0.0
      ser.map { case (t, c) =>
        if (t == 1) { l = c.toDouble; b = 0.0 }
        else {
          val lNew = 0.5 * c + 0.5 * (l + b)
          b = 0.5 * (lNew - l) + 0.5 * b
          l = lNew
        }
        (t, c, l, b, l + b)
      }.toSeq
    }

  val queries: Map[String, Query] = Map(
    // Time-series gap fill / resample: a dense hourly grid over the fixed
    // reporting window × every event type, zero-filled where no events
    // landed — the dashboard-resample shape. The grid is a generated
    // literal sequence crossed with the tiny type dimension (both bounded
    // by calendar × cardinality, never by event volume); actual counts
    // left-join in from one grouped pass over the facts.
    "q39_gapfill" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      val hourly = ev
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      val hours = s.range(1).select(explode(sequence(
        to_timestamp(lit("2024-01-01 00:00:00")),
        to_timestamp(lit("2024-01-30 23:00:00")),
        expr("interval 1 hour"))).as("hour"))
      val types = ev.select("event_type").distinct()
      hours.crossJoin(types)
        .join(hourly, Seq("hour", "event_type"), "left")
        .select(col("hour"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("total_value"), lit(0.0)).as("total_value"))
        .orderBy("hour", "event_type")
    },

    // Cumulative distinct users by day via the FIRST-SEEN trick: tag each
    // user's first-activity day (one grouped pass), count new users per
    // day, running-sum the tiny daily series. The scalable form of
    // "COUNT(DISTINCT) OVER (ORDER BY day)" — the naive window would
    // re-deduplicate the full event history per day; this shuffles events
    // once by user and the unpartitioned window runs on the ~30-row daily
    // aggregate, not the events.
    "q40_cumulative_users" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = table(s, dir, "events")
      val firstSeen = ev.groupBy("user_id")
        .agg(to_date(min(col("ts"))).as("day"))
      val newPerDay = firstSeen.groupBy("day")
        .agg(count(lit(1)).as("new_users"))
      val activePerDay = ev.groupBy(to_date(col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("active_users"))
      activePerDay.join(newPerDay, Seq("day"), "left")
        .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
        .withColumn("cumulative_users",
          sum(col("new_users")).over(
            Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("day")
    },

    // OHLC-style resample: per (hour, type) the chronologically FIRST and
    // LAST values (deterministic (ts, event_id) tiebreak) plus min/max/n —
    // the financial-bar / sensor-rollup shape. One rank window for the
    // open/close endpoints, one grouped pass for the extremes, joined on
    // the tiny bucket key.
    "q41_ohlc" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = table(s, dir, "events")
        .select(date_trunc("hour", col("ts")).as("hour"),
          col("event_type"), col("ts"), col("event_id"), col("value"))
      val w = Window.partitionBy("hour", "event_type")
        .orderBy(asc("ts"), asc("event_id"))
      val wd = Window.partitionBy("hour", "event_type")
        .orderBy(desc("ts"), desc("event_id"))
      val endpoints = ev
        .withColumn("__ra", row_number().over(w))
        .withColumn("__rd", row_number().over(wd))
        .filter(col("__ra") === 1 || col("__rd") === 1)
        .groupBy("hour", "event_type")
        .agg(max(when(col("__ra") === 1, col("value"))).as("open_value"),
          max(when(col("__rd") === 1, col("value"))).as("close_value"))
      val extremes = ev.groupBy("hour", "event_type")
        .agg(min(col("value")).as("low_value"),
          max(col("value")).as("high_value"),
          count(lit(1)).as("n"))
      endpoints.join(extremes, Seq("hour", "event_type"))
        .orderBy("hour", "event_type")
    },

    // Sliding window: 2-hour windows every hour — each event lands in 2.
    "q21_sliding_windows" -> { (s, dir) =>
      table(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("window_start", "event_type")
    },

    // Session windows: 30-minute inactivity gap per user.
    "q22_session_windows" -> { (s, dir) =>
      table(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .select(col("session_window.start").as("session_start"),
          col("user_id"), col("n_events"), col("total_value"))
        .orderBy("user_id", "session_start")
    },

    // As-of join (J10): each error event → latest signup of the same user
    // at or before it, via the union-and-carry plan (one shuffle, linear).
    "q23_asof_join" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      graft.operators.TemporalJoins.asOfJoin(
          left = ev.filter(col("event_type") === "error")
            .select("event_id", "user_id", "ts"),
          right = ev.filter(col("event_type") === "signup"),
          keyCol = "user_id", tsCol = "ts",
          rightPayload = Seq("ts"))
        .withColumnRenamed("asof_ts", "signup_ts")
        .orderBy("event_id")
    },

    // Bounded range join (J10): same-user event pairs within 120 seconds,
    // bucketized to an equi-join (no nested-loop).
    "q24_range_join" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      graft.operators.TemporalJoins.rangeJoin(
          ev, ev, keyCol = "user_id", tsCol = "ts", idCol = "event_id",
          widthSec = 120L)
        .filter(col("left_id") < col("right_id"))
        .select("user_id", "left_id", "right_id")
        .orderBy("user_id", "left_id", "right_id")
    },

    // Ordered funnel conversion view→click→purchase: a stage counts only
    // when a strictly-earlier event passed the previous stage. Two
    // stacked running-min windows over ONE (user_id, ts) sort — no
    // self-joins, no per-stage corpus passes; at scale this is a single
    // shuffle on user_id however long the funnel gets (each extra stage
    // adds a window expression, not a join).
    "q33_funnel" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = table(s, dir, "events")
        .withColumn("first_view",
          min(when(col("event_type") === "view", col("ts"))).over(w))
      val qualClick = col("event_type") === "click" &&
        col("first_view") < col("ts")
      val ev2 = ev.withColumn("first_qclick",
          min(when(qualClick, col("ts"))).over(w))
      val qualPurchase = col("event_type") === "purchase" &&
        col("first_qclick") < col("ts")
      ev2.agg(
        count_distinct(when(col("event_type") === "view", col("user_id")))
          .as("u_view"),
        count_distinct(when(qualClick, col("user_id"))).as("u_click"),
        count_distinct(when(qualPurchase, col("user_id"))).as("u_purchase"))
    },

    // Markov event-type transition matrix: per user, each event's type
    // paired with the NEXT event's type (lead over one (user_id, ts)
    // sort), then global bigram counts and row-normalized transition
    // probabilities — the sequence-model prior (next-event prediction,
    // anomalous-path scoring) every clickstream pipeline derives. One
    // shuffle on user_id; the probability window runs on the
    // |types|²-row count matrix, never on the events.
    "q43_transitions" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val bigrams = table(s, dir, "events")
        .select(col("user_id"), col("event_type").as("cur_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .filter(col("next_type").isNotNull)
        .groupBy("cur_type", "next_type")
        .agg(count(lit(1)).as("n"))
      bigrams
        .withColumn("p", round(
          col("n").cast("double") /
            sum(col("n")).over(Window.partitionBy("cur_type")).cast("double"),
          6))
        .orderBy("cur_type", "next_type")
    },

    // Top event-type paths (sequential pattern mining, order-3): each
    // user's consecutive type trigrams via two stacked LEADs on ONE
    // (user_id, ts) sort, then global counts and the top-20 paths with
    // a full lexicographic tiebreak. The "what do users actually do"
    // view a funnel is then designed from; one shuffle on user_id, the
    // rank window runs on ≤|types|³ rows.
    "q46_event_paths" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tri = table(s, dir, "events")
        .select(col("user_id"), col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e3").isNotNull)
        .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n"))
      tri
        .withColumn("rnk", row_number().over(
          Window.orderBy(desc("n"), asc("e1"), asc("e2"), asc("e3"))))
        .filter(col("rnk") <= 20)
        .orderBy("rnk")
    },

    // Rolling z-score anomaly detection: each event scored against the
    // TRAILING 24 same-type events (current row excluded — the forecast
    // regime: "is this value surprising given recent history?"), flag
    // |z| > 3. The profile_moments integer-units discipline makes it
    // hash-checkable: value is exact at 2 dp, so v100 = round(value·100)
    // is a BIGINT, the windowed power sums are EXACT integers (< 2⁵³,
    // so every later double op is correctly rounded from identical
    // inputs in both engines), and z's op sequence is shared textually
    // with the oracle. One window sort per event type — single shuffle,
    // however long the history gets.
    "q44_anomaly" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
      val wt = w.rowsBetween(-24, -1)
      table(s, dir, "events")
        .withColumn("v100", round(col("value") * lit(100), 0).cast("long"))
        .withColumn("rn", row_number().over(w))
        .withColumn("s1", sum(col("v100")).over(wt))
        .withColumn("s2", sum(col("v100") * col("v100")).over(wt))
        .filter(col("rn") > 24) // full 24-event history only
        .withColumn("sd100",
          sqrt((lit(24.0) * col("s2") - col("s1") * col("s1")) / lit(576.0)))
        .withColumn("z", when(col("sd100") === 0.0, lit(0.0))
          .otherwise((col("v100") - col("s1") / lit(24.0)) / col("sd100")))
        .filter(abs(col("z")) > 3.0)
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("z"), 6).as("z"))
        .orderBy("event_id")
    },

    // Bounded EWMA (α = 1/2 over the last 8 events per user) — the
    // classic time-series ML feature. Weights 128..1 are powers of two,
    // so value·w is an EXACT binary scaling of the stored double; each
    // term is then viewed as an exact DECIMAL(18,6) and summed order-
    // independently, making the feature bit-replayable in the oracle.
    // One window sort per user — same single-shuffle shape as q33.
    "q34_ewma" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val lags = (0 to 7).map { k =>
        val wt = 128 >> k
        val v = if (k == 0) col("value") else lag(col("value"), k).over(w)
        (coalesce(dec(v * lit(wt)), lit(0).cast(DecimalType(18, 6))),
          when(v.isNotNull, lit(wt)).otherwise(lit(0)))
      }
      val num = lags.map(_._1).reduce(_ + _)
      val den = lags.map(_._2).reduce(_ + _)
      table(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          round(num.cast("double") / den, 6).as("ewma"))
        .orderBy("event_id")
    },

    // Autocorrelation of the hourly event-count series at lags 1–6 — the
    // seasonality probe (a daily cycle shows as a lag-24 ridge, bursts as
    // fast decay) that sizes forecasting windows. All Pearson inputs are
    // EXACT integer sums over the 720-row hourly series (counts < 2⁷,
    // sums ≪ 2⁵³), and the r formula's double op sequence is shared
    // textually with the oracle — the q44 discipline at series level.
    // Scale shape: one grouped pass over the facts; everything after runs
    // on the hours-sized series (self-join on t+lag), never the events.
    "q47_autocorr" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val hourly = table(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("c"))
      val ser = hourly
        .withColumn("t", row_number().over(Window.orderBy("hr")))
        .select("t", "c")
      val lagged = ser.select(col("t"), col("c").as("x"),
          explode(array((1 to 6).map(lit): _*)).as("lag"))
        .join(ser.select(col("t").as("t2"), col("c").as("y")),
          col("t2") === col("t") + col("lag"))
      lagged.groupBy("lag").agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sx2"),
          sum(col("y") * col("y")).as("sy2"))
        .withColumn("__num", (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double"))
        .withColumn("__den", sqrt(
          (col("n") * col("sx2") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("sy2") - col("sy") * col("sy")).cast("double")))
        .select(col("lag"), col("n"),
          when(col("__den") === 0.0, lit(0.0))
            .otherwise(round(col("__num") / col("__den"), 6)).as("acf"))
        .orderBy("lag")
    },

    // Holt double exponential smoothing (Holt 1957) of the hourly count
    // series, α = β = ½: level + trend state per hour plus the one-step
    // forecast — the classic capacity-planning smoother. The recurrence
    // is inherently sequential, but on the AGGREGATED series: the facts
    // collapse to calendar-hours rows first (720 here, 8 760/year — the
    // kCenterCoreset pattern: driver state bounded by a constant axis,
    // never the corpus). Halving is exact in binary and both engines run
    // the textually-identical double op sequence from identical integer
    // inputs, so all 720 steps replay bit-for-bit in the recursive CTE.
    "q48_holt" -> { (s, dir) =>
      val spark = s
      import spark.implicits._
      holtSeries(s, dir).toDF("t", "c", "__l", "__b", "__f")
        .select(col("t"), col("c"),
          round(col("__l"), 6).as("level"), round(col("__b"), 6).as("trend"),
          round(col("__f"), 6).as("forecast"))
        .orderBy("t")
    },

    // Time-weighted average per sensor/type (the irregular-sampling mean:
    // each reading holds until the next one, so it weighs by its µs
    // holding interval — what naive AVG gets wrong on bursty series).
    // q44's quantization discipline: v100 = round(value·100) is the
    // defined integer signal, interval products sum in DECIMAL(38,0)
    // (exact at any corpus size — Σ v100·Δt overflows BIGINT at ~10⁶
    // rows), one shared-text double division at the end. One window sort
    // per type.
    "q50_twa" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
      table(s, dir, "events")
        .withColumn("v100", round(col("value") * lit(100), 0).cast("long"))
        .withColumn("dt",
          lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
        .filter(col("dt").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dt")).as("total_us"),
          sum((col("v100") * col("dt")).cast(DecimalType(38, 0))).as("__num"))
        .select(col("event_type"), col("n_intervals"), col("total_us"),
          round(col("__num").cast("double") / col("total_us").cast("double")
            / lit(100.0), 6).as("twa"))
        .orderBy("event_type")
    },

    // Seasonal decomposition (hour-of-day profile): the 24-row seasonal
    // means of the hourly count series plus the exact share of variance
    // the daily cycle explains — the "is there a daily rhythm worth
    // modeling?" check before q48's trend smoother. The integer
    // sufficient-statistics identity n·SSR = nΣc² − Σsₕ² requires a
    // UNIFORM per-hod sample count, so n comes from the data (min=max
    // guard) rather than assuming a 30-day window: an unaligned window
    // yields NULL var_explained instead of a silently-wrong ratio
    // (round-8 advice). N·SST = NΣc² − S² needs no such guard. The
    // fixture's 720-hour window gives n = 30 everywhere, so the guard is
    // pure insurance there. Facts aggregate once.
    "q56_seasonality" -> { (s, dir) =>
      val hourly = table(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("c"))
        .select(hour(col("hr")).as("hod"), col("c"))
      val perHod = hourly.groupBy("hod").agg(
        count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("s2"))
      val tot = perHod.agg(sum(col("n")).as("__N"), sum(col("s")).as("__S"),
        sum(col("s2")).as("__C2"),
        sum(col("s") * col("s")).as("__SH2"),
        min(col("n")).as("__nlo"), max(col("n")).as("__nhi"))
      perHod.crossJoin(broadcast(tot))
        .select(col("hod"), col("n"), col("s").as("sum_c"),
          round(col("s") / col("n"), 6).as("seasonal_mean"),
          when(col("__nlo") === col("__nhi"), round(lit(1.0) -
            (col("__N") * (col("__nlo") * col("__C2") - col("__SH2")))
              .cast("double") /
            (col("__nlo").cast("double") *
              (col("__N") * col("__C2") - col("__S") * col("__S"))),
            6)).as("var_explained"))
        .orderBy("hod")
    },

    // Two-proportion z-test (A/B primitive): click→purchase-within-1h
    // conversion compared between the even/odd user cohorts, with the
    // pooled-variance z statistic — the experiment readout every growth
    // pipeline runs. All four counts are exact integers off ONE
    // carry-forward window pass; p1/p2/z are shared-text doubles,
    // FLOOR-quantized.
    "eval_ab_test" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val delta = unix_micros(col("ts")) - unix_micros(col("__click_ts"))
      val converted = col("event_type") === "purchase" &&
        col("__click_ts").isNotNull && delta <= 3600L * 1000000
      val stats = table(s, dir, "events")
        .withColumn("__cohort",
          when(col("user_id") % 2 === 0, "A").otherwise("B"))
        .withColumn("__click_ts",
          last(when(col("event_type") === "click", col("ts")),
            ignoreNulls = true).over(w))
        .groupBy("__cohort").agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("clicks"),
          sum(when(converted, 1L).otherwise(0L)).as("convs"))
      def f6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1000000)) / 1000000
      val one = stats.agg(
        max(when(col("__cohort") === "A", col("clicks"))).as("n1"),
        max(when(col("__cohort") === "A", col("convs"))).as("x1"),
        max(when(col("__cohort") === "B", col("clicks"))).as("n2"),
        max(when(col("__cohort") === "B", col("convs"))).as("x2"))
      val p1 = col("x1").cast("double") / col("n1")
      val p2 = col("x2").cast("double") / col("n2")
      val pp = (col("x1") + col("x2")).cast("double") /
        (col("n1") + col("n2"))
      val z = (p1 - p2) / sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n1") + lit(1.0) / col("n2")))
      one.select(col("n1"), col("x1"), col("n2"), col("x2"),
        f6(p1).as("p1"), f6(p2).as("p2"), f6(z).as("z"),
        (abs(z) > 1.959964).as("significant_95"))
    },

    // Forecast-quality eval: MAE/RMSE of q48's one-step-ahead Holt
    // forecasts against the realized next-hour counts — the backtest
    // that closes the forecasting loop (communities got modularity,
    // classifiers got P/R/F1, forecasts get this). Same driver fold as
    // q48 (calendar-bounded series); per-step |e| and e² are
    // 6dp-rounded then DECIMAL-summed, so the metrics are exact.
    "eval_forecast" -> { (s, dir) =>
      def f6(x: Double): Double = math.floor(x * 1000000) / 1000000
      // the forecast scored at step t is the PREVIOUS step's one-step
      // forecast (its level + trend) — the shared holtSeries fold
      var sae = BigDecimal(0); var sse = BigDecimal(0); var n = 0L
      holtSeries(s, dir).sliding(2).foreach {
        case Seq((_, _, _, _, fPrev), (_, c, _, _, _)) =>
          val e = c - fPrev
          sae += BigDecimal(f6(math.abs(e)))
          sse += BigDecimal(f6(e * e))
          n += 1
        case _ => () // series shorter than 2: nothing to backtest
      }
      val spark2 = s
      import spark2.implicits._
      // FLOOR-quantized terms and metrics: no half-boundary ROUND risk
      Seq((n,
          f6(sae.toDouble / n),
          f6(math.sqrt(sse.toDouble / n))))
        .toDF("n_forecasts", "mae", "rmse")
    },

    // Kaplan–Meier churn survival: users "churn" at their last-activity
    // day; users still active in the final 3 days are right-CENSORED —
    // the estimator that answers "what fraction survives past day t"
    // without pretending censored users churned. The survival product
    // S(t) = Π (1 − dᵢ/nᵢ) folds on the DRIVER over the calendar-bounded
    // (day, d, n) table in day order (the q48_holt pattern: bit-exact
    // sequential doubles, no ln/exp libm divergence), replayed by a
    // recursive CTE. Facts are scanned once for the per-user rollup.
    "q54_survival" -> { (s, dir) =>
      val horizonExpr = datediff(to_date(max(col("ts"))),
        to_date(lit("2024-01-01")))
      // the PURCHASE timeline: every user has ambient events daily (the
      // all-events estimator would censor everyone), but last purchases
      // spread over ~12 days — real churn structure
      val ev = table(s, dir, "events").filter(col("event_type") === "purchase")
      val horizon = ev.agg(horizonExpr).head.getInt(0)
      val users = ev.groupBy("user_id")
        .agg(datediff(to_date(max(col("ts"))), to_date(lit("2024-01-01")))
          .as("last_day"))
        .withColumn("censored", col("last_day") >= horizon - 2)
      val byDay = users.filter(!col("censored"))
        .groupBy(col("last_day").as("day"))
        .agg(count(lit(1)).as("n_churned"))
        .orderBy("day")
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      // at-risk at day t: everyone not yet churned (censored users stay
      // at risk to the horizon, which is ≥ every churn day here)
      var atRisk = users.count()
      var sv = 1.0
      val rows = byDay.map { case (day, d) =>
        sv = sv * (1.0 - d.toDouble / atRisk)
        // FLOOR-quantize (not round): both engines floor the identical
        // double, so a .xxxxxx5 boundary can never split them
        val out = (day, atRisk, d, math.floor(sv * 1000000) / 1000000)
        atRisk -= d
        out
      }
      val spark2 = s
      import spark2.implicits._
      rows.toSeq.toDF("day", "n_risk", "n_churned", "survival")
        .orderBy("day")
    },

    // Last-touch attribution: each purchase credits the user's most
    // recent PRECEDING click (carry-forward window with IGNORE NULLS —
    // the single-pass form of the as-of join q23 does pairwise), bucketed
    // by recency. One window sort per user over the event stream, then a
    // 3-row aggregate — the conversion-attribution rollup marketing
    // pipelines run at billions of events.
    "q49_attribution" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      // exact integer µs delta — the fixture has sub-second timestamps,
      // where a seconds cast would floor differently than DATE_DIFF
      val delta = unix_micros(col("ts")) - unix_micros(col("__click_ts"))
      table(s, dir, "events")
        .withColumn("__click_ts",
          last(when(col("event_type") === "click", col("ts")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("bucket",
          when(col("__click_ts").isNull, "organic")
            .when(delta <= 3600L * 1000000, "click_1h")
            .when(delta <= 86400L * 1000000, "click_24h")
            .otherwise("organic"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("bucket")
    },
  )

  /** Shared window clause of the q33/q34 oracles. */
  private val userWin =
    "PARTITION BY user_id ORDER BY ts, event_id"

  val oracle: Map[String, String] = Map(
    "q33_funnel" ->
      s"""WITH e AS (
           SELECT user_id, ts, event_id, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END) OVER
               ($userWin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS first_view
           FROM events),
         e2 AS (
           SELECT *,
             MIN(CASE WHEN event_type = 'click' AND first_view < ts THEN ts END)
               OVER ($userWin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS first_qclick
           FROM e)
         SELECT
           COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS u_view,
           COUNT(DISTINCT CASE WHEN event_type = 'click' AND first_view < ts
                 THEN user_id END) AS u_click,
           COUNT(DISTINCT CASE WHEN event_type = 'purchase' AND first_qclick < ts
                 THEN user_id END) AS u_purchase
         FROM e2""",

    "q34_ewma" -> {
      def v(k: Int) = if (k == 0) "value" else s"LAG(value, $k) OVER ($userWin)"
      val num = (0 to 7).map { k =>
        s"COALESCE(CAST(${v(k)} * ${128 >> k} AS DECIMAL(18,6)), 0)"
      }.mkString(" + ")
      val den = (0 to 7).map { k =>
        s"CASE WHEN ${v(k)} IS NOT NULL THEN ${128 >> k} ELSE 0 END"
      }.mkString(" + ")
      s"""SELECT event_id, user_id,
          ROUND(CAST(($num) AS DOUBLE) / ($den), 6) AS ewma
          FROM events ORDER BY event_id"""
    },

    "q46_event_paths" ->
      """WITH seq AS (
           SELECT event_type AS e1,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS e3
           FROM events),
         c AS (SELECT e1, e2, e3, COUNT(*) AS n FROM seq
               WHERE e3 IS NOT NULL GROUP BY e1, e2, e3)
         SELECT e1, e2, e3, n, CAST(rn AS INTEGER) AS rnk FROM (
           SELECT e1, e2, e3, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, e1, e2, e3) AS rn
           FROM c)
         WHERE rn <= 20 ORDER BY rnk""",

    "q44_anomaly" ->
      """WITH v AS (
           SELECT event_id, event_type, value, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS v100
           FROM events),
         s AS (
           SELECT event_id, event_type, value, v100,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY ts, event_id) AS rn,
             SUM(v100) OVER (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS s1,
             SUM(v100 * v100) OVER (PARTITION BY event_type
               ORDER BY ts, event_id
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS s2
           FROM v),
         z AS (
           SELECT event_id, event_type, value,
             CASE WHEN SQRT((24.0 * s2 - s1 * s1) / 576.0) = 0.0 THEN 0.0
               ELSE (v100 - s1 / 24.0) / SQRT((24.0 * s2 - s1 * s1) / 576.0)
             END AS z
           FROM s WHERE rn > 24)
         SELECT event_id, event_type, value, ROUND(z, 6) AS z
         FROM z WHERE ABS(z) > 3.0 ORDER BY event_id""",

    "q47_autocorr" ->
      """WITH h AS (SELECT DATE_TRUNC('hour', ts) AS hr, COUNT(*) AS c
                    FROM events GROUP BY 1),
         s AS (SELECT ROW_NUMBER() OVER (ORDER BY hr) AS t, c FROM h),
         j AS (SELECT g.lag, a.c AS x, b.c AS y
               FROM s a JOIN generate_series(1, 6) g(lag) ON TRUE
               JOIN s b ON b.t = a.t + g.lag),
         agg AS (SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sx2, SUM(y * y) AS sy2
                 FROM j GROUP BY lag)
         SELECT CAST(lag AS INTEGER) AS lag, n,
           CASE WHEN SQRT(CAST(n * sx2 - sx * sx AS DOUBLE) *
                          CAST(n * sy2 - sy * sy AS DOUBLE)) = 0.0 THEN 0.0
             ELSE ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
               SQRT(CAST(n * sx2 - sx * sx AS DOUBLE) *
                    CAST(n * sy2 - sy * sy AS DOUBLE)), 6)
           END AS acf
         FROM agg ORDER BY lag""",

    // Holt recurrence unrolled by the recursive CTE — the level update
    // expression is repeated textually inside the trend update so both
    // engines execute the identical double op sequence.
    // s MUST be MATERIALIZED: the recursion joins s every step, and
    // default inlining re-aggregated all of events per step
    // (7.7 s -> 0.4 s at sf0.1, result identical; same fix below).
    "q48_holt" ->
      """WITH RECURSIVE
         h AS (SELECT DATE_TRUNC('hour', ts) AS hr, COUNT(*) AS c
               FROM events GROUP BY 1),
         s AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY hr) AS t, c FROM h),
         rec(t, c, l, b) AS (
           SELECT t, c, CAST(c AS DOUBLE), CAST(0 AS DOUBLE)
           FROM s WHERE t = 1
           UNION ALL
           SELECT s.t, s.c,
             0.5 * s.c + 0.5 * (rec.l + rec.b),
             0.5 * ((0.5 * s.c + 0.5 * (rec.l + rec.b)) - rec.l)
               + 0.5 * rec.b
           FROM rec JOIN s ON s.t = rec.t + 1)
         SELECT CAST(t AS INTEGER) AS t, c, ROUND(l, 6) AS level,
           ROUND(b, 6) AS trend, ROUND(l + b, 6) AS forecast
         FROM rec ORDER BY t""",

    "q50_twa" ->
      """WITH v AS (
           SELECT event_type, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS v100,
             LEAD(epoch_us(ts)) OVER (PARTITION BY event_type
               ORDER BY ts, event_id) - epoch_us(ts) AS dt
           FROM events)
         SELECT event_type, COUNT(*) AS n_intervals,
           CAST(SUM(dt) AS BIGINT) AS total_us,
           ROUND(CAST(SUM(CAST(v100 * dt AS DECIMAL(38,0))) AS DOUBLE)
             / CAST(CAST(SUM(dt) AS BIGINT) AS DOUBLE) / 100.0, 6) AS twa
         FROM v WHERE dt IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",

    "q56_seasonality" ->
      """WITH h AS (SELECT DATE_TRUNC('hour', ts) AS hr, COUNT(*) AS c
                    FROM events GROUP BY 1),
         hh AS (SELECT EXTRACT(hour FROM hr) AS hod, c FROM h),
         per AS (SELECT hod, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS s2
                 FROM hh GROUP BY hod),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                   CAST(SUM(s) AS BIGINT) AS ss,
                   CAST(SUM(s2) AS BIGINT) AS c2,
                   CAST(SUM(s * s) AS BIGINT) AS sh2,
                   CAST(MIN(n) AS BIGINT) AS nlo,
                   CAST(MAX(n) AS BIGINT) AS nhi
                 FROM per)
         SELECT CAST(per.hod AS INTEGER) AS hod, per.n,
           CAST(per.s AS BIGINT) AS sum_c,
           ROUND(CAST(per.s AS BIGINT) / per.n, 6) AS seasonal_mean,
           CASE WHEN tot.nlo = tot.nhi THEN ROUND(1.0 -
             CAST(tot.nn * (tot.nlo * tot.c2 - tot.sh2) AS DOUBLE)
               / (CAST(tot.nlo AS DOUBLE) *
                  (tot.nn * tot.c2 - tot.ss * tot.ss)), 6)
           END AS var_explained
         FROM per CROSS JOIN tot ORDER BY hod""",

    "eval_ab_test" ->
      """WITH e AS (
           SELECT user_id, event_type, ts,
             CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS cohort,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END
               IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts
           FROM events),
         st AS (SELECT cohort,
             COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
             COUNT(*) FILTER (WHERE event_type = 'purchase'
               AND click_ts IS NOT NULL
               AND epoch_us(ts) - epoch_us(click_ts) <= 3600000000) AS convs
           FROM e GROUP BY cohort),
         one AS (SELECT
             MAX(CASE WHEN cohort = 'A' THEN clicks END) AS n1,
             MAX(CASE WHEN cohort = 'A' THEN convs END) AS x1,
             MAX(CASE WHEN cohort = 'B' THEN clicks END) AS n2,
             MAX(CASE WHEN cohort = 'B' THEN convs END) AS x2
           FROM st)
         SELECT n1, x1, n2, x2,
           FLOOR(CAST(x1 AS DOUBLE) / n1 * 1000000) / 1000000 AS p1,
           FLOOR(CAST(x2 AS DOUBLE) / n2 * 1000000) / 1000000 AS p2,
           FLOOR((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
             / SQRT(CAST(x1 + x2 AS DOUBLE) / (n1 + n2)
               * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
               * (1.0 / n1 + 1.0 / n2)) * 1000000) / 1000000 AS z,
           ABS((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
             / SQRT(CAST(x1 + x2 AS DOUBLE) / (n1 + n2)
               * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
               * (1.0 / n1 + 1.0 / n2))) > 1.959964 AS significant_95
         FROM one""",

    // The q48 recursion re-run, each state row joined to the NEXT hour's
    // actual: e = c_{t+1} − (l_t + b_t); rounded |e| / e² DECIMAL-summed.
    "eval_forecast" ->
      """WITH RECURSIVE
         h AS (SELECT DATE_TRUNC('hour', ts) AS hr, COUNT(*) AS c
               FROM events GROUP BY 1),
         s AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY hr) AS t, c FROM h),
         rec(t, c, l, b) AS (
           SELECT t, c, CAST(c AS DOUBLE), CAST(0 AS DOUBLE)
           FROM s WHERE t = 1
           UNION ALL
           SELECT s.t, s.c,
             0.5 * s.c + 0.5 * (rec.l + rec.b),
             0.5 * ((0.5 * s.c + 0.5 * (rec.l + rec.b)) - rec.l)
               + 0.5 * rec.b
           FROM rec JOIN s ON s.t = rec.t + 1),
         e AS (SELECT
             FLOOR(ABS(s.c - (rec.l + rec.b)) * 1000000) / 1000000 AS ae,
             FLOOR((s.c - (rec.l + rec.b)) * (s.c - (rec.l + rec.b))
               * 1000000) / 1000000 AS se
           FROM rec JOIN s ON s.t = rec.t + 1)
         SELECT COUNT(*) AS n_forecasts,
           FLOOR(CAST(SUM(CAST(ae AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*) * 1000000) / 1000000 AS mae,
           FLOOR(SQRT(CAST(SUM(CAST(se AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*)) * 1000000) / 1000000 AS rmse
         FROM e""",

    // KM replayed: per-day churn counts, at-risk via the shifted running
    // sum, the survival product unrolled by the recursive CTE in day
    // order — identical double multiply chain, FLOOR-quantized output.
    "q54_survival" ->
      """WITH RECURSIVE
         p AS (SELECT user_id, ts FROM events
               WHERE event_type = 'purchase'),
         h AS (SELECT DATEDIFF('day', DATE '2024-01-01',
                 CAST(MAX(ts) AS DATE)) AS horizon FROM p),
         u AS (SELECT user_id, DATEDIFF('day', DATE '2024-01-01',
                 CAST(MAX(ts) AS DATE)) AS last_day
               FROM p GROUP BY user_id),
         uc AS (SELECT u.last_day,
                  u.last_day >= h.horizon - 2 AS censored
                FROM u CROSS JOIN h),
         d AS (SELECT last_day AS day, COUNT(*) AS n_churned
               FROM uc WHERE NOT censored GROUP BY last_day),
         ds AS (SELECT day, n_churned,
                  CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn,
                  (SELECT COUNT(*) FROM uc)
                    - COALESCE(SUM(n_churned) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS n_risk
                FROM d),
         rec(rn, day, n_risk, n_churned, sv) AS (
           SELECT rn, day, n_risk, n_churned,
             1.0 * (1.0 - CAST(n_churned AS DOUBLE) / n_risk)
           FROM ds WHERE rn = 1
           UNION ALL
           SELECT ds.rn, ds.day, ds.n_risk, ds.n_churned,
             rec.sv * (1.0 - CAST(ds.n_churned AS DOUBLE) / ds.n_risk)
           FROM rec JOIN ds ON ds.rn = rec.rn + 1)
         SELECT CAST(day AS INTEGER) AS day, CAST(n_risk AS BIGINT) AS n_risk,
           n_churned, FLOOR(sv * 1000000) / 1000000 AS survival
         FROM rec ORDER BY day""",

    "q49_attribution" ->
      """WITH e AS (
           SELECT user_id, ts, event_type,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END
               IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts
           FROM events),
         p AS (SELECT user_id,
             CASE WHEN click_ts IS NULL THEN 'organic'
               WHEN epoch_us(ts) - epoch_us(click_ts) <= 3600000000
                 THEN 'click_1h'
               WHEN epoch_us(ts) - epoch_us(click_ts) <= 86400000000
                 THEN 'click_24h'
               ELSE 'organic' END AS bucket
           FROM e WHERE event_type = 'purchase')
         SELECT bucket, COUNT(*) AS n_purchases,
           COUNT(DISTINCT user_id) AS n_users
         FROM p GROUP BY bucket ORDER BY bucket""",

    "q43_transitions" ->
      """WITH seq AS (
           SELECT event_type AS cur_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         c AS (SELECT cur_type, next_type, COUNT(*) AS n
               FROM seq WHERE next_type IS NOT NULL
               GROUP BY cur_type, next_type)
         SELECT cur_type, next_type, n,
           ROUND(CAST(n AS DOUBLE) /
             CAST(SUM(n) OVER (PARTITION BY cur_type) AS DOUBLE), 6) AS p
         FROM c ORDER BY cur_type, next_type""",

    "q41_ohlc" ->
      """WITH e AS (SELECT DATE_TRUNC('hour', ts) AS hour, event_type,
             ts, event_id, value FROM events),
         rk AS (SELECT hour, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY hour, event_type
               ORDER BY ts, event_id) AS ra,
             ROW_NUMBER() OVER (PARTITION BY hour, event_type
               ORDER BY ts DESC, event_id DESC) AS rd
           FROM e),
         ep AS (SELECT hour, event_type,
             MAX(CASE WHEN ra = 1 THEN value END) AS open_value,
             MAX(CASE WHEN rd = 1 THEN value END) AS close_value
           FROM rk WHERE ra = 1 OR rd = 1 GROUP BY hour, event_type),
         ex AS (SELECT hour, event_type, MIN(value) AS low_value,
             MAX(value) AS high_value, COUNT(*) AS n
           FROM e GROUP BY hour, event_type)
         SELECT ep.hour, ep.event_type, ep.open_value, ep.close_value,
           ex.low_value, ex.high_value, ex.n
         FROM ep JOIN ex USING (hour, event_type)
         ORDER BY hour, event_type""",

    "q40_cumulative_users" ->
      """WITH fs AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS day
                     FROM events GROUP BY user_id),
          nu AS (SELECT day, COUNT(*) AS new_users FROM fs GROUP BY day),
          au AS (SELECT CAST(ts AS DATE) AS day,
                   COUNT(DISTINCT user_id) AS active_users
                 FROM events GROUP BY 1)
          SELECT au.day, au.active_users,
            COALESCE(nu.new_users, 0) AS new_users,
            CAST(SUM(COALESCE(nu.new_users, 0)) OVER (ORDER BY au.day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS cumulative_users
          FROM au LEFT JOIN nu USING (day) ORDER BY day""",

    "q39_gapfill" ->
      s"""WITH h AS (
            SELECT DATE_TRUNC('hour', ts) AS hour, event_type,
              COUNT(*) AS n, ${sqlDsum("value")} AS total_value
            FROM events GROUP BY 1, 2),
          g AS (SELECT t.ts AS hour FROM generate_series(
              TIMESTAMP '2024-01-01 00:00:00',
              TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR) t(ts)),
          ty AS (SELECT DISTINCT event_type FROM events)
          SELECT g.hour, ty.event_type,
            COALESCE(h.n, 0) AS n, COALESCE(h.total_value, 0.0) AS total_value
          FROM g CROSS JOIN ty
          LEFT JOIN h ON h.hour = g.hour AND h.event_type = ty.event_type
          ORDER BY 1, 2""",

    "q23_asof_join" ->
      """SELECT e.event_id, e.user_id, e.ts, s.ts AS signup_ts
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
         ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
           ON e.user_id = s.user_id AND e.ts >= s.ts
         ORDER BY event_id""",

    "q24_range_join" ->
      """SELECT a.user_id, a.event_id AS left_id, b.event_id AS right_id
         FROM events a JOIN events b
           ON a.user_id = b.user_id AND a.event_id < b.event_id
          AND ABS(DATE_DIFF('second', b.ts, a.ts)) <= 120
         ORDER BY a.user_id, left_id, right_id""",

    "q21_sliding_windows" ->
      s"""SELECT window_start, event_type, COUNT(*) AS n,
          ${sqlDsum("value")} AS total_value
          FROM (
            SELECT TIME_BUCKET(INTERVAL 1 HOUR, ts) AS window_start, event_type, value FROM events
            UNION ALL
            SELECT TIME_BUCKET(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR AS window_start, event_type, value FROM events)
          GROUP BY window_start, event_type
          ORDER BY window_start, event_type""",

    "q22_session_windows" ->
      s"""SELECT MIN(ts) AS session_start, user_id, COUNT(*) AS n_events,
          ${sqlDsum("value")} AS total_value
          FROM (
            SELECT user_id, ts, value,
              SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM (
              SELECT user_id, ts, value,
                CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS is_new
              FROM events))
          GROUP BY user_id, session_id
          ORDER BY user_id, session_start"""
  )
}

package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

class RelationalOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin equals the plain join for inner and left joins") {
    val left = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e"))
      .toDF("k", "lv")
    val right = Seq((1, "X"), (2, "Y"), (4, "Z")).toDF("k", "rv")
    for (jt <- Seq("inner", "left")) {
      val expected = left.join(right, Seq("k"), jt)
        .collect().map(_.toSeq).toSet
      val got = RelationalOps.saltedJoin(left, right, Seq("k"), buckets = 4, jt)
        .collect().map(_.toSeq).toSet
      assert(got == expected, s"salted $jt join diverges")
    }
  }

  test("saltedJoin rejects full_outer (replication would duplicate unmatched rows)") {
    val df = Seq((1, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      RelationalOps.saltedJoin(df, df, Seq("k"), 4, "full_outer")
    }
  }

  test("asofJoin picks the latest right row at-or-before each left ts") {
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 250L), (3L, 10L, 300L),
      (4L, 20L, 150L), // user with no prior state at first event
      (5L, 30L, 500L)  // user with no right rows at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 100L, "s@100"), // equal ts -> inclusive match
      (10L, 200L, "s@200"),
      (10L, 301L, "s@301"), // after every left row -> never matched
      (20L, 160L, "s@160")
    ).toDF("user_id", "ts", "state")
    val got = RelationalOps
      .asofJoin(left, right, Seq("user_id"), "ts", "ts", Seq("state"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(got == Map(
      1L -> Some("s@100"), 2L -> Some("s@200"), 3L -> Some("s@200"),
      4L -> None, 5L -> None))
  }

  test("asofJoin matches a brute-force scan on random data") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(1000).toLong))
    val right = (1 to 100).map { i =>
      ((rnd.nextInt(5) + 1).toLong, rnd.nextInt(1000).toLong, i.toLong)
    }.distinct.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
    val expected = left.map { case (id, u, ts) =>
      val cands = right.filter(r => r._1 == u && r._2 <= ts)
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(r => (r._2, r._3))._3))
    }.toMap
    val got = RelationalOps.asofJoin(
      left.toDF("event_id", "user_id", "ts"),
      right.toDF("user_id", "ts", "payload"),
      Seq("user_id"), "ts", "ts", Seq("payload"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("rangeJoin equals the brute-force interval join, incl. bucket-straddling intervals") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 200).map(i =>
      (i.toLong, (rnd.nextInt(4) + 1).toLong,
        java.sql.Timestamp.valueOf(s"2024-01-01 0${rnd.nextInt(10)}:0${rnd.nextInt(6)}:0${rnd.nextInt(10)}")))
    val right = (1 to 40).map { i =>
      val s = rnd.nextInt(9 * 3600)
      val e = s + rnd.nextInt(2 * 3600) // up to 2h, straddles 30-min buckets
      (i.toLong, (rnd.nextInt(4) + 1).toLong,
        new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + s * 1000L),
        new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + e * 1000L))
    }
    val expected = (for {
      (id, u, ts) <- left
      (rid, ru, rs, re) <- right
      if ru == u && !ts.before(rs) && !ts.after(re)
    } yield (id, rid)).toSet
    val got = RelationalOps.rangeJoin(
      left.toDF("event_id", "user_id", "ts"),
      right.toDF("win_id", "user_id", "w_start", "w_end"),
      Seq("user_id"), "ts", "w_start", "w_end", bucketWidthSeconds = 1800)
      .select("event_id", "win_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("rangeJoin left keeps unmatched left rows exactly once with null right side") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 1L, ts("2024-01-01 00:10:00")), // inside w10
      (2L, 1L, ts("2024-01-01 05:00:00")), // matches nothing
      (3L, 2L, ts("2024-01-01 00:10:00"))  // user without windows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00")))
      .toDF("win_id", "user_id", "w_start", "w_end")
    val got = RelationalOps.rangeJoin(left, right, Seq("user_id"),
        "ts", "w_start", "w_end", bucketWidthSeconds = 600, joinType = "left")
      .select("event_id", "win_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq.sorted
    assert(got == Seq(1L -> Some(10L), 2L -> None, 3L -> None))
  }

  test("hashSample is deterministic, key-consistent, and near the requested fraction") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.01")
    val s1 = RelationalOps.hashSample(orders, "o_orderkey", 0.1)
    val n = orders.count().toDouble
    val k = s1.count().toDouble
    assert(math.abs(k / n - 0.1) < 0.02, s"sampled ${k / n}")
    // same keys survive when sampling a differently-partitioned copy
    val s2 = RelationalOps.hashSample(orders.repartition(7), "o_orderkey", 0.1)
    assert(s2.select("o_orderkey").except(s1.select("o_orderkey")).isEmpty)
    assert(s1.select("o_orderkey").except(s2.select("o_orderkey")).isEmpty)
    // edge fractions: 1.0 keeps everything (the naive "%04x" threshold
    // prints 65536 as "10000", which string-sorts below "2***" and
    // silently kept ~1/16), 0.0 keeps nothing
    assert(RelationalOps.hashSample(orders, "o_orderkey", 1.0).count() == n.toLong)
    assert(RelationalOps.hashSample(orders, "o_orderkey", 0.0).isEmpty)
  }

  test("approx_count_distinct stays within 5% of exact on the orders table") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.01")
    val row = orders.agg(
      approx_count_distinct(col("o_custkey"), rsd = 0.01).as("approx"),
      countDistinct(col("o_custkey")).as("exact")).head()
    val (a, e) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx=$a exact=$e")
  }

  test("bloomPrunedJoin: identical to the plain join (fpp a pure cost " +
      "knob), semi form, empty-small short-circuit, blob in the plan") {
    val dir = "/root/testdata/sf0.01"
    val big = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"))
    val small = graft.Tables.orders(spark, dir)
      .where(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    def key(r: org.apache.spark.sql.Row) = r.toString
    val plain = big.join(small, Seq("l_orderkey"))
      .collect().map(key).sorted
    assert(plain.nonEmpty, "fixture must select some orders")
    for (fpp <- Seq(0.01, 0.5)) { // even a sieve-like blob stays exact
      val pruned = RelationalOps.bloomPrunedJoin(big, small, "l_orderkey",
          fpp = fpp)
        .collect().map(key).sorted
      assert(pruned.sameElements(plain), s"bloom join diverged at fpp=$fpp")
    }
    // left_semi: big rows with a match, each exactly once
    val semi = RelationalOps.bloomPrunedJoin(big, small, "l_orderkey",
      joinType = "left_semi")
    val semiExpected = big.join(small.select("l_orderkey"),
      Seq("l_orderkey"), "left_semi")
    assert(semi.collect().map(key).sorted
      .sameElements(semiExpected.collect().map(key).sorted))
    // the pre-filter is really in the plan, below the join
    val p = RelationalOps.bloomPrunedJoin(big, small, "l_orderkey")
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"no bloom pre-filter in plan:\n$p")
    // empty small side: no blob, empty result, joined schema preserved
    val none = RelationalOps.bloomPrunedJoin(big,
      small.where(lit(false)), "l_orderkey")
    assert(none.isEmpty &&
      none.columns.toSeq == Seq("l_orderkey", "l_quantity", "o_totalprice"))
  }

  test("mortonKey interleaves bits exactly (hand cases + differential vs " +
      "a reference implementation across the 16-bit corners)") {
    def ref(a: Int, b: Int): Long = {
      var out = 0L
      for (i <- 0 until 16)
        out |= (((a >> i) & 1).toLong << (2 * i)) |
          (((b >> i) & 1).toLong << (2 * i + 1))
      out
    }
    // corners, bit boundaries, and a pseudo-random walk
    val cases = Seq((0, 0), (1, 0), (0, 1), (3, 5), (65535, 0), (0, 65535),
      (65535, 65535), (256, 255), (32768, 1)) ++
      (0 until 50).map(i => ((i * 12347) % 65536, (i * 54323) % 65536))
    val df = cases.toDF("a", "b")
      .withColumn("m", RelationalOps.mortonKey(col("a"), col("b")))
    val got = df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) == ref(a, b), s"morton($a, $b)")
    }
    // mortonBucket clamps and quantizes
    val bs = Seq(-5.0, 0.0, 50.0, 100.0, 999.0).toDF("x")
      .select(RelationalOps.mortonBucket(col("x"), 0.0, 100.0, 16).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(bs == Seq(0, 0, 8, 15, 15))
  }

  test("sessionize splits on strict gap > gapSeconds, per key") {
    // user 10: 0s, 600s (same session), 2401s (gap 1801 > 1800 -> new),
    //          4201s (gap exactly 1800 -> SAME session, strict >)
    // user 20: one event
    val ev = Seq(
      (1L, 10L, 0L), (2L, 10L, 600L), (3L, 10L, 2401L), (4L, 10L, 4201L),
      (5L, 20L, 50L)
    ).toDF("event_id", "user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val got = RelationalOps
      .sessionize(ev, Seq("user_id"), "ts", 1800L, Seq("ts", "event_id"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_seq"))
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionize matches a sequential reference on random data") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map(i =>
      (i.toLong, (rnd.nextInt(6) + 1).toLong, rnd.nextInt(20000).toLong))
    val ev = rows.toDF("event_id", "user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val expected = rows.groupBy(_._2).flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._1))
      var seq = 0L; var prev = Long.MinValue
      sorted.map { case (id, _, sec) =>
        if (prev == Long.MinValue || sec - prev > 1800L) seq += 1
        prev = sec
        id -> seq
      }
    }.toMap
    val got = RelationalOps
      .sessionize(ev, Seq("user_id"), "ts", 1800L, Seq("ts", "event_id"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_seq"))
      .toMap
    assert(got == expected)
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("scd2Merge: change closes + opens, no-op keeps, insert opens, history passes through") {
    val base = Seq(
      // key 1: one closed version + a current one (history must pass through)
      (1L, "A", ts("2020-01-01 00:00:00"), Option(ts("2020-06-01 00:00:00"))),
      (1L, "B", ts("2020-06-01 00:00:00"), None),
      // key 2: current only, delta restates identical payload -> no-op
      (2L, "C", ts("2020-01-01 00:00:00"), None),
      // key 4: current only, no delta -> untouched
      (4L, "D", ts("2020-01-01 00:00:00"), None)
    ).toDF("k", "v", "valid_from", "valid_to")
    val delta = Seq(
      (1L, "B2", ts("2021-01-01 00:00:00")), // change
      (2L, "C", ts("2021-01-01 00:00:00")),  // no-op restatement
      (3L, "N", ts("2021-01-01 00:00:00"))   // brand-new key
    ).toDF("k", "v", "eff")
    val got = RelationalOps.scd2Merge(base, delta, Seq("k"), "eff")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[java.sql.Timestamp]("valid_from"),
        Option(r.getAs[java.sql.Timestamp]("valid_to")))).toSet
    val e = ts("2021-01-01 00:00:00")
    assert(got == Set(
      (1L, "A", ts("2020-01-01 00:00:00"), Some(ts("2020-06-01 00:00:00"))),
      (1L, "B", ts("2020-06-01 00:00:00"), Some(e)), // closed
      (1L, "B2", e, None),                           // new version
      (2L, "C", ts("2020-01-01 00:00:00"), None),    // no-op kept open
      (4L, "D", ts("2020-01-01 00:00:00"), None),    // untouched
      (3L, "N", e, None)))                           // inserted
  }

  test("gapFillLocf densifies each key's own span and carries values forward") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val daily = Seq(
      (1L, d("2020-01-01"), 10.0), (1L, d("2020-01-03"), 30.0),
      (2L, d("2020-02-05"), 5.0)
    ).toDF("user_id", "day", "v")
    val got = RelationalOps.gapFillLocf(daily, Seq("user_id"), "day", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2)))
      .toSet
    assert(got == Set(
      (1L, "2020-01-01", 10.0),
      (1L, "2020-01-02", 10.0), // gap filled with the last observation
      (1L, "2020-01-03", 30.0),
      (2L, "2020-02-05", 5.0))) // other keys' spans don't leak in
  }

  test("robustOutliers flags by k x MAD per group; MAD=0 degenerates to " +
      "any-deviation") {
    val df = Seq(
      // group a: [1,1,1,100] -> med 1, MAD 0 -> only the 100 deviates
      ("a", 1L, 1.0), ("a", 2L, 1.0), ("a", 3L, 1.0), ("a", 4L, 100.0),
      // group b: [10,20,30,40,1000] -> med 30, MAD 10, fence 30
      ("b", 5L, 10.0), ("b", 6L, 20.0), ("b", 7L, 30.0),
      ("b", 8L, 40.0), ("b", 9L, 1000.0)
    ).toDF("g", "id", "x")
    val got = RelationalOps.robustOutliers(df, Seq("g"), "x", k = 3.0)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_outlier"))
      .toMap
    assert(got == Map(1L -> false, 2L -> false, 3L -> false, 4L -> true,
      5L -> false, 6L -> false, 7L -> false, 8L -> false, 9L -> true))
  }

  test("scd2Merge: null payload vs null payload is a no-op (null-safe compare)") {
    val base = Seq((1L, Option.empty[String], ts("2020-01-01 00:00:00"),
      Option.empty[java.sql.Timestamp])).toDF("k", "v", "valid_from", "valid_to")
    val delta = Seq((1L, Option.empty[String], ts("2021-01-01 00:00:00")))
      .toDF("k", "v", "eff")
    val got = RelationalOps.scd2Merge(base, delta, Seq("k"), "eff").collect()
    assert(got.length == 1 && got.head.getAs[java.sql.Timestamp]("valid_to") == null,
      "identical null payload must not open a new version")
  }

  test("funnel: strictly-after semantics, stalls, ties, and depth") {
    // user 1: B@5 (before any A — ignored), A@10, B@10 (tie, NOT
    //   strictly after — ignored), B@20, C@15 (before t2 — ignored),
    //   C@25 -> t=(10,20,25) depth 3
    // user 2: A@10, C@20 (no B yet — ignored) -> (10,null,null) depth 1
    // user 3: only C events -> depth 0 (all null)
    // user 4: A@10, B@11, B@9?, no C -> depth 2, t2 = 11
    val ev = Seq(
      (1L, 1L, 5L, "B"), (2L, 1L, 10L, "A"), (3L, 1L, 10L, "B"),
      (4L, 1L, 20L, "B"), (5L, 1L, 15L, "C"), (6L, 1L, 25L, "C"),
      (7L, 2L, 10L, "A"), (8L, 2L, 20L, "C"),
      (9L, 3L, 10L, "C"), (10L, 3L, 20L, "C"),
      (11L, 4L, 10L, "A"), (12L, 4L, 9L, "B"), (13L, 4L, 11L, "B")
    ).toDF("event_id", "user_id", "sec", "etype")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val got = RelationalOps.funnel(ev, Seq("user_id"), "ts", Seq("event_id"),
        Seq(col("etype") === "A", col("etype") === "B", col("etype") === "C"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((Option(r.getAs[java.sql.Timestamp]("t1")).map(_.getTime / 1000),
          Option(r.getAs[java.sql.Timestamp]("t2")).map(_.getTime / 1000),
          Option(r.getAs[java.sql.Timestamp]("t3")).map(_.getTime / 1000),
          r.getAs[Int]("depth")))).toMap
    assert(got == Map(
      1L -> ((Some(10L), Some(20L), Some(25L), 3)),
      2L -> ((Some(10L), None, None, 1)),
      3L -> ((None, None, None, 0)),
      4L -> ((Some(10L), Some(11L), None, 2))))
  }

  test("funnel matches a sequential per-user reference on random data") {
    val rnd = new scala.util.Random(17)
    val types = Array("A", "B", "C", "Z")
    val rows = (1 to 600).map(i => (i.toLong, (rnd.nextInt(8) + 1).toLong,
      rnd.nextInt(1000).toLong, types(rnd.nextInt(4))))
    val ev = rows.toDF("event_id", "user_id", "sec", "etype")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val expected = rows.groupBy(_._2).map { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._1))
      def first(t: String, after: Option[Long]): Option[Long] =
        after.flatMap(a => sorted.find(e => e._4 == t && e._3 > a).map(_._3))
      val t1 = sorted.find(_._4 == "A").map(_._3)
      val t2 = first("B", t1)
      val t3 = first("C", t2)
      u -> ((t1, t2, t3, Seq(t1, t2, t3).count(_.isDefined)))
    }
    val got = RelationalOps.funnel(ev, Seq("user_id"), "ts", Seq("event_id"),
        Seq(col("etype") === "A", col("etype") === "B", col("etype") === "C"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((Option(r.getAs[java.sql.Timestamp]("t1")).map(_.getTime / 1000),
          Option(r.getAs[java.sql.Timestamp]("t2")).map(_.getTime / 1000),
          Option(r.getAs[java.sql.Timestamp]("t3")).map(_.getTime / 1000),
          r.getAs[Int]("depth")))).toMap
    assert(got == expected)
  }

  test("retentionMatrix: alignment-free week offsets, per-cohort sizes, " +
      "exact millionth shares") {
    // users 1-3 start Mon 2024-01-01 (cohort week 2024-01-01):
    //   1 returns day 8 (wk1) and day 15 (wk2); 2 never returns;
    //   3 returns day 7 (wk1)
    // user 4 starts WED 2024-01-10 (cohort week 2024-01-08) and returns
    //   day +6 (Tue of the NEXT calendar week — still week_k 0, the
    //   alignment-free property) and day +7 (week_k 1)
    def ev(id: Long, u: Long, day: String) = (id, u, s"$day 12:00:00")
    val events = Seq(
      ev(1, 1, "2024-01-01"), ev(2, 1, "2024-01-09"), ev(3, 1, "2024-01-16"),
      ev(4, 2, "2024-01-01"),
      ev(5, 3, "2024-01-01"), ev(6, 3, "2024-01-08"),
      ev(7, 4, "2024-01-10"), ev(8, 4, "2024-01-16"), ev(9, 4, "2024-01-17")
    ).toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val got = RelationalOps.retentionMatrix(events, Seq("user_id"), "ts")
      .collect().map(r => (r.getAs[java.sql.Date]("cohort_week").toString,
        r.getAs[Int]("week_k")) ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Long]("ret_ppm")))).toMap
    assert(got == Map(
      ("2024-01-01", 0) -> ((3L, 3L, 1000000L)),
      ("2024-01-01", 1) -> ((2L, 3L, 666666L)),
      ("2024-01-01", 2) -> ((1L, 3L, 333333L)),
      ("2024-01-08", 0) -> ((1L, 1L, 1000000L)),
      ("2024-01-08", 1) -> ((1L, 1L, 1000000L))))
  }

  test("retentionMatrix counts a user once per week no matter how often " +
      "it fires") {
    val events = Seq(
      (1L, 1L, "2024-01-01 08:00:00"), (2L, 1L, "2024-01-01 09:00:00"),
      (3L, 1L, "2024-01-02 10:00:00"), (4L, 1L, "2024-01-03 11:00:00"))
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val got = RelationalOps.retentionMatrix(events, Seq("user_id"), "ts")
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_active") == 1L,
      "four events in one week are one active user")
  }

  test("transitionMatrix: adjacent pairs per key in (ts, tiebreak) order, " +
      "row-normalized millionths") {
    // user 1: A→B→A→C (ties at t=20 broken by event_id: B(id2) then A(id3))
    // user 2: B→B
    val events = Seq(
      (1L, 1L, 10L, "A"), (2L, 1L, 20L, "B"), (3L, 1L, 20L, "A"),
      (4L, 1L, 30L, "C"),
      (5L, 2L, 10L, "B"), (6L, 2L, 20L, "B"))
      .toDF("event_id", "user_id", "sec", "etype")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val got = RelationalOps.transitionMatrix(events, Seq("user_id"), "ts",
        Seq("event_id"), "etype")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("from_total"),
          r.getAs[Long]("p_ppm")))).toMap
    assert(got == Map(
      ("A", "B") -> ((1L, 2L, 500000L)),
      ("A", "C") -> ((1L, 2L, 500000L)),
      ("B", "A") -> ((1L, 2L, 500000L)),
      ("B", "B") -> ((1L, 2L, 500000L))))
  }

  test("sessionPaths: gap-split journeys, deterministic tie order, " +
      "frequency-then-path ranking") {
    // user 1: A@0 B@10 | gap | C@5000        -> paths "A>B", "C"
    // user 2: A@0 B@5                        -> path  "A>B"
    // user 3: ties at t=7 broken by event_id -> path  "A>X>Y"
    val ev = Seq(
      (1L, 1L, 0L, "A"), (2L, 1L, 10L, "B"), (3L, 1L, 5000L, "C"),
      (4L, 2L, 0L, "A"), (5L, 2L, 5L, "B"),
      (6L, 3L, 0L, "A"), (7L, 3L, 7L, "X"), (8L, 3L, 7L, "Y"))
      .toDF("event_id", "user_id", "sec", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val got = RelationalOps.sessionPaths(ev, Seq("user_id"), "ts", 1800L,
        Seq("ts", "event_id"), "event_type", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("A>B", 2L), ("A>X>Y", 1L), ("C", 1L)),
      s"ranked (n desc, path asc): $got")
  }

  test("streaks: maximal same-state runs per key, minLen filter, " +
      "deterministic run numbering") {
    // user 1: E E E V E E  -> runs E(3) V(1) E(2); only E(3) survives minLen=3
    // user 2: V V V V      -> V(4) survives
    val ev = Seq(
      (1L, 1L, "E"), (2L, 1L, "E"), (3L, 1L, "E"), (4L, 1L, "V"),
      (5L, 1L, "E"), (6L, 1L, "E"),
      (7L, 2L, "V"), (8L, 2L, "V"), (9L, 2L, "V"), (10L, 2L, "V"))
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("event_id")))
    val got = RelationalOps.streaks(ev, Seq("user_id"), "ts",
        Seq("event_id"), "event_type", minLen = 3L)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("streak_seq"),
        r.getAs[Long]("streak_len"))).toSet
    assert(got == Set((1L, "E", 1L, 3L), (2L, "V", 1L, 4L)))
  }

  test("streaks match a sequential runs reference on random data " +
      "(minLen = 1 emits every maximal run)") {
    val rnd = new scala.util.Random(41)
    val types = Array("A", "B")
    val rows = (1 to 400).map(i => (i.toLong, (rnd.nextInt(6) + 1).toLong,
      rnd.nextInt(200).toLong, types(rnd.nextInt(2))))
    val ev = rows.toDF("event_id", "user_id", "sec", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (u, es) =>
      val s = es.sortBy(e => (e._3, e._1)).map(_._4)
      val runs = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      for (t <- s)
        if (runs.nonEmpty && runs.last._1 == t)
          runs(runs.length - 1) = (t, runs.last._2 + 1)
        else runs += ((t, 1L))
      runs.zipWithIndex.map { case ((t, len), i) =>
        (u, t, (i + 1).toLong, len) }
    }.toSet
    val got = RelationalOps.streaks(ev, Seq("user_id"), "ts",
        Seq("event_id"), "event_type", minLen = 1L)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("streak_seq"),
        r.getAs[Long]("streak_len"))).toSet
    assert(got == expected)
  }

  test("ewmaState: seed-first fold semantics, null values dropped, " +
      "singleton keys keep their value") {
    // user 1: 100, 50, 30 -> s = 100, (100+50)/2=75, (75+30)/2=52
    // user 2: only 40     -> 40 (the seed IS the state)
    // user 3: null then 60 -> null dropped, state 60, n_events 1
    val ev = Seq(
      (1L, 1L, 10L, Some(100L)), (2L, 1L, 20L, Some(50L)), (3L, 1L, 30L, Some(30L)),
      (4L, 2L, 10L, Some(40L)),
      (5L, 3L, 10L, None), (6L, 3L, 20L, Some(60L)))
      .toDF("event_id", "user_id", "sec", "units")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val got = RelationalOps.ewmaState(ev, Seq("user_id"), "ts",
        Seq("event_id"), col("units"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("ewma_units")))).toMap
    assert(got == Map(1L -> ((3L, 52L)), 2L -> ((1L, 40L)), 3L -> ((1L, 60L))))
  }

  test("ewmaState matches a sequential fold on random data regardless of " +
      "input row order") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 500).map(i => (i.toLong, (rnd.nextInt(9) + 1).toLong,
      rnd.nextInt(400).toLong, rnd.nextInt(10000).toLong))
    val expected = rows.groupBy(_._2).map { case (u, es) =>
      val vs = es.sortBy(e => (e._3, e._1)).map(_._4)
      u -> ((vs.size.toLong, vs.tail.foldLeft(vs.head)((a, v) => (a + v) / 2)))
    }
    // shuffle input rows: the struct-sorted fold must not care
    val ev = rnd.shuffle(rows).toDF("event_id", "user_id", "sec", "units")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .repartition(7)
    val got = RelationalOps.ewmaState(ev, Seq("user_id"), "ts",
        Seq("event_id"), col("units"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("ewma_units")))).toMap
    assert(got == expected)
  }

  test("transitionMatrix never pairs across keys and matches a sequential " +
      "reference on random data") {
    val rnd = new scala.util.Random(23)
    val types = Array("A", "B", "C", "D")
    val rows = (1 to 500).map(i => (i.toLong, (rnd.nextInt(7) + 1).toLong,
      rnd.nextInt(300).toLong, types(rnd.nextInt(4))))
    val ev = rows.toDF("event_id", "user_id", "sec", "etype")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val pairs = rows.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      val s = es.sortBy(e => (e._3, e._1)).map(_._4)
      s.zip(s.drop(1))
    }
    val counts = pairs.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val totals = counts.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val expected = counts.map { case ((f, t), n) =>
      (f, t) -> ((n, totals(f), n * 1000000L / totals(f))) }
    val got = RelationalOps.transitionMatrix(ev, Seq("user_id"), "ts",
        Seq("event_id"), "etype")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("from_total"),
          r.getAs[Long]("p_ppm")))).toMap
    assert(got == expected)
  }

  test("interpolateGaps: gap days get the integer-floor linear blend, " +
      "observed days keep their exact value, singletons span one day") {
    // user 1 observes day 1 -> 30 and day 4 -> 60:
    //   day 2 = (30*2 + 60*1) div 3 = 40, day 3 = (30*1 + 60*2) div 3 = 50
    // user 2 observes only day 7 -> one-day spine, no gaps
    val daily = Seq((1L, 1, 30L), (1L, 4, 60L), (2L, 7, 5L))
      .toDF("user_id", "d", "units")
      .withColumn("day", date_add(lit("2024-01-01").cast("date"), col("d")))
      .drop("d")
    val got = RelationalOps.interpolateGaps(daily, Seq("user_id"), "day", "units")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("day").toString,
        Option(r.getAs[Any]("units")), r.getAs[Long]("units_interp"))).toSet
    assert(got == Set(
      (1L, "2024-01-02", Some(30L), 30L),
      (1L, "2024-01-03", None, 40L),
      (1L, "2024-01-04", None, 50L),
      (1L, "2024-01-05", Some(60L), 60L),
      (2L, "2024-01-08", Some(5L), 5L)))
  }

  test("interpolateGaps matches a sequential reference on random sparse data") {
    val rnd = new scala.util.Random(47)
    // unique (user, dayNum) observations, ~40% density over a 30-day span
    val rows = (for (u <- 1L to 8L; d <- 0 to 29 if rnd.nextInt(10) < 4)
      yield (u, d, rnd.nextInt(100000).toLong)).toSeq
    val daily = rnd.shuffle(rows).toDF("user_id", "d", "units")
      .withColumn("day", date_add(lit("2024-03-01").cast("date"), col("d")))
      .drop("d").repartition(5)
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (u, os) =>
      val obs = os.map(o => o._2 -> o._3).toMap
      val days = os.map(_._2)
      (days.min to days.max).map { d =>
        val v = obs.get(d) match {
          case Some(x) => x
          case None =>
            val p = obs.keys.filter(_ < d).max; val n = obs.keys.filter(_ > d).min
            Math.floorDiv(obs(p) * (n - d) + obs(n) * (d - p), (n - p).toLong)
        }
        (u, d, v)
      }
    }.toSet
    val base = java.time.LocalDate.parse("2024-03-01")
    val got = RelationalOps.interpolateGaps(daily, Seq("user_id"), "day", "units")
      .collect().map { r =>
        val d = java.time.temporal.ChronoUnit.DAYS.between(
          base, r.getAs[java.sql.Date]("day").toLocalDate).toInt
        (r.getAs[Long]("user_id"), d, r.getAs[Long]("units_interp"))
      }.toSet
    assert(got == expected)
  }

  test("coOccurrenceTopK: symmetric pairs, duplicate basket rows ignored, " +
      "row_number tiebreak by (count desc, neighbor asc)") {
    // baskets: {a,b,c}, {a,b}, {a,c} (with a duplicate 'a' row), {b,d}
    val facts = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "a"), (3L, "c"),
      (4L, "b"), (4L, "d")).toDF("basket", "item")
    val got = RelationalOps.coOccurrenceTopK(facts, "basket", "item", k = 1)
      .collect().map(r => (r.getAs[String]("item"), r.getAs[String]("other"),
        r.getAs[Long]("n_co"), r.getAs[Int]("rnk"))).toSet
    // a: ab=2 ac=2 -> top1 is b (tie, asc); b: ab=2; c: ac=2; d: bd=1
    assert(got == Set(("a", "b", 2L, 1), ("b", "a", 2L, 1),
      ("c", "a", 2L, 1), ("d", "b", 1L, 1)))
  }

  test("coOccurrenceTopK matches a sequential reference on random baskets") {
    val rnd = new scala.util.Random(31)
    val items = ('a' to 'j').map(_.toString)
    val rows = (1L to 60L).flatMap { g =>
      rnd.shuffle(items).take(rnd.nextInt(5) + 2).map(g -> _) }
    val k = 3
    val counts = rows.distinct.groupBy(_._1).toSeq.flatMap { case (_, is) =>
      val s = is.map(_._2).sorted
      for (i <- s.indices; j <- i + 1 until s.size) yield (s(i), s(j))
    }.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val sym = counts.toSeq.flatMap { case ((x, y), n) =>
      Seq((x, y, n), (y, x, n)) }
    val expected = sym.groupBy(_._1).flatMap { case (item, ns) =>
      ns.sortBy(t => (-t._3, t._2)).take(k).zipWithIndex
        .map { case ((_, o, n), i) => (item, o, n, i + 1) }
    }.toSet
    val got = RelationalOps.coOccurrenceTopK(
        rnd.shuffle(rows).toDF("basket", "item").repartition(7),
        "basket", "item", k)
      .collect().map(r => (r.getAs[String]("item"), r.getAs[String]("other"),
        r.getAs[Long]("n_co"), r.getAs[Int]("rnk"))).toSet
    assert(got == expected)
  }

  test("timeWeightedAvg: holds each reading until the next, " +
      "singleton and zero-span keys fall back to the first reading") {
    // user 1: t=0 v=100 (10s), t=10 v=200 (20s), t=30 v=50 (no duration)
    //   twap = (100*10 + 200*20) div 30 = 166
    // user 2: one reading -> its own value
    // user 3: two readings in the same second -> zero span -> first by id
    val ev = Seq(
      (1L, 1L, 0L, 100L), (2L, 1L, 10L, 200L), (3L, 1L, 30L, 50L),
      (4L, 2L, 5L, 77L),
      (5L, 3L, 9L, 40L), (6L, 3L, 9L, 90L))
      .toDF("event_id", "user_id", "sec", "units")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val got = RelationalOps.timeWeightedAvg(ev, Seq("user_id"), "ts",
        Seq("event_id"), col("units"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_readings"), r.getAs[Long]("twap_units")))).toMap
    assert(got == Map(1L -> ((3L, 166L)), 2L -> ((1L, 77L)), 3L -> ((2L, 40L))))
  }

  test("timeWeightedAvg matches a sequential reference on random data") {
    val rnd = new scala.util.Random(53)
    val rows = (1 to 400).map(i => (i.toLong, (rnd.nextInt(8) + 1).toLong,
      rnd.nextInt(500).toLong, rnd.nextInt(10000).toLong))
    val expected = rows.groupBy(_._2).map { case (u, es) =>
      val s = es.sortBy(e => (e._3, e._1))
      val dts = s.zip(s.drop(1)).map { case (a, b) => (a._4, b._3 - a._3) }
      val den = dts.map(_._2).sum
      val tw = if (den > 0) dts.map(t => t._1 * t._2).sum / den else s.head._4
      u -> ((s.size.toLong, tw))
    }
    val ev = rnd.shuffle(rows).toDF("event_id", "user_id", "sec", "units")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .repartition(6)
    val got = RelationalOps.timeWeightedAvg(ev, Seq("user_id"), "ts",
        Seq("event_id"), col("units"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_readings"), r.getAs[Long]("twap_units")))).toMap
    assert(got == expected)
  }

  test("peakConcurrency: exclusive ends do not overlap a same-instant " +
      "start; earliest peak instant reported; empty intervals dropped") {
    // key 1: [0,10) [5,15) [10,20) -> peak 2, first reached at t=5
    //   (at t=10 the first interval's -1 sorts before the third's +1)
    // key 2: [3,3) is empty -> dropped; [1,4) alone -> peak 1 at t=1
    val iv = Seq(
      (1L, 0L, 10L, 101L), (1L, 5L, 15L, 102L), (1L, 10L, 20L, 103L),
      (2L, 3L, 3L, 201L), (2L, 1L, 4L, 202L))
      .toDF("k", "s", "e", "iid")
    val got = RelationalOps.peakConcurrency(iv, Seq("k"), "s", "e", "iid")
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("peak"), r.getAs[Long]("peak_at")))).toMap
    assert(got == Map(1L -> ((2L, 5L)), 2L -> ((1L, 1L))))
  }

  test("peakConcurrency matches a brute-force sweep on random intervals") {
    val rnd = new scala.util.Random(61)
    val rows = (1 to 300).map { i =>
      val s = rnd.nextInt(100).toLong
      ((rnd.nextInt(5) + 1).toLong, s, s + rnd.nextInt(20) + 1, i.toLong)
    }
    // conc(t) = #intervals with s <= t < e; peaks occur at start instants
    val expected = rows.groupBy(_._1).map { case (k, is) =>
      val conc = is.map(_._2).distinct.map(t =>
        t -> is.count(iv => iv._2 <= t && t < iv._3).toLong)
      val peak = conc.map(_._2).max
      k -> ((peak, conc.filter(_._2 == peak).map(_._1).min))
    }
    val got = RelationalOps.peakConcurrency(
        rnd.shuffle(rows).toDF("k", "s", "e", "iid").repartition(8),
        Seq("k"), "s", "e", "iid")
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("peak"), r.getAs[Long]("peak_at")))).toMap
    assert(got == expected)
  }

  test("cdcApply keeps the highest-seq upsert, drops deleted keys, " +
      "breaks seq ties by the order column") {
    val log = Seq(
      (1L, "a1", 1L, "U", 101L), (1L, "a2", 2L, "U", 102L), // latest wins
      (2L, "b1", 1L, "U", 201L), (2L, "b2", 2L, "D", 202L), // deleted
      (3L, "c1", 2L, "U", 301L), (3L, "c2", 2L, "U", 302L), // tie: 302 wins
      (4L, "d1", 3L, "D", 401L), (4L, "d2", 4L, "U", 402L), // re-inserted
      (5L, "e1", 1L, "U", 501L)
    ).toDF("k", "payload", "seq", "op", "change_id")
    val got = RelationalOps.cdcApply(log, Seq("k"), "seq", "op",
        Seq("change_id"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("payload"))
      .toMap
    assert(got == Map(1L -> "a2", 3L -> "c2", 4L -> "d2", 5L -> "e1"))
  }

  test("cdcApply drops bookkeeping columns but keeps order columns") {
    val log = Seq((1L, "a", 1L, "U", 11L)).toDF("k", "v", "seq", "op", "cid")
    val out = RelationalOps.cdcApply(log, Seq("k"), "seq", "op", Seq("cid"))
    assert(out.columns.toSeq == Seq("k", "v", "cid"))
    intercept[IllegalArgumentException] {
      RelationalOps.cdcApply(log, Seq("k"), "seq", "op", Seq.empty)
    }
  }

  test("intervalUnion merges overlapping and touching spans, drops " +
      "degenerate ones, and matches a brute-force coverage count") {
    // key 1: [0,5) + [3,8) overlap -> [0,8); [8,10) touches -> chains to
    // [0,10); [12,13) disjoint. key 2: inverted [5,2) dropped, [1,1)
    // empty dropped, [0,4) survives alone.
    val iv = Seq(
      (1L, 0L, 5L, 1L), (1L, 3L, 8L, 2L), (1L, 8L, 10L, 3L),
      (1L, 12L, 13L, 4L),
      (2L, 5L, 2L, 5L), (2L, 1L, 1L, 6L), (2L, 0L, 4L, 7L)
    ).toDF("k", "s", "e", "iid")
    val got = RelationalOps.intervalUnion(iv, Seq("k"), "s", "e", "iid",
        (lo, hi) => hi - lo)
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("covered"),
          r.getAs[Long]("hull_start"), r.getAs[Long]("hull_end")))).toMap
    assert(got == Map(1L -> ((2L, 11L, 0L, 13L)), 2L -> ((1L, 4L, 0L, 4L))))
  }

  test("intervalUnion coverage equals brute-force point counting on " +
      "random intervals") {
    val rnd = new scala.util.Random(73)
    val rows = (1 to 400).map { i =>
      val s = rnd.nextInt(100).toLong
      ((rnd.nextInt(6) + 1).toLong, s, s + rnd.nextInt(15) + 1, i.toLong)
    }
    val expected = rows.groupBy(_._1).map { case (k, is) =>
      val pts = (0L until 120L).count(t => is.exists(iv => iv._2 <= t && t < iv._3))
      k -> pts.toLong
    }
    val got = RelationalOps.intervalUnion(
        rnd.shuffle(rows).toDF("k", "s", "e", "iid").repartition(8),
        Seq("k"), "s", "e", "iid", (lo, hi) => hi - lo)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("covered"))
      .toMap
    assert(got == expected)
  }

  test("tableDiff: added/removed/changed legs, null-safe compare, " +
      "unchanged rows absent, changed_cols sorted") {
    val old = Seq(
      (1L, Some("a"), 1.0), (2L, Some("b"), 2.0), (3L, None: Option[String], 3.0),
      (4L, Some("d"), 4.0)).toDF("k", "s", "v")
    val nw = Seq(
      (1L, Some("a"), 1.0),                       // unchanged -> absent
      (2L, Some("B"), 20.0),                      // both columns changed
      (3L, None: Option[String], 3.0),            // null==null -> unchanged
      (5L, Some("e"), 5.0)).toDF("k", "s", "v")   // added; 4 removed
    val got = RelationalOps.tableDiff(old, nw, Seq("k"))
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[String]("status"), r.getAs[String]("changed_cols")))).toMap
    assert(got == Map(2L -> (("changed", "s,v")), 4L -> (("removed", "")),
      5L -> (("added", ""))))
    intercept[IllegalArgumentException] {
      RelationalOps.tableDiff(old, nw.drop("v"), Seq("k"))
    }
  }

  test("mergeAggStates equals the full recompute on every split point " +
      "(counts/sums add, min/max take extrema, absent keys pass through)") {
    val rnd = new scala.util.Random(37)
    val rows = (1 to 300).map(i =>
      ("g" + rnd.nextInt(6), BigDecimal(rnd.nextInt(10000)).setScale(2) / 100))
    val df = rows.toDF("g", "v")
    def state(d: org.apache.spark.sql.DataFrame) = d.groupBy("g").agg(
      count(lit(1)).as("n"), sum(col("v")).as("s"),
      min(col("v")).as("mn"), max(col("v")).as("mx"))
    val full = state(df).collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDecimal(2), r.getDecimal(3), r.getDecimal(4)))).toMap
    for (cutMod <- Seq(2, 7)) {
      // split so some keys live entirely on one side (absent-key leg)
      val left = df.where(abs(hash(col("g"), col("v"))) % cutMod === 0)
      val right = df.where(abs(hash(col("g"), col("v"))) % cutMod =!= 0)
      val merged = RelationalOps.mergeAggStates(state(left), state(right),
          Seq("g"), Seq("n"), Seq("s"), Seq("mn"), Seq("mx"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDecimal(2), r.getDecimal(3), r.getDecimal(4))))
        .toMap
      assert(merged == full, s"cutMod $cutMod: merged state != recompute")
    }
  }

  test("lastTouchAttribution: strictly-before carry, TTL expiry, organic " +
      "bucket, same-instant tiebreak") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val events = Seq(
      // user 1: touch at 100, purchase at 200 -> attributed
      (1L, ts(100), 1L, "view", ""),
      (1L, ts(200), 2L, "purchase", ""),
      // user 1: second purchase at 150 credits the SAME 100 touch
      // (one touch can attribute many conversions inside the TTL)
      (1L, ts(150), 3L, "purchase", ""),
      // user 2: touch EXPIRED (ttl 100s), purchase organic
      (2L, ts(0), 4L, "click", ""),
      (2L, ts(500), 5L, "purchase", ""),
      // user 3: purchase with no touch at all -> organic
      (3L, ts(50), 6L, "purchase", ""),
      // user 4: touch and purchase at the SAME instant — touch has the
      // smaller event_id, so it sorts first and attributes
      (4L, ts(10), 7L, "view", ""),
      (4L, ts(10), 8L, "purchase", ""),
      // user 5: purchase BEFORE its touch by the tiebreak -> organic
      (5L, ts(10), 9L, "purchase", ""),
      (5L, ts(10), 10L, "click", "")
    ).toDF("user_id", "ts", "event_id", "event_type", "props")
    val got = RelationalOps.lastTouchAttribution(
        events, Seq("user_id"), "ts", Seq("event_id"),
        isTouch = col("event_type").isin("view", "click"),
        isConversion = col("event_type") === "purchase",
        channelCol = col("event_type"), ttlSeconds = 100L)
      .collect()
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("channel")))
      .toMap
    assert(got == Map(2L -> Some("view"), 3L -> Some("view"),
      5L -> None, 6L -> None, 8L -> Some("view"), 9L -> None))
  }

  test("equiDepthBins: near-equal populations, contiguous boundaries, " +
      "every row binned exactly once") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 1000).map(i => ("g" + i % 2, rnd.nextInt(500).toDouble, i.toLong))
    val got = RelationalOps.equiDepthBins(
        rows.toDF("g", "v", "id"), Seq("g"), "v", Seq("id"), nBins = 10)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Int]("bin"),
        r.getAs[Long]("n"), r.getAs[Double]("lo"), r.getAs[Double]("hi")))
    assert(got.length == 20)
    for (g <- Seq("g0", "g1")) {
      val bins = got.filter(_._1 == g).sortBy(_._2)
      assert(bins.map(_._2).toSeq == (1 to 10), s"$g bins not 1..10")
      assert(bins.map(_._3).sum == 500, s"$g rows lost or duplicated")
      assert(bins.map(_._3).max - bins.map(_._3).min <= 1,
        s"$g ntile populations must differ by at most 1")
      // value boundaries are monotone across bins (duplicates may
      // straddle, so lo(next) >= hi(prev) is the ntile guarantee only
      // up to equal values)
      bins.sliding(2).foreach { case Array(a, b) =>
        assert(b._4 >= a._5 - 1e-9 || b._4 >= a._4,
          s"$g bin boundaries out of order: $a then $b")
      }
    }
    intercept[IllegalArgumentException] {
      RelationalOps.equiDepthBins(rows.toDF("g", "v", "id"), Seq("g"), "v",
        Seq("id"), nBins = 1)
    }
  }

  test("equiDepthBinsApprox: all rows binned once into 1..nBins, " +
      "populations near the exact split within the sketch error") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 4000).map(i => ("g" + i % 2, rnd.nextDouble() * 1000))
    val got = RelationalOps.equiDepthBinsApprox(
        rows.toDF("g", "v"), Seq("g"), "v", nBins = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    for (g <- Seq("g0", "g1")) {
      val bins = got.filter(_._1 == g)
      assert(bins.map(_._2).forall(b => b >= 1 && b <= 10))
      assert(bins.map(_._3).sum == 2000, s"$g rows lost or duplicated")
      // rank error at accuracy 10000 on 2000 rows is << one row, but
      // duplicate doubles are absent here so each bin ~200 ± slack
      assert(bins.map(_._3).forall(n => n > 120 && n < 280),
        s"$g populations far from equi-depth: ${bins.sortBy(_._2).toSeq}")
    }
  }
}

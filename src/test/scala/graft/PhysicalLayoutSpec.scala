package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout levers for the 100 TB design point: partition
  * pruning (a filtered scan must touch only matching directories) and
  * bucketed co-located joins (pre-shuffled layout ⇒ no Exchange at
  * join time). These are plan-shape assertions — the behaviors that
  * make or break a 1000-executor deployment but are invisible to
  * row-level correctness checks.
  */
class PhysicalLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hive-style partitioned write + filter → partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "part_prune").toString
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    events.write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val one = spark.read.parquet(dir)
      .filter(col("event_type") === "purchase")
    val scan = one.queryExecution.executedPlan.collectLeaves().head
    val scanStr = scan.toString
    assert(scanStr.contains("PartitionFilters") &&
      scanStr.contains("event_type"),
      s"expected partition filter on event_type in:\n$scanStr")
    // pruned scan reads exactly the one directory's rows
    val want = events.filter(col("event_type") === "purchase").count()
    assert(one.count() === want)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse directories persist → LOCATION_ALREADY_EXISTS
    for (t <- Seq("b_orders", "b_customer")) {
      val p = java.nio.file.Paths.get(s"/root/repo/target/warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val customer = Tables.load(spark, "/root/testdata/sf0.001", "customer")
    orders.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    customer.write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    // disable broadcast so the join would otherwise need an exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).count()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not re-shuffle bucketed inputs: no
      // Exchange below the SortMergeJoin (the groupBy above it may)
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected SortMergeJoin in:\n$plan")
      assert(!plan.substring(joinIdx).contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      // and the result matches the unbucketed join
      val want = orders.join(customer,
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("z-order layout + pushed rectangle predicate skips row groups " +
       "a hash layout must read (the q133 file-skipping proof)") {
    import graft.ops.LayoutOps
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(pmod(col("user_id"), lit(65536L)).as("da"),
        pmod(col("event_id"), lit(65536L)).as("db"), col("value"))
    val zDir = "/root/repo/target/zorder_cache/spec_z"
    val hDir = "/root/repo/target/zorder_cache/spec_hash"
    // same rows, two layouts: along the z-curve vs hash-scattered
    LayoutOps.zOrderLayout(ev, col("da"), col("db"), 16)
      .write.mode("overwrite").parquet(zDir)
    ev.repartition(16).write.mode("overwrite").parquet(hDir)

    // records actually READ from parquet (post row-group pruning),
    // summed over the job's tasks via a listener; listener delivery is
    // async, so poll until the counter stabilizes
    def recordsRead(path: String): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            acc.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(l)
      try {
        spark.read.parquet(path)
          .filter(col("da") < 256 && col("db") < 256)
          .agg(count(lit(1))).collect()
        var prev = -1L
        var stable = 0
        while (stable < 3) {
          Thread.sleep(100)
          val cur = acc.get()
          if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        }
        acc.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }

    val zRead = recordsRead(zDir)
    val hRead = recordsRead(hDir)
    // hash layout: every file spans the full (da, db) domain → no
    // row group prunes, the scan reads ~all rows. z layout: the tight
    // corner rectangle intersects only the files whose z-range covers
    // it — the min/max stats skip the rest.
    assert(hRead > 0, "listener captured no input metrics")
    assert(zRead * 2 < hRead,
      s"z-order layout must let the pushed rectangle skip most row " +
        s"groups: z=$zRead vs hash=$hRead records read")
  }

  test("hilbert layout + pushed rectangle predicate skips row groups " +
       "a hash layout must read (the q364 file-skipping proof)") {
    import graft.ops.LayoutOps
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(pmod(col("user_id"), lit(65536L)).as("da"),
        pmod(col("event_id"), lit(65536L)).as("db"), col("value"))
    val hDir = "/root/repo/target/zorder_cache/spec_hilbert"
    val rDir = "/root/repo/target/zorder_cache/spec_hash2"
    LayoutOps.hilbertLayout(ev, col("da"), col("db"), 16, 16)
      .write.mode("overwrite").parquet(hDir)
    ev.repartition(16).write.mode("overwrite").parquet(rDir)
    def recordsRead(path: String): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            acc.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(l)
      try {
        spark.read.parquet(path)
          .filter(col("da") < 256 && col("db") < 256)
          .agg(count(lit(1))).collect()
        var prev = -1L
        var stable = 0
        while (stable < 3) {
          Thread.sleep(100)
          val cur = acc.get()
          if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        }
        acc.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val hRead = recordsRead(hDir)
    val rRead = recordsRead(rDir)
    assert(rRead > 0, "listener captured no input metrics")
    assert(hRead * 2 < rRead,
      s"hilbert layout must let the pushed rectangle skip most row " +
        s"groups: hilbert=$hRead vs hash=$rRead records read")
  }

  test("hilbertValue matches the scalar xy2d reference on the full " +
       "16x16 grid and visits every cell exactly once") {
    import graft.ops.LayoutOps
    // the classic iterative xy2d, straight from the published
    // formulation — an independent scalar spelling of the same walk
    def ref(bits: Int, x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val bits = 4
    val grid = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val got = grid.toDF("x", "y")
      .withColumn("h", LayoutOps.hilbertValue(col("x"), col("y"), bits))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) === ref(bits, x, y), s"xy=($x,$y)")
    }
    // bijection: 256 cells -> 256 distinct indexes in [0, 256)
    assert(got.values.toSet === (0L until 256L).toSet)
  }

  test("hilbert walk never jumps: consecutive indexes are always " +
       "grid-adjacent (the locality property z-order lacks)") {
    import graft.ops.LayoutOps
    val bits = 3
    val cells = (for (x <- 0 until 8; y <- 0 until 8)
      yield (x.toLong, y.toLong)).toDF("x", "y")
      .withColumn("h", LayoutOps.hilbertValue(col("x"), col("y"), bits))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).map(_._2)
    cells.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve jumped from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("hilbert buckets bound prune rectangles tighter than z-order " +
       "on unaligned index ranges (the q362-vs-q125 locality case)") {
    import graft.ops.LayoutOps
    // full 32x32 grid, consecutive-index buckets of 43 cells — NOT a
    // power of two, so buckets straddle quadrant boundaries: the z
    // curve's corner jumps inflate the bounding box (= the min/max
    // stats a file written per bucket would carry; bbox area ~ rows a
    // rectangle scan cannot prune), the Hilbert walk stays contiguous
    val bits = 5
    val grid = (for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toLong, y.toLong)).toDF("x", "y")
      .withColumn("h", LayoutOps.hilbertValue(col("x"), col("y"), bits))
      .withColumn("z", LayoutOps.zValue(col("x"), col("y")))
    def bboxArea(keyCol: String): Long = grid
      .groupBy((col(keyCol) / 43).cast("long").as("bucket"))
      .agg(((max("x") - min("x") + 1) *
            (max("y") - min("y") + 1)).as("area"))
      .agg(sum("area")).head().getLong(0)
    val hArea = bboxArea("h")
    val zArea = bboxArea("z")
    assert(hArea < zArea,
      s"hilbert bucket bboxes must be tighter: hilbert=$hArea z=$zArea")
  }

  test("range layout + pushed date predicate skips row groups a hash " +
       "layout must read (the q251 file-skipping proof)") {
    import graft.ops.LayoutOps
    // DATE, not timestamp: Spark writes timestamps as INT96 whose
    // parquet stats are ignored — a timestamp key would disable the
    // row-group pruning this test measures (q251 stores DATE too)
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_orderdate"),
        col("o_totalprice"))
    val rDir = "/root/repo/target/range_cache/spec_range"
    val hDir = "/root/repo/target/range_cache/spec_hash"
    LayoutOps.rangeLayout(o, col("o_orderdate"), 16, col("o_orderkey"))
      .write.mode("overwrite").parquet(rDir)
    o.repartition(16).write.mode("overwrite").parquet(hDir)

    def recordsRead(path: String): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            acc.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(l)
      try {
        spark.read.parquet(path)
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1996-04-01"))
          .agg(count(lit(1))).collect()
        var prev = -1L
        var stable = 0
        while (stable < 3) {
          Thread.sleep(100)
          val cur = acc.get()
          if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        }
        acc.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }

    val rRead = recordsRead(rDir)
    val hRead = recordsRead(hDir)
    // hash layout: every file spans the full date domain → min/max
    // stats prune nothing. range layout: only the files whose date
    // range intersects the one-quarter window are read.
    assert(hRead > 0, "listener captured no input metrics")
    assert(rRead * 2 < hRead,
      s"range layout must let the pushed date window skip most row " +
        s"groups: range=$rRead vs hash=$hRead records read")
  }
}

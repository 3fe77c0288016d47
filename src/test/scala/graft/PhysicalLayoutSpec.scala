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

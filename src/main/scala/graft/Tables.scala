package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader (TESTDATA.md): one parquet per table under a
  * scale-factor dir. Schemas are pinned by the driver's generator; we read
  * them as-is (columnar scan, vectorized reader, pushdown-friendly).
  *
  * The reference infers CSV schemas at read time
  * (`/root/reference/src/modelling.py:50`) — a full extra pass over the
  * data. Here storage is parquet so the schema travels with the footer;
  * at 100 TB, schema inference would be a catastrophic anti-pattern.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

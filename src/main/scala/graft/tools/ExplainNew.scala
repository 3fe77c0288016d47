// Plan audit for the round-9 queries: prints the formatted physical
// plan of each so shuffle counts / broadcast choices / codegen spans
// can be reviewed. Run: sbt "runMain graft.tools.ExplainNew"
package graft.tools

import org.apache.spark.sql.SparkSession

object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val qs = if (args.nonEmpty) args.toSeq
    else Seq("q189_semantic_dedup", "q191_semdedup_canonical",
      "q192_bpe_encode", "q193_hybrid_rrf")
    qs.foreach { q =>
      println(s"\n================ $q ================")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

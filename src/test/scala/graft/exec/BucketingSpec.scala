package graft.exec

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located join via bucketing — the pre-shuffle discipline for the
  * repeated big⋈big joins of a 100 TB pipeline: both sides bucketed by
  * the join key with the same bucket count join with NO Exchange in the
  * physical plan (each task reads matching buckets directly), turning an
  * every-query shuffle into a one-time write-side cost.
  */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed-by-join-key tables join with zero shuffle") {
    import java.nio.file.Files
    val wh = Files.createTempDirectory("graft_buckets").toString
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/b_customer").saveAsTable("b_customer")

    // Force the sort-merge path (broadcast would hide the bucket effect
    // at this SF; at scale both sides are too big to broadcast anyway).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)

      // and the result matches the plain (shuffled) join
      val expected = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("bucket pruning: an equality filter on the bucket key reads one bucket") {
    import java.nio.file.Files
    val wh = Files.createTempDirectory("graft_buckets_prune").toString
    spark.sql("DROP TABLE IF EXISTS bp_orders")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_custkey").option("path", s"$wh/bp_orders")
      .saveAsTable("bp_orders")
    // autoBucketedScan turns the bucketed layout off for scans with no
    // distribution requirement — disable it so the pruning path is taken.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = spark.table("bp_orders").filter(col("o_custkey") === 7)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan)
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS bp_orders")
    }
  }
}
